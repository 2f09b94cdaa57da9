"""Arrow IPC (Feather v2) source/sink.

Same file-level-parallel shape as the ORC connector (`sources/orc.py`)
— one IPC file per block on write, one read task per file. IPC is the
zero-serialization-cost interchange for Arrow-native neighbours
(DuckDB, Polars, Flight); at 100 TB the value is that a downstream
Arrow consumer maps the buffers without a decode pass.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa


def write_ipc(ds, out_dir: str, compression: str = "zstd") -> str:
    """Distributed Arrow-IPC sink: one ``part-*.arrow`` per block,
    written by the owning task. Returns ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(b: pa.Table) -> pa.Table:
        from pyarrow import feather

        # stateless task pool; see sources/orc.py for the rationale
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.arrow")
        feather.write_feather(b, path, compression=compression)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([b.num_rows],
                                          type=pa.int64())})

    ds.map_batches(_write, batch_format="pyarrow").materialize()
    return out_dir


def ipc_tables_batch(batch: pa.Table, bytes_col: str = "bytes") -> pa.Table:
    """Decode a batch of whole IPC files into one Arrow table."""
    from pyarrow import feather

    parts = []
    for blob in batch.column(bytes_col).to_pylist():
        parts.append(feather.read_table(pa.BufferReader(blob)))
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts, promote_options="default")


def read_ipc(paths):
    """Arrow-IPC file(s)/dir → Dataset, one read task per file."""
    import ray.data

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(ipc_tables_batch, batch_format="pyarrow")
