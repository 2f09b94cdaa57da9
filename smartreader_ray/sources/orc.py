"""ORC source/sink over pyarrow.orc.

The reference reads single HTML documents (`SmartReader.cs:326`); the
corpus engine needs columnar interchange with warehouse stacks, where
ORC sits beside Parquet. Ray Data 2.49 ships no ORC connector, so this
one follows the repo's WARC pattern (`sources/warc.py`): file-level
parallelism via ``read_binary_files`` for the read leg, one ORC file
per block via ``map_batches`` for the write leg. ORC stripes are
internally columnar+compressed; a 100-TB corpus lands as many
worker-written files, never one giant file (resumable layout).
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa


def write_orc(ds, out_dir: str, compression: str = "zstd") -> str:
    """Distributed ORC sink: each block becomes one ``part-*.orc`` file
    written by the task that owns it (no driver funnel). Returns
    ``out_dir``. File names are unique per task+block, so concurrent
    writers never collide and a re-run into a fresh dir is clean."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(b: pa.Table) -> pa.Table:
        from pyarrow import orc

        # stateless task pool (no actor reservation to starve small
        # clusters); uuid per block keeps concurrent writers collision-
        # free without any coordination
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.orc")
        orc.write_table(b, path, compression=compression)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([b.num_rows],
                                          type=pa.int64())})

    # consume the manifest to force the write; it is file-count-sized
    ds.map_batches(_write, batch_format="pyarrow").materialize()
    return out_dir


def orc_tables_batch(batch: pa.Table, bytes_col: str = "bytes") -> pa.Table:
    """Decode a batch of whole ORC files into one Arrow table."""
    from pyarrow import orc

    parts = []
    for blob in batch.column(bytes_col).to_pylist():
        parts.append(orc.ORCFile(pa.BufferReader(blob)).read())
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts, promote_options="default")


def read_orc(paths):
    """ORC file(s)/dir → Dataset, one read task per file (stripes
    within a file decode together; at corpus scale files are the
    parallelism unit, matching how they were written)."""
    import ray.data

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(orc_tables_batch, batch_format="pyarrow")
