"""Broadcast (map-side) join: the scale answer for small-side lookups.

A hash ``ds.join`` shuffles BOTH sides; when one side fits in memory
(dimension tables, lookup maps), broadcast it once with ``ray.put`` and
enrich the big side inside ``map_batches`` — zero shuffle, the big side
streams through exactly once. This is the pattern the reference's
engine-free design never needed but a corpus pipeline uses constantly
(doc metadata lookups, cluster assignments, routing tables).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa


def _lookup_dict(table: pa.Table, key: str, value_cols: list[str]) -> dict:
    keys = table.column(key).to_pylist()
    cols = {c: table.column(c).to_pylist() for c in value_cols}
    return {
        k: tuple(cols[c][i] for c in value_cols) for i, k in enumerate(keys)
    }


def broadcast_join(ds, small, key: str, value_cols: list[str],
                   small_key: Optional[str] = None, concurrency=(1, 8)):
    """Enrich ``ds`` with ``value_cols`` from the small side.

    ``small``: pyarrow Table or Ray Dataset (materialized — it must be
    the SMALL side). ``key``: join column on ``ds``; ``small_key``: join
    column on the small side (defaults to ``key``). Unmatched rows get
    nulls (left join semantics).
    """
    import ray

    if hasattr(small, "to_arrow_refs"):  # Ray Dataset → driver table
        small = pa.Table.from_pylist(small.take_all())
    lookup_ref = ray.put(_lookup_dict(small, small_key or key, value_cols))

    class Enrich:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column(key).to_pylist()
            n_vals = len(value_cols)
            missing = (None,) * n_vals
            rows = [self.lookup.get(k, missing) for k in keys]
            for ci, c in enumerate(value_cols):
                batch = batch.append_column(
                    c, pa.array([r[ci] for r in rows], type=small.schema.field(c).type)
                )
            return batch

    return ds.map_batches(Enrich, batch_format="pyarrow", concurrency=concurrency)
