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
import pyarrow.compute as pc


def broadcast_join(ds, small, key: str, value_cols: list[str],
                   small_key: Optional[str] = None, concurrency=(1, 8)):
    """Enrich ``ds`` with ``value_cols`` from the small side.

    ``small``: pyarrow Table or Ray Dataset (materialized — it must be
    the SMALL side). ``key``: join column on ``ds``; ``small_key``: join
    column on the small side (defaults to ``key``). Unmatched rows get
    nulls (left join semantics). Duplicate small-side keys resolve to
    the first occurrence.

    The probe is Arrow-native: ``pc.index_in`` maps each batch key to
    its small-side row (hash lookup in C), then one ``take`` per value
    column — no per-row Python.
    """
    import ray

    if hasattr(small, "to_arrow_refs"):  # Ray Dataset → driver table
        small = pa.Table.from_pylist(small.take_all())
    sk = small_key or key
    small = small.combine_chunks()
    small_ref = ray.put(small.select([sk] + list(value_cols)))

    class Enrich:
        def __init__(self):
            t = ray.get(small_ref)
            self.small_keys = t.column(sk).combine_chunks()
            self.values = {c: t.column(c).combine_chunks() for c in value_cols}

        def __call__(self, batch: pa.Table) -> pa.Table:
            # null index for unmatched keys → take yields null (left join)
            idx = pc.index_in(batch.column(key), value_set=self.small_keys)
            for c in value_cols:
                batch = batch.append_column(c, pc.take(self.values[c], idx))
            return batch

    return ds.map_batches(Enrich, batch_format="pyarrow", concurrency=concurrency)
