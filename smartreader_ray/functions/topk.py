"""Distributed top-k without a full sort.

``ds.sort(col).limit(k)`` is an all-to-all exchange of EVERY row; at
100 TB that is the single most expensive plan node. Top-k only needs the
k best per block + one tiny global reduce: each block is cut to its
local top-k with ``pyarrow.compute.select_k_unstable`` (a partial
selection, O(n) per block), so the final sort sees at most
``k × num_blocks`` rows instead of the corpus.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _local_top_k(value_col: str, k: int, order: str):
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows > k:
            indices = pc.select_k_unstable(
                batch, k=k, sort_keys=[(value_col, order)]
            )
            batch = batch.take(indices)
        return batch

    return fn


def top_k(ds, value_col: str, k: int = 10, descending: bool = True):
    """Top ``k`` rows of ``ds`` by ``value_col`` (lazy Dataset result).

    Per-block partial select-k → global sort over the ≤ k·blocks
    survivors → limit. Ties at the boundary resolve arbitrarily (same as
    SQL ``ORDER BY … LIMIT k`` with non-deterministic tie order).
    """
    order = "descending" if descending else "ascending"
    reduced = ds.map_batches(_local_top_k(value_col, k, order), batch_format="pyarrow")
    return reduced.sort(value_col, descending=descending).limit(k)
