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


def top_k_by(ds, key_col: str, value_col: str, k: int = 10,
             descending: bool = True, tie_col: str | None = None):
    """Per-key top ``k``: the k best rows by ``value_col`` within each
    ``key_col`` group, with deterministic ``tie_col`` tie-breaking
    (ascending) so results are engine-reproducible.

    Same two-level shape as ``top_k``: each block keeps its own k best
    per key (every global winner is among some block's local winners),
    so the keyed exchange carries ≤ k × blocks rows per key — never a
    hot key's full row set. Output adds a ``rank`` column (1-based).
    """
    v_order = "descending" if descending else "ascending"
    sort_keys = [(key_col, "ascending"), (value_col, v_order)]
    if tie_col is not None:
        sort_keys.append((tie_col, "ascending"))

    def partial(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=sort_keys)
        b = batch.take(order)
        keys = b.column(key_col).to_pylist()
        keep, run_key, run = [], object(), 0
        for i, kk in enumerate(keys):
            if kk != run_key:
                run_key, run = kk, 0
            if run < k:
                keep.append(i)
            run += 1
        return b.take(pa.array(keep, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=sort_keys)[:k]
        g = group.take(order)
        return g.append_column(
            "rank", pa.array(range(1, g.num_rows + 1), type=pa.int64())
        )

    cols = [key_col, value_col] + ([tie_col] if tie_col else [])
    return (
        ds.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(final, batch_format="pyarrow")
    )


def skyline(ds, x_col: str, y_col: str):
    """2-D Pareto front, maximizing BOTH columns: keep exactly the rows
    no other row strictly dominates (x' ≥ x AND y' ≥ y with at least
    one strict). The multi-objective companion to top-k — "best
    price-for-size" style frontier queries.

    Distributed shape (the classic two-phase skyline): a vectorized
    per-block skyline pass prunes everything locally dominated — the
    frontier of a block is tiny relative to the block — then the union
    of local survivors is collapsed to one block and the SAME kernel
    runs once more. Correct because local pruning is conservative
    (a point dominated within a block is dominated globally, and every
    global frontier point survives its own block). The merge block is
    frontier-sized; for adversarial inputs whose frontier exceeds one
    block, chain another local round (tree merge) — documented, not
    needed for real distributions.

    Per-block kernel: lexsort by (x desc, y desc); within each distinct
    x the max-y rows survive iff that max beats the running max-y of
    all strictly-greater-x groups. Equal (x, y) duplicates are all kept
    (they do not dominate each other), matching SQL NOT EXISTS.
    """
    import numpy as np

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        x = b.column(x_col).to_numpy(zero_copy_only=False)
        y = b.column(y_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((-y, -x))
        xs, ys = x[order], y[order]
        new_grp = np.r_[True, xs[1:] != xs[:-1]]
        gid = np.cumsum(new_grp) - 1
        gmax = ys[new_grp]  # y sorted desc within group → first is max
        prev = np.r_[-np.inf, np.maximum.accumulate(gmax)[:-1]]
        keep_grp = gmax > prev
        keep = keep_grp[gid] & (ys == gmax[gid])
        return b.take(pa.array(order[keep]))

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local, batch_format="pyarrow")
    )
