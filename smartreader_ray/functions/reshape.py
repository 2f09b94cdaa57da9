"""Reshape operators: long→wide pivots over a distributed Dataset.

The reference is strictly per-document and has no tabular reshaping;
this is engine surface for the corpus side (feature tables: one row
per entity with per-category counts/sums, the classic input layout for
training-data mixing decisions and quality dashboards).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pivot_counts(ds, key_col: str, col: str, values: list[str],
                 value_col: str | None = None, prefix: str = "n_"):
    """Long→wide pivot: one output row per ``key_col`` with a column
    ``{prefix}{v}`` per pivot value ``v`` counting rows where ``col ==
    v`` (or, with ``value_col``, summing that column instead —
    cent-rounded). Rows whose ``col`` is outside ``values`` are ignored
    — the pivot column set must be DECLARED, never inferred, so the
    output schema is fixed up front (schema inference over 100 TB would
    itself be a full scan).

    Ray shape: per-batch Arrow ``group_by(key, col)`` partial combine →
    one narrow (key, value, agg) row per block×key×value crosses the
    exchange → ``groupby(key)`` assembles the wide row vectorized. No
    per-row Python; exchange size independent of row count.
    """
    out_cols = [f"{prefix}{v}" for v in values]
    agg_int = value_col is None

    def partial(batch: pa.Table) -> pa.Table:
        sel = [key_col, col] + ([value_col] if value_col else [])
        t = batch.select(sel)
        if value_col:
            g = t.group_by([key_col, col]).aggregate([(value_col, "sum")])
            return g.rename_columns([key_col, "__pv", "__agg"])
        g = t.group_by([key_col, col]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, "__pv", "__agg"])

    val_idx = {v: i for i, v in enumerate(values)}

    def widen(group: pa.Table) -> pa.Table:
        pv = group.column("__pv").to_pylist()
        agg = group.column("__agg").to_numpy(zero_copy_only=False)
        acc = np.zeros(len(values), dtype=np.float64)
        for v, a in zip(pv, agg):
            i = val_idx.get(v)
            if i is not None:
                acc[i] += a
        cols = {key_col: group.column(key_col).combine_chunks().slice(0, 1)}
        for name, total in zip(out_cols, acc):
            cols[name] = pa.array(
                [int(total)] if agg_int else [round(float(total), 2)],
                type=pa.int64() if agg_int else pa.float64(),
            )
        return pa.Table.from_pydict(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(key_col).map_groups(
        widen, batch_format="pyarrow"
    )
