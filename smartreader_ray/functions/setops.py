"""Distributed set operations by content — EXCEPT / INTERSECT at scale.

SQL's ``EXCEPT`` / ``INTERSECT DISTINCT`` over wide rows (full document
text) would ship every byte of both corpora through the exchange. These
operators hash the compared column down to an 8-byte fingerprint first
(same blake2b-derived hash64 as ``fingerprint_dedup``), so the all-to-all
carries (hash, id) pairs — ~16 bytes/row regardless of document size.
Collision odds at 64 bits are ~n²/2⁶⁵ (≈3·10⁻⁸ for a billion docs), the
standard content-addressing trade documented in `functions/dedup.py`.

Both ops reuse :func:`smartreader_ray.functions.join.hash_join`'s
left_anti / inner machinery (hot-key guard included) rather than a
bespoke shuffle.
"""

from __future__ import annotations

import pyarrow as pa

from .dedup import _hash64
from .join import hash_join


def _with_content_hash(ds, content_col: str, out_col: str):
    def add_hash(batch: pa.Table) -> pa.Table:
        import numpy as np

        vals = batch.column(content_col).to_pylist()
        h = np.asarray(_hash64([v or "" for v in vals]), dtype=np.uint64)
        return batch.append_column(
            out_col, pa.array(h.view(np.int64), type=pa.int64())
        )

    return ds.map_batches(add_hash, batch_format="pyarrow")


def except_by_content(left, right, id_col: str = "doc_id",
                      content_col: str = "text"):
    """Rows of ``left`` whose ``content_col`` value does not appear
    anywhere in ``right`` — SQL ``EXCEPT`` semantics on content, with
    one distinct survivor per content value (smallest ``id_col``, so the
    result is engine-reproducible across partitionings).

    Plan: hash both sides → left_anti hash-join on the 8-byte hash →
    groupby(hash).min(id) dedups the survivors. Only (hash, id) pairs
    cross either exchange; document bytes never do.
    """
    from ray.data.aggregate import Min

    lh = _with_content_hash(left.select_columns([id_col, content_col]),
                            content_col, "__h").select_columns([id_col, "__h"])
    rh = _with_content_hash(right.select_columns([content_col]),
                            content_col, "__rh").select_columns(["__rh"])
    survivors = hash_join(
        lh, rh, left_key="__h", right_key="__rh",
        left_cols=[id_col, "__h"], right_cols=["__rh"], how="left_anti",
    )
    firsts = survivors.groupby("__h").aggregate(Min(id_col))

    def clean(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["__h", id_col])
        return b.select([id_col])

    return firsts.map_batches(clean, batch_format="pyarrow")


def intersect_by_content(left, right, id_col: str = "doc_id",
                         content_col: str = "text"):
    """Distinct content values present in BOTH sides, reported as the
    smallest left-side ``id_col`` per value (SQL ``INTERSECT`` with a
    deterministic representative).

    The right side is reduced to its distinct hashes BEFORE the join,
    so the semi-join ships one row per distinct content value and each
    left row matches at most one right row — the cross-product guard
    can never trip on duplicate-heavy inputs.
    """
    from ray.data.aggregate import Min

    lh = _with_content_hash(left.select_columns([id_col, content_col]),
                            content_col, "__h").select_columns([id_col, "__h"])
    rh = (
        _with_content_hash(right.select_columns([content_col]),
                           content_col, "__rh")
        .select_columns(["__rh"])
        .groupby("__rh").count()
        .map_batches(lambda b: b.select(["__rh"]), batch_format="pyarrow")
    )
    matched = hash_join(
        lh, rh, left_key="__h", right_key="__rh",
        left_cols=[id_col, "__h"], right_cols=["__rh"], how="inner",
    )
    firsts = matched.groupby("__h").aggregate(Min(id_col))

    def clean(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["__h", id_col])
        return b.select([id_col])

    return firsts.map_batches(clean, batch_format="pyarrow")
