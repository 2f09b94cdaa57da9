"""Fuzzy string matching: edit-distance-1 similarity join via
deletion-neighborhood blocking — the FastSS / SymSpell family (Bocek
et al., "Fast Similarity Search in Large Dictionaries", 2007; public
algorithm). Typo-clustering over entity names / URLs / queries is a
standard record-linkage step in web-corpus curation.

Why blocking: the naive similarity join is all-pairs (n² edit-distance
calls — 10¹⁴ at a 10⁷ vocabulary). Under deletion blocking two strings
at Levenshtein distance ≤ 1 ALWAYS share a block key (one string
itself, or a 1-deletion variant of it): substitution pairs share the
deletion at the mismatch position, insertion/deletion pairs share the
shorter string itself. So candidates = within-bucket pairs only, and
each bucket's size is bounded by alphabet × key frequency, not n.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

_LOG = logging.getLogger(__name__)


def is_edit1(a: str, b: str) -> bool:
    """Exact check: Levenshtein(a, b) == 1. O(len) two-pointer —
    no DP table needed at distance 1."""
    la, lb = len(a), len(b)
    if la == lb:
        if a == b:
            return False
        diff = 0
        for x, y in zip(a, b):
            if x != y:
                diff += 1
                if diff > 1:
                    return False
        return diff == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la != 1:
        return False
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit1_pairs(ds, col: str, bucket_cap: int = 1024):
    """All DISTINCT value pairs of ``col`` at Levenshtein distance
    exactly 1, verified — SQL-equivalent to a self-join on
    ``levenshtein(a, b) = 1`` without the n² blowup.

    Plan: distinct values (keys-only groupby) → each value emits itself
    plus its 1-deletion variants as block keys (L+1 short rows per
    value) → ``groupby(bucket)`` co-locates candidates → within-bucket
    pairs are VERIFIED in place (O(len) check, so unverified candidates
    never cross a second exchange) → ``groupby(pair)`` dedups pairs
    found via multiple shared keys. A degenerate bucket beyond
    ``bucket_cap`` values is truncated loudly (same skew-guard
    philosophy as the LSH band caps — at that size the key is a
    near-constant prefix and the pairs are noise).
    """

    distinct = (
        ds.select_columns([col])
        .groupby(col)
        .count()
        .map_batches(lambda b: b.select([col]), batch_format="pyarrow")
    )

    def variants(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_pylist()
        keys: list[str] = []
        strs: list[str] = []
        for s in vals:
            s = s or ""
            keys.append(s)
            strs.append(s)
            for i in range(len(s)):
                keys.append(s[:i] + s[i + 1:])
                strs.append(s)
        return pa.table({
            "bucket": pa.array(keys, type=pa.string()),
            "s": pa.array(strs, type=pa.string()),
        })

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ss = sorted(set(g.column("s").to_pylist()))
        if len(ss) > bucket_cap:
            _LOG.warning(
                "edit1_pairs: bucket %r truncated %d -> %d values",
                g.column("bucket")[0].as_py(), len(ss), bucket_cap)
            ss = ss[:bucket_cap]
        a_out: list[str] = []
        b_out: list[str] = []
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                if is_edit1(ss[i], ss[j]):
                    a_out.append(ss[i])
                    b_out.append(ss[j])
        return pa.table({
            "a": pa.array(a_out, type=pa.string()),
            "b": pa.array(b_out, type=pa.string()),
        })

    return (
        distinct.map_batches(variants, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .map_batches(lambda b: b.select(["a", "b"]),
                     batch_format="pyarrow")
        .sort(["a", "b"])
    )
