"""Property tests: the vectorized span-sequence kernels vs naive
per-document reference implementations on arbitrary span tables
(hypothesis) — same pattern as test_properties.py for the DOM caches.
Each test also re-runs the kernel on a sliced batch (non-zero Arrow
list offsets) to pin the offset arithmetic.
"""

import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from smartreader_ray.spanio import (
    media_context_batch,
    modality_runs_batch,
    normalize_spans_batch,
    span_diff_batch,
    truncate_spans_batch,
)

_SPAN_T = pa.list_(pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int64()),
]))

_texts = st.text(alphabet=list("ab \t"), max_size=8)
_span = st.tuples(
    st.sampled_from(["text", "image", "video"]),
    _texts,
    st.sampled_from(["", "m1", "m2"]),
)
_doc = st.lists(_span, max_size=8)
_docs = st.lists(_doc, min_size=1, max_size=6)


def _mk(docs):
    return pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "spans": pa.array(
            [[{"kind": k, "text": t, "media_ref": m, "offset": i}
              for i, (k, t, m) in enumerate(d)] for d in docs],
            type=_SPAN_T),
    })


def _naive_normalize(docs):
    rows = []
    for did, d in enumerate(docs):
        kept = [(k, t.strip(), m) for (k, t, m) in d
                if not (k == "text" and not t.strip())]
        segs, run = [], []
        for k, t, m in kept:
            if k == "text":
                run.append(t)
            else:
                if run:
                    segs.append(("text", " ".join(run), run_m))
                    run = []
                segs.append((k, t, m))
            if k == "text" and len(run) == 1:
                run_m = m
        if run:
            segs.append(("text", " ".join(run), run_m))
        for off, (k, t, m) in enumerate(segs):
            rows.append((did, off, k, t, m))
    return rows


@settings(max_examples=60, deadline=None)
@given(_docs)
def test_normalize_matches_naive(docs):
    got = [(r["doc_id"], r["offset"], r["kind"], r["text"], r["media_ref"])
           for r in normalize_spans_batch(_mk(docs)).to_pylist()]
    assert got == _naive_normalize(docs)
    if len(docs) > 1:
        sl = [(r["doc_id"], r["offset"], r["kind"], r["text"],
               r["media_ref"])
              for r in normalize_spans_batch(_mk(docs).slice(1))
              .to_pylist()]
        assert sl == [r for r in _naive_normalize(docs) if r[0] >= 1]


def _naive_runs(docs):
    out = {}
    for did, d in enumerate(docs):
        if not d:
            continue
        classes = [k == "text" for (k, _, _) in d]
        runs = []
        for c in classes:
            if runs and runs[-1][0] == c:
                runs[-1][1] += 1
            else:
                runs.append([c, 1])
        out[did] = {
            "n_runs": len(runs),
            "n_text_runs": sum(1 for c, _ in runs if c),
            "n_media_runs": sum(1 for c, _ in runs if not c),
            "max_text_run": max([n for c, n in runs if c], default=0),
            "max_media_run": max([n for c, n in runs if not c],
                                 default=0),
        }
    return out


@settings(max_examples=60, deadline=None)
@given(_docs)
def test_modality_runs_matches_naive(docs):
    got = {r.pop("doc_id"): r
           for r in modality_runs_batch(_mk(docs)).to_pylist()}
    assert got == _naive_runs(docs)


def _naive_diff(a, b):
    for i, (sa, sb) in enumerate(zip(a, b)):
        for field, ia, ib in (("kind", sa[0], sb[0]),
                              ("text", sa[1], sb[1]),
                              ("media_ref", sa[2], sb[2])):
            if ia != ib:
                return False, i, field
    if len(a) != len(b):
        return False, min(len(a), len(b)), "length"
    return True, -1, ""


@settings(max_examples=60, deadline=None)
@given(_docs, _docs)
def test_span_diff_matches_naive(docs_a, docs_b):
    n = min(len(docs_a), len(docs_b))
    docs_a, docs_b = docs_a[:n], docs_b[:n]
    ta, tb = _mk(docs_a), _mk(docs_b)
    batch = pa.table({"doc_id": ta.column("doc_id"),
                      "spans_a": ta.column("spans"),
                      "spans_b": tb.column("spans")})
    for r in span_diff_batch(batch).to_pylist():
        eq, fm, fld = _naive_diff(docs_a[r["doc_id"]],
                                  docs_b[r["doc_id"]])
        assert (r["equal"], r["first_mismatch"], r["mismatch_field"]) \
            == (eq, fm, fld), r
        assert r["n_a"] == len(docs_a[r["doc_id"]])
        assert r["n_b"] == len(docs_b[r["doc_id"]])


def _naive_truncate(docs, budget, media_cost=64):
    rows = []
    for did, d in enumerate(docs):
        prefix = 0
        for off, (k, t, m) in enumerate(d):
            toks = re.findall(r"\S+", t)
            cost = len(toks) if k == "text" else media_cost
            if prefix < budget:
                if k == "text":
                    keep_n = min(len(toks), budget - prefix)
                    out_t = (" ".join(toks[:keep_n])
                             if keep_n < len(toks) else t)
                    rows.append((did, off, k, out_t, m, keep_n))
                else:
                    rows.append((did, off, k, t, m, media_cost))
            prefix += cost
    return rows


@settings(max_examples=60, deadline=None)
@given(_docs, st.integers(min_value=1, max_value=80))
def test_truncate_matches_naive(docs, budget):
    got = [(r["doc_id"], r["offset"], r["kind"], r["text"],
            r["media_ref"], r["cost"])
           for r in truncate_spans_batch(_mk(docs),
                                         budget=budget).to_pylist()]
    assert got == _naive_truncate(docs, budget)


def _naive_context(docs, k):
    rows = []
    for did, d in enumerate(docs):
        for p, (kind, t, m) in enumerate(d):
            if kind == "text":
                continue
            lo, hi = max(0, p - k), min(len(d) - 1, p + k)
            ctx = [d[j][1] for j in range(lo, hi + 1)
                   if d[j][0] == "text"]
            rows.append((did, p, kind, m, " ".join(ctx), len(ctx)))
    return rows


@settings(max_examples=60, deadline=None)
@given(_docs, st.integers(min_value=0, max_value=4))
def test_media_context_matches_naive(docs, k):
    got = [(r["doc_id"], r["offset"], r["kind"], r["media_ref"],
            r["context"], r["n_ctx"])
           for r in media_context_batch(_mk(docs), k=k).to_pylist()]
    assert got == _naive_context(docs, k)
