"""Winnowing / containment / dropout kernels vs naive references."""

import numpy as np
import pyarrow as pa


def _naive_winnow(h, w):
    """Direct transcription of the MOSS selection rule: per window of
    w consecutive hashes take the min, rightmost on ties; dedupe."""
    n = len(h)
    if n == 0:
        return []
    we = min(w, n)
    sel = set()
    for s in range(n - we + 1):
        best, best_p = None, None
        for p in range(s, s + we):
            if best is None or h[p] < best or (h[p] == best and p > best_p):
                best, best_p = h[p], p
        sel.add(best_p)
    return sorted(sel)


def test_winnow_select_matches_naive_random():
    from smartreader_ray.functions.winnow import _winnow_select

    rng = np.random.RandomState(7)
    for trial in range(200):
        n = int(rng.randint(0, 40))
        # small value range forces many ties — the tie-break is the
        # part worth testing
        h = rng.randint(0, 5, size=n).astype(np.uint64)
        got = _winnow_select(h, 4).tolist()
        assert got == _naive_winnow(h.tolist(), 4), (trial, h)


def test_winnow_guarantee_shared_run_shares_fingerprint():
    """The winnowing guarantee: two docs sharing a run of >= w+k-1
    tokens share at least one selected fingerprint hash."""
    from smartreader_ray.functions.winnow import (
        _doc_kgram_hashes,
        _winnow_select,
    )

    k, w = 4, 4
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 = w+k-1
    a = "x1 x2 x3 " + shared + " y1 y2"
    b = "z9 " + shared + " q7 q8 q9 q10"
    fp_a = set()
    h = _doc_kgram_hashes(a, k)
    fp_a.update(h[_winnow_select(h, w)].tolist())
    h = _doc_kgram_hashes(b, k)
    fp_b = set(h[_winnow_select(h, w)].tolist())
    assert fp_a & fp_b


def test_winnow_short_doc_yields_one_fingerprint():
    from smartreader_ray.functions.winnow import (
        _doc_kgram_hashes,
        _winnow_select,
    )

    h = _doc_kgram_hashes("a b c d", 4)          # exactly one shingle
    assert len(h) == 1
    assert _winnow_select(h, 4).tolist() == [0]
    assert _doc_kgram_hashes("a b c", 4).size == 0   # too short


def test_containment_pairs_naive(ray_session):
    import ray.data

    from smartreader_ray.functions.winnow import containment_pairs

    quoted = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"      # 10 toks, 3 windows
    rows = [
        {"doc_id": 1, "text": quoted},
        {"doc_id": 2, "text": "intro " + quoted + " outro closing"},
        {"doc_id": 3, "text": "totally different words here " * 3},
    ]
    out = (containment_pairs(ray.data.from_items(rows), window=8)
           .to_pandas().sort_values(["doc_a", "doc_b"])
           .to_dict("records"))
    assert len(out) == 1
    r = out[0]
    # doc 1 (3 distinct windows) fully contained in doc 2
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["shared"] == 3 and r["n_a"] == 3
    assert r["c_a"] == 1.0 and r["c_b"] == 3 / r["n_b"]


def test_token_dropout_naive(ray_session):
    import ray.data

    from smartreader_ray.functions.curation import token_dropout
    from smartreader_ray.functions.dedup import _hash64

    rows = [{"doc_id": 11, "text": "  the quick brown fox jumps  "},
            {"doc_id": 12, "text": ""},
            {"doc_id": 13, "text": "a  b"}]   # double space: empty token
    out = {r["doc_id"]: r for r in
           token_dropout(ray.data.from_items(rows), rate_den=8)
           .to_pandas().to_dict("records")}
    for row in rows:
        d = row["doc_id"]
        toks = row["text"].strip().split(" ")
        h = _hash64([f"{d}:{i}" for i in range(len(toks))])
        keep = [t for t, hv in zip(toks, h.tolist()) if hv % 8 != 0]
        assert out[d]["text_aug"] == " ".join(keep)
        assert out[d]["n_tokens"] == len(toks)
        assert out[d]["n_dropped"] == len(toks) - len(keep)


def test_freq_spectrum_and_vocab_growth(ray_session):
    import ray.data

    from smartreader_ray.functions.ngrams import freq_spectrum, vocab_growth

    rows = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["a b c", "a b", "a d", "e e e", "f"])]
    ds = ray.data.from_items(rows)

    spec = {r["r"]: r for r in
            freq_spectrum(ds).to_pandas().to_dict("records")}
    # counts: a=3 b=2 c=1 d=1 e=3 f=1
    assert spec[1]["n_terms"] == 3 and spec[1]["mass"] == 3
    assert spec[2]["n_terms"] == 1
    assert spec[3]["n_terms"] == 2 and spec[3]["mass"] == 6

    vg = vocab_growth(ds).to_pandas()
    assert vg["bucket"].tolist() == list(range(1, 11))
    assert vg["vocab_cum"].iloc[-1] == 6
    assert vg["docs_cum"].iloc[-1] == 5
    # first doc (rank 1, bucket 1) contributes a, b, c
    assert vg.set_index("bucket").loc[1, "vocab_cum"] == 3
    # cumulative monotone
    assert (vg["vocab_cum"].diff().dropna() >= 0).all()
