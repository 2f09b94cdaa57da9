"""Misra–Gries heavy hitters (functions/sketch.py:frequent_terms)."""

import numpy as np
import pyarrow as pa

from smartreader_ray.functions.sketch import _mg_compress, frequent_terms


def test_mg_compress_bound():
    terms = np.array([f"t{i}" for i in range(10)])
    counts = np.array([100, 90, 80, 5, 4, 3, 2, 2, 1, 1], dtype=np.int64)
    t, c, dec = _mg_compress(terms, counts, capacity=3)
    assert dec == 5  # 4th largest
    assert list(t) == ["t0", "t1", "t2"]
    assert list(c) == [95, 85, 75]
    # every original count is within dec of its stored (or zero) estimate
    stored = dict(zip(t, c))
    for term, true in zip(terms, counts):
        assert stored.get(term, 0) <= true <= stored.get(term, 0) + dec


def test_mg_compress_noop_under_capacity():
    terms = np.array(["a", "b"])
    counts = np.array([3, 1], dtype=np.int64)
    t, c, dec = _mg_compress(terms, counts, capacity=5)
    assert dec == 0 and list(t) == ["a", "b"] and list(c) == [3, 1]


def _skewed_docs(n_docs=40, seed=3):
    """Zipf-ish corpus: a few hot terms, long random tail."""
    rng = np.random.RandomState(seed)
    hot = ["alpha", "beta", "gamma"]
    rows = []
    for i in range(n_docs):
        toks = []
        for h, w in zip(hot, (8, 5, 3)):
            toks += [h] * w
        toks += [f"tail{rng.randint(0, 5000)}" for _ in range(30)]
        rng.shuffle(toks)
        rows.append(" ".join(toks))
    return pa.table(
        {"doc_id": pa.array(range(n_docs), type=pa.int64()), "text": rows}
    )


def test_frequent_terms_finds_heavy_hitters(ray_session):
    import ray.data

    tbl = _skewed_docs()
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = frequent_terms(ds, capacity=64, k=5).take_all()
    top3 = [r["term"] for r in out[:3]]
    assert top3 == ["alpha", "beta", "gamma"]
    # est ≤ true ≤ est + err for the hot terms (true counts are known)
    true = {"alpha": 40 * 8, "beta": 40 * 5, "gamma": 40 * 3}
    for r in out[:3]:
        assert r["est"] <= true[r["term"]] <= r["est"] + r["err"]


def test_frequent_terms_exact_when_capacity_suffices(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": ["a a a b b c", "a b c c"],
        }
    )
    out = frequent_terms(ray.data.from_arrow(tbl), capacity=16, k=3).take_all()
    assert [(r["term"], r["est"], r["err"]) for r in out] == [
        ("a", 4, 0), ("b", 3, 0), ("c", 3, 0),
    ]


class TestCountMin:
    def test_bounds_and_partition_invariance(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from smartreader_ray.functions.sketch import count_min_term_counts

        rng = np.random.RandomState(0)
        vocab = [f"w{i}" for i in range(40)]
        docs = [" ".join(rng.choice(vocab, size=30)) for _ in range(80)]
        t = pa.table({"text": docs})
        true = {}
        total = 0
        for d in docs:
            for w in d.split(" "):
                true[w] = true.get(w, 0) + 1
                total += 1
        probes = vocab[:10]
        outs = []
        for parts in (1, 5):
            out = count_min_term_counts(
                ray.data.from_arrow(t).repartition(parts), probes,
                width=1 << 12, depth=4).take_all()
            outs.append({r["term"]: r["est"] for r in out})
        # merged sketch bit-identical under any partitioning
        assert outs[0] == outs[1]
        eps_n = (2.718281828 / (1 << 12)) * total
        for w in probes:
            tr = true.get(w, 0)
            assert outs[0][w] >= tr, w          # never undercounts
            assert outs[0][w] <= tr + eps_n + 1, w

    def test_absent_term_small_estimate(self, ray_session):
        import pyarrow as pa
        import ray.data

        from smartreader_ray.functions.sketch import count_min_term_counts

        t = pa.table({"text": ["a b c"] * 10})
        out = count_min_term_counts(
            ray.data.from_arrow(t), ["zzz"], width=1 << 12,
            depth=4).take_all()
        assert out[0]["est"] <= 1  # at most noise, never negative
