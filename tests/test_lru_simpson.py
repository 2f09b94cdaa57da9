"""LRU cache audit (functions/windows.py:lru_audit) and Simpson
lexical concentration (functions/ngrams.py:simpson_concentration)."""

import datetime

import pyarrow as pa
import pytest
import ray.data

from smartreader_ray.functions.ngrams import simpson_concentration
from smartreader_ray.functions.windows import lru_audit


def _events(rows):
    """rows: list of (user_id, seconds_offset, event_id, key)."""
    base = datetime.datetime(2024, 1, 1)
    return ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([base + datetime.timedelta(seconds=r[1])
                        for r in rows], type=pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows], type=pa.string()),
    }))


def test_lru_hand_computed(ray_session):
    # user 1, capacity 2, sequence: a b a c b b a
    #   a: cold  (cache a)
    #   b: cold  (cache a,b)
    #   a: hit   (cache b,a)
    #   c: cold  (evict b → cache a,c)
    #   b: cap-miss (evict a → cache c,b)
    #   b: hit
    #   a: cap-miss (evict c → cache b,a)
    seq = ["a", "b", "a", "c", "b", "b", "a"]
    rows = [(1, i, i, k) for i, k in enumerate(seq)]
    out = lru_audit(_events(rows), capacity=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.n_events, r.hits, r.cold_misses, r.capacity_misses) == (
        7, 2, 3, 2)


def test_lru_capacity_one_and_order(ray_session):
    # capacity 1: hit only on immediate repeats; ties on ts broken by
    # event_id (rows given out of order on purpose).
    rows = [(5, 0, 2, "x"), (5, 0, 1, "x"), (5, 1, 3, "y"), (5, 2, 4, "x")]
    out = lru_audit(_events(rows), capacity=1).to_pandas()
    r = out.iloc[0]
    # replay order by (ts, event_id): x x y x → cold, hit, cold, cap-miss
    assert (r.n_events, r.hits, r.cold_misses, r.capacity_misses) == (
        4, 1, 2, 1)


def test_lru_counts_partition_invariant(ray_session):
    rows = []
    for u in range(4):
        for i in range(30):
            rows.append((u, i, u * 1000 + i, f"k{(i * (u + 1)) % 5}"))
    a = lru_audit(_events(rows), capacity=2).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    b = lru_audit(_events(rows).repartition(7), capacity=2).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert a.equals(b)
    assert ((a.hits + a.cold_misses + a.capacity_misses)
            == a.n_events).all()


def test_lru_capacity_validation(ray_session):
    with pytest.raises(ValueError):
        lru_audit(_events([(1, 0, 0, "a")]), capacity=0)


def test_simpson_hand_computed(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "source": ["s1", "s1", "s2"],
        "text": ["a a b", "a", "c  c"],  # s2: double space → empty token
    }))
    out = simpson_concentration(docs).to_pandas().set_index("source")
    # s1: counts a=3, b=1 → n=4, terms=2, sumsq=10
    assert (out.loc["s1", ["n_tokens", "n_terms", "sum_sq"]]
            .tolist() == [4, 2, 10])
    # s2: "c  c" splits to c,"",c → c=2, ""=1 (empties kept, matching
    # string_split(trim(text),' ') oracle semantics)
    assert (out.loc["s2", ["n_tokens", "n_terms", "sum_sq"]]
            .tolist() == [3, 2, 5])


def test_simpson_partition_invariant(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "source": [f"s{i % 3}" for i in range(60)],
        "text": [f"w{i % 7} w{i % 5} w{i % 7}" for i in range(60)],
    }))
    a = simpson_concentration(docs).to_pandas().reset_index(drop=True)
    b = simpson_concentration(docs.repartition(11)).to_pandas() \
        .reset_index(drop=True)
    assert a.equals(b)


def test_diversity_mix_chain_invariants(ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    out = entry._q_diversity_mix_chain("/root/testdata/sf0.001").to_pandas()
    # gate keeps 13 of 20 sources at sf0.001; budget sums exactly
    assert len(out) == 13
    assert out.alloc.sum() == 100_000
    assert (out.alloc >= 0).all() and out.source.is_unique


def test_priority_dedup_hand_computed(ray_session):
    from smartreader_ray.functions.dedup import priority_dedup

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 3, 7, 99], type=pa.int64()),
        "text": ["a b c d e f", "a b c d e XX", "a b c d e",
                 "other text here one two"],
        "priority": pa.array([5, 2, 2, 1], type=pa.int64()),
    }))
    out = priority_dedup(docs, "priority").to_pandas() \
        .set_index("dup_key")
    # key "a b c d e": min priority 2 held by doc 3 and doc 7 → doc 3
    r = out.loc["a b c d e"]
    assert (r.keep_priority, r.keep_doc_id, r.n_dups) == (2, 3, 3)
    assert out.loc["other text here one two"].keep_doc_id == 99


def test_priority_dedup_guards(ray_session):
    from smartreader_ray.functions.dedup import priority_dedup

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": ["x"],
        "priority": pa.array([1 << 20], type=pa.int64()),
    }))
    with pytest.raises(Exception):
        priority_dedup(docs, "priority").to_pandas()


def test_mrc_hand_computed(ray_session):
    from smartreader_ray.functions.windows import mrc_curve

    # single user, a b a c b b a (distances: -,-,1,-,2,0,2)
    seq = ["a", "b", "a", "c", "b", "b", "a"]
    rows = [(1, i, i, k) for i, k in enumerate(seq)]
    out = mrc_curve(_events(rows), max_capacity=3).to_pandas() \
        .set_index("capacity")
    # hist: d0=1, d1=1, d2=2, pooled(cold)=3
    assert out.hits.tolist() == [1, 2, 4]
    assert out.misses.tolist() == [6, 5, 3]


def test_mrc_matches_lru_audit(ray_session):
    from smartreader_ray.functions.windows import lru_audit, mrc_curve

    rows = []
    for u in range(5):
        for i in range(40):
            rows.append((u, i, u * 1000 + i, f"k{(i * i + u) % 6}"))
    ev = _events(rows)
    mrc = mrc_curve(ev, max_capacity=4).to_pandas().set_index("capacity")
    audit = lru_audit(ev, capacity=2).to_pandas()
    assert mrc.loc[2, "hits"] == audit.hits.sum()
    # inclusion property: hits monotone nondecreasing in capacity
    assert mrc.hits.is_monotonic_increasing
    assert ((mrc.hits + mrc.misses) == len(rows)).all()


def test_source_cosine_hand_computed(ray_session):
    import math

    from smartreader_ray.functions.ngrams import source_cosine

    docs = ray.data.from_arrow(pa.table({
        "source": ["a", "a", "b", "c"],
        "text": ["x x y", "x", "x y y", "z"],
    }))
    out = source_cosine(docs).to_pandas().set_index(
        ["source_a", "source_b"])
    # a: x=3, y=1 (na2=10); b: x=1, y=2 (nb2=5); c: z=1
    r = out.loc[("a", "b")]
    assert (r["dot"], r["na2"], r["nb2"]) == (5, 10, 5)
    assert r["cosine"] == 5 / math.sqrt(50.0)
    # zero-overlap pair still present with dot 0
    ac = out.loc[("a", "c")]
    assert ac["dot"] == 0 and ac["cosine"] == 0.0
    assert len(out) == 3


def test_source_cosine_partition_invariant(ray_session):
    from smartreader_ray.functions.ngrams import source_cosine

    docs = ray.data.from_arrow(pa.table({
        "source": [f"s{i % 4}" for i in range(40)],
        "text": [f"t{i % 6} t{i % 3} t{i % 6}" for i in range(40)],
    }))
    a = source_cosine(docs).to_pandas().reset_index(drop=True)
    b = source_cosine(docs.repartition(9)).to_pandas().reset_index(drop=True)
    assert a.equals(b)
