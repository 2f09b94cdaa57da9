"""Incremental dedup index: sharded mutable state via raw actors."""

import pyarrow as pa


def _docs(ids_and_texts):
    return pa.table(
        {
            "doc_id": pa.array([i for i, _ in ids_and_texts], type=pa.int64()),
            "text": [t for _, t in ids_and_texts],
        }
    )


def test_incremental_dedup_two_waves(ray_session):
    import ray.data

    from smartreader_ray.state import DedupIndex

    idx = DedupIndex(num_shards=4)
    wave1 = ray.data.from_arrow(
        _docs([(1, "aaa bbb ccc"), (2, "ddd eee fff"), (3, "aaa bbb ccc")])
    )
    kept1 = idx.filter_new(wave1).take_all()
    # one survivor per distinct content within the wave
    assert sorted({r["text"] for r in kept1}) == ["aaa bbb ccc", "ddd eee fff"]
    assert len(kept1) == 2

    # second wave: repeats of indexed content all drop, new content passes
    wave2 = ray.data.from_arrow(
        _docs([(10, "aaa bbb ccc"), (11, "new stuff here"), (12, "ddd eee fff")])
    )
    kept2 = idx.filter_new(wave2).take_all()
    assert [r["doc_id"] for r in kept2] == [11]

    st = idx.stats()
    assert st["entries"] == 3 and st["shards"] == 4


def test_incremental_dedup_exactly_one_survivor_under_parallelism(ray_session):
    import ray.data

    from smartreader_ray.state import DedupIndex

    idx = DedupIndex(num_shards=2)
    # 200 docs, only 10 distinct contents, spread over many blocks so
    # several map tasks race on the same fingerprints
    rows = [(i, f"content number {i % 10} repeated") for i in range(200)]
    ds = ray.data.from_arrow(_docs(rows)).repartition(16)
    kept = idx.filter_new(ds).take_all()
    assert len(kept) == 10
    assert {r["text"] for r in kept} == {t for _, t in rows}


def test_bloom_shard_mode(ray_session):
    import ray.data

    from smartreader_ray.state import DedupIndex

    idx = DedupIndex(num_shards=2, bloom_bits=1 << 16)
    rows = [(i, f"doc {i} body") for i in range(100)] + [
        (1000 + i, f"doc {i} body") for i in range(100)  # exact repeats
    ]
    kept = idx.filter_new(ray.data.from_arrow(_docs(rows))).take_all()
    # every repeat is caught; Bloom may only over-drop (none expected at
    # this load factor: 100 entries in 65536 bits)
    texts = [r["text"] for r in kept]
    assert len(texts) == len(set(texts))
    assert 95 <= len(texts) <= 100

    st = idx.stats()
    assert st["entries"] is None  # bloom mode doesn't track counts
    assert st["approx_bytes"] == 2 * (1 << 16) // 8


def test_bloom_bits_validation(ray_session):
    import pytest
    import ray

    from smartreader_ray.state import FingerprintShard

    shard = FingerprintShard.remote(bloom_bits=1000)  # not a power of two
    with pytest.raises(Exception, match="power of two"):
        ray.get(shard.check_and_add.remote([1]))


def test_neardup_index_two_waves(ray_session):
    """Wave 2's near-duplicates of wave-1 docs are rejected; genuinely
    new content passes; accepted docs record their bands."""
    import pyarrow as pa
    import ray.data

    from smartreader_ray.state.dedup_index import NearDupIndex

    base = ("the quick brown fox jumps over the lazy dog and keeps running "
            "through the wide open field towards the distant river bank "
            "every single morning before sunrise without fail")
    near = base.replace("lazy", "sleepy")  # high-Jaccard near-dup
    other = ("completely different content about database systems and "
             "distributed query execution with vectorized operators and "
             "shuffle services plus columnar storage layouts")

    idx = NearDupIndex(num_shards=2)
    w1 = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1], type=pa.int64()), "text": [base]}
    ))
    kept1 = idx.filter_new(w1).take_all()
    assert [r["doc_id"] for r in kept1] == [1]

    w2 = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([2, 3], type=pa.int64()),
         "text": [near, other]}
    ))
    kept2 = sorted(r["doc_id"] for r in idx.filter_new(w2).take_all())
    assert kept2 == [3]  # near-dup of wave 1 rejected, new doc kept
    assert idx.stats()["band_keys"] > 0


def test_neardup_index_rejected_doc_does_not_pollute(ray_session):
    """A REJECTED doc must not record its bands: a later doc similar to
    the rejected one (but not to any accepted one) is admitted."""
    import pyarrow as pa
    import ray.data

    from smartreader_ray.state.dedup_index import NearDupIndex

    a = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    idx = NearDupIndex(num_shards=2)
    idx.filter_new(ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1], type=pa.int64()), "text": [a]}
    ))).take_all()
    n1 = idx.stats()["band_keys"]
    # an exact duplicate is rejected and must add nothing
    kept = idx.filter_new(ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([2], type=pa.int64()), "text": [a]}
    ))).take_all()
    assert kept == []
    assert idx.stats()["band_keys"] == n1
