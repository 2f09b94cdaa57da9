"""semi_join: broadcast vs bloom-prefilter regimes, exactness, key types."""

import numpy as np
import pyarrow as pa


def _mk(ray, n=5000, seed=3):
    rng = np.random.default_rng(seed)
    left = pa.table({
        "k": pa.array(rng.integers(0, 1000, n), type=pa.int64()),
        "v": pa.array(np.arange(n), type=pa.int64()),
    })
    right = pa.table({
        "rk": pa.array(rng.choice(1000, 120, replace=False).astype(np.int64)),
    })
    import ray.data
    return (ray.data.from_arrow(left).repartition(4),
            ray.data.from_arrow(right).repartition(3),
            set(right.column("rk").to_pylist()),
            left)


def test_semi_join_broadcast_regime_exact(ray_session):
    from smartreader_ray.functions.join import semi_join

    left, right, keys, lt = _mk(ray_session)
    out = semi_join(left, right, "k", "rk",
                    broadcast_limit=10_000).take_all()
    want = sorted(v for k, v in zip(lt.column("k").to_pylist(),
                                    lt.column("v").to_pylist()) if k in keys)
    assert sorted(r["v"] for r in out) == want


def test_semi_join_bloom_regime_matches_broadcast(ray_session):
    from smartreader_ray.functions.join import semi_join

    left, right, keys, lt = _mk(ray_session, seed=9)
    a = sorted(r["v"] for r in semi_join(
        left, right, "k", "rk", broadcast_limit=10_000).take_all())
    # broadcast_limit below the 120 distinct keys → bloom + verify path
    b = sorted(r["v"] for r in semi_join(
        left, right, "k", "rk", broadcast_limit=10,
        bloom_bits=1 << 16).take_all())
    assert a == b
    want = sorted(v for k, v in zip(lt.column("k").to_pylist(),
                                    lt.column("v").to_pylist()) if k in keys)
    assert b == want


def test_semi_join_string_keys_bloom(ray_session):
    import ray.data

    from smartreader_ray.functions.join import semi_join

    left = pa.table({
        "name": [f"u{i % 50}" for i in range(400)],
        "v": pa.array(np.arange(400), type=pa.int64()),
    })
    right = pa.table({"rn": [f"u{i}" for i in range(0, 50, 5)]})
    out = semi_join(ray.data.from_arrow(left).repartition(3),
                    ray.data.from_arrow(right), "name", "rn",
                    broadcast_limit=2, bloom_bits=1 << 12).take_all()
    keys = {f"u{i}" for i in range(0, 50, 5)}
    want = sorted(v for n, v in zip(left.column("name").to_pylist(),
                                    left.column("v").to_pylist())
                  if n in keys)
    assert sorted(r["v"] for r in out) == want


def test_bloom_confusion_no_false_negatives_and_truth(ray_session):
    """Every true member must bloom-hit (the joins' exactness hinges on
    it); ground-truth column must equal set membership; tiny filters
    must show SOME false positives (the evaluation is non-degenerate)."""
    import ray.data
    from smartreader_ray.functions.join import bloom_confusion

    rng = np.random.default_rng(17)
    build = pa.table({"bk": pa.array(
        rng.choice(5000, 800, replace=False).astype(np.int64))})
    probe = pa.table({"pk": pa.array(
        np.arange(2500, dtype=np.int64))})
    members = set(build.column("bk").to_pylist())
    out = bloom_confusion(
        ray.data.from_arrow(build).repartition(3),
        ray.data.from_arrow(probe).repartition(4),
        "bk", "pk", bloom_bits=2048, bloom_k=2).take_all()
    assert len(out) == 2500
    fp = 0
    for r in out:
        want = 1 if r["pk"] in members else 0
        assert r["is_member"] == want
        if want:
            assert r["bloom_hit"] == 1  # no false negatives, ever
        elif r["bloom_hit"]:
            fp += 1
    assert fp > 0  # 800 keys into 2048 bits: saturated enough to FP


def test_bloom_confusion_string_keys(ray_session):
    """String keys ride the blake2b hash64 path; same invariants."""
    import ray.data
    from smartreader_ray.functions.join import bloom_confusion

    build = pa.table({"bk": pa.array([f"doc-{i}" for i in range(300)])})
    probe = pa.table({"pk": pa.array([f"doc-{i}" for i in range(600)])})
    out = bloom_confusion(
        ray.data.from_arrow(build), ray.data.from_arrow(probe),
        "bk", "pk", bloom_bits=1 << 16, bloom_k=4).take_all()
    assert len(out) == 600
    for r in out:
        want = 1 if int(r["pk"].split("-")[1]) < 300 else 0
        assert r["is_member"] == want
        if want:
            assert r["bloom_hit"] == 1
