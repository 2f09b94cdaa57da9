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
