"""Tests for kcenter_select (`functions/similarity.py`) — greedy
farthest-point coreset selection."""

import numpy as np
import pyarrow as pa


def _embeddings(n=120, dim=8, seed=61):
    rng = np.random.default_rng(seed)
    return pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array(
            [rng.uniform(-0.3, 0.3, dim).tolist() for _ in range(n)],
            type=pa.list_(pa.float64())),
    })


def _brute(t, k, scale=1000):
    e = np.stack(t.column("embedding").to_pandas().to_numpy())
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    eq = np.floor(e.astype(np.float64) * scale + 0.5).astype(np.int64)
    norms = (eq * eq).sum(1)
    i = np.lexsort((ids, -norms))[0]
    picks = [(0, int(ids[i]), -1)]
    mind = ((eq - eq[i]) ** 2).sum(1)
    for r in range(1, k):
        i = np.lexsort((ids, -mind))[0]
        picks.append((r, int(ids[i]), int(mind[i])))
        mind = np.minimum(mind, ((eq - eq[i]) ** 2).sum(1))
    return picks


class TestKCenter:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from smartreader_ray.functions.similarity import kcenter_select

        t = _embeddings()
        got = kcenter_select(ray.data.from_arrow(t), k=6,
                             ).to_pandas().values.tolist()
        assert [tuple(r) for r in got] == _brute(t, 6)

    def test_partition_invariance(self, ray_session):
        import ray.data

        from smartreader_ray.functions.similarity import kcenter_select

        t = _embeddings(seed=67)
        a = kcenter_select(ray.data.from_arrow(t), k=5).to_pandas()
        b = kcenter_select(ray.data.from_arrow(t).repartition(7),
                           k=5).to_pandas()
        assert a.equals(b)

    def test_radius_nonincreasing_and_distinct(self, ray_session):
        import ray.data

        from smartreader_ray.functions.similarity import kcenter_select

        got = kcenter_select(
            ray.data.from_arrow(_embeddings(seed=71)), k=8).to_pandas()
        d = got["dist2"].to_numpy()[1:]
        assert (np.diff(d) <= 0).all()  # coverage radius shrinks
        assert got["vec_id"].nunique() == 8
