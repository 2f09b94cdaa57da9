"""Tests for semantic_dedup (`functions/similarity.py`) — SemDeDup-shaped
cluster-then-dedup over embeddings."""

import numpy as np
import pyarrow as pa
import pytest


def _table_with_planted_dups():
    """Two tight pairs (near-identical vectors) + noise. Vectors 0/1
    and 10/11 are planted duplicates (cos ~ 1)."""
    rng = np.random.default_rng(73)
    vecs = [rng.uniform(-0.3, 0.3, 16) for _ in range(40)]
    vecs[1] = vecs[0] + 1e-4
    vecs[11] = vecs[10] * 1.001  # same direction, scaled
    return pa.table({
        "vec_id": pa.array(range(40), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float64())),
    })


class TestSemanticDedup:
    def test_planted_dups_merge(self, ray_session):
        import ray.data

        from smartreader_ray.functions.similarity import semantic_dedup

        got = semantic_dedup(
            ray.data.from_arrow(_table_with_planted_dups()),
            k_clusters=4, tau=0.95).to_pandas().set_index("vec_id")
        assert got.loc[1, "canonical"] == 0
        assert got.loc[11, "canonical"] == 10
        # everything has a cluster and non-dups keep themselves
        assert got["cluster"].between(0, 3).all()
        assert got.loc[5, "canonical"] == 5

    def test_partition_invariance(self, ray_session):
        import ray.data

        from smartreader_ray.functions.similarity import semantic_dedup

        t = _table_with_planted_dups()
        a = semantic_dedup(ray.data.from_arrow(t), k_clusters=4,
                           tau=0.95).to_pandas()
        b = semantic_dedup(ray.data.from_arrow(t).repartition(5),
                           k_clusters=4, tau=0.95).to_pandas()
        assert a.equals(b)

    def test_cluster_cap_raises(self, ray_session):
        import ray.data

        from smartreader_ray.functions.similarity import semantic_dedup

        with pytest.raises(Exception, match="cluster_cap"):
            semantic_dedup(
                ray.data.from_arrow(_table_with_planted_dups()),
                k_clusters=1, tau=0.99, cluster_cap=5).to_pandas()
