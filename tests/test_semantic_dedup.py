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


def test_cross_decontam_matches_naive(ray_session):
    """Contaminated set and matched ids equal a naive numpy sweep;
    eval rows themselves never appear in the output."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from smartreader_ray.functions.similarity import cross_decontam

    rng = np.random.default_rng(5)
    dim, n = 8, 120
    mat = rng.normal(size=(n, dim))
    # plant near-dups of eval vectors 3 and 7 into the train side
    mat[50] = mat[3] + rng.normal(scale=0.01, size=dim)
    mat[77] = mat[7] + rng.normal(scale=0.01, size=dim)
    labels = np.where(np.arange(n) < 20, 0, 1 + (np.arange(n) % 3))
    t = pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    })
    out = {r["vec_id"]: r["matched_eval_id"]
           for r in cross_decontam(
               ray.data.from_arrow(t).repartition(4),
               eval_label=0, tau=0.9).take_all()}

    m32 = mat.astype(np.float32).astype(np.float64)
    norm = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    sims = norm @ norm[:20].T
    want = {}
    for i in range(20, n):
        hits = np.nonzero(sims[i] >= 0.9)[0]
        if len(hits):
            want[i] = int(hits[0])
    assert out == want and 50 in out and out[50] == 3 and out[77] == 7
