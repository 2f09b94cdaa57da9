"""Distributed k-means (functions/similarity.py:kmeans_fit)."""

import numpy as np
import pyarrow as pa

from smartreader_ray.functions.similarity import _normalize, kmeans_fit


def _reference(X, k, iters):
    """Single-process Lloyd's with the same init and the same summation
    order (sequential np.add.at) as the engine's partial combine."""
    X = _normalize(np.asarray(X, dtype=np.float64))
    d = X.shape[1]
    C = X[:k].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, assign, X)
        counts = np.bincount(assign, minlength=k)
        newC = C.copy()
        nonempty = counts > 0
        newC[nonempty] = _normalize(sums[nonempty] / counts[nonempty, None])
        C = newC
    return np.argmax(X @ C.T, axis=1), C


def _blobs(n=60, d=8, k=3, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 4
    X = np.vstack([centers[i % k] + rng.randn(d) * 0.3 for i in range(n)])
    return X


def test_kmeans_matches_reference_single_block(ray_session):
    import ray.data

    X = _blobs()
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(X)), type=pa.int64()),
            "embedding": pa.array([row.tolist() for row in X],
                                  type=pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    got, C = kmeans_fit(ds, k=3, iters=4)
    labels = {r["vec_id"]: r["cluster"] for r in got.take_all()}
    # reference sees the same float32-rounded input the engine reads
    ref_labels, ref_C = _reference(X.astype(np.float32).astype(np.float64), 3, 4)
    assert [labels[i] for i in range(len(X))] == list(ref_labels)
    assert np.allclose(C, ref_C, atol=1e-9)


def test_kmeans_multiblock_stable_assignments(ray_session):
    import ray.data

    X = _blobs(n=90)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(X)), type=pa.int64()),
            "embedding": pa.array([row.tolist() for row in X],
                                  type=pa.list_(pa.float32())),
        }
    )
    one = ray.data.from_arrow(tbl)
    many = ray.data.from_arrow(tbl).repartition(6)
    l1, _ = kmeans_fit(one, k=3, iters=4)
    l2, _ = kmeans_fit(many, k=3, iters=4)
    m1 = {r["vec_id"]: r["cluster"] for r in l1.take_all()}
    m2 = {r["vec_id"]: r["cluster"] for r in l2.take_all()}
    # well-separated blobs: partitioning must not change the clustering
    assert m1 == m2


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    import ray.data

    # two identical points + k=2 → second cluster goes empty and must
    # retain its init centroid instead of NaN-ing out
    X = np.array([[1.0, 0.0], [1.0, 0.0], [1.0, 0.0]])
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], type=pa.int64()),
            "embedding": pa.array([r.tolist() for r in X],
                                  type=pa.list_(pa.float32())),
        }
    )
    got, C = kmeans_fit(ray.data.from_arrow(tbl), k=2, iters=3)
    assert not np.isnan(C).any()
    labels = [r["cluster"] for r in got.take_all()]
    assert set(labels) == {0}
