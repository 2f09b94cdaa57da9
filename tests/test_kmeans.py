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


class TestPQEncode:
    def _data(self, seed, n=40, d=16):
        rng = np.random.RandomState(seed)
        vecs = rng.randn(n, d).astype(np.float32)
        return pa.table({
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  type=pa.list_(pa.float32())),
        }), vecs

    def test_matches_integer_reference(self, ray_session):
        import ray.data

        from smartreader_ray.functions.similarity import pq_encode

        t, vecs = self._data(0)
        cb = vecs[:4].astype(np.float64)
        out = pq_encode(ray.data.from_arrow(t).repartition(3), cb,
                        n_subspaces=4, scale=1000).take_all()
        got = {(r["vec_id"], r["m"]): (r["code"], r["dist"])
               for r in out}
        eq = np.floor(vecs.astype(np.float64) * 1000 + 0.5).astype(
            np.int64)
        cq = np.floor(cb * 1000 + 0.5).astype(np.int64)
        w = 4
        for i in range(len(vecs)):
            for m in range(4):
                s = slice(m * w, (m + 1) * w)
                dist = ((eq[i, s][None, :] - cq[:, s]) ** 2).sum(axis=1)
                code = int(np.argmin(dist))
                assert got[(i, m)] == (code, int(dist[code])), (i, m)
        # codes themselves: vectors 0..3 ARE codewords → dist 0, own id
        for c in range(4):
            for m in range(4):
                assert got[(c, m)] == (c, 0)

    def test_dim_checks_raise(self, ray_session):
        import pytest
        import ray.data

        from smartreader_ray.functions.similarity import pq_encode

        t, vecs = self._data(1)
        with pytest.raises(ValueError, match="not divisible"):
            pq_encode(ray.data.from_arrow(t), vecs[:2].astype(float),
                      n_subspaces=5)
        bad_cb = np.zeros((2, 8))  # codebook dim 8 vs vectors dim 16
        with pytest.raises(Exception, match="codebook"):
            pq_encode(ray.data.from_arrow(t), bad_cb,
                      n_subspaces=4).take_all()


class TestPQADCTopK:
    def test_matches_reference_and_partitioning(self, ray_session):
        import ray.data

        from smartreader_ray.functions.similarity import pq_adc_topk

        rng = np.random.RandomState(7)
        n, d, m, w = 50, 16, 4, 4
        vecs = rng.randn(n, d).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  type=pa.list_(pa.float32())),
        })
        cb = vecs[:3].astype(np.float64)
        qs = vecs[[5, 9]].astype(np.float64)

        eq = np.floor(vecs.astype(np.float64) * 1000 + 0.5).astype(
            np.int64)
        cq = np.floor(cb * 1000 + 0.5).astype(np.int64)
        qq = np.floor(qs * 1000 + 0.5).astype(np.int64)
        exp = []
        for qi in range(2):
            dists = np.zeros(n, dtype=np.int64)
            for mm in range(m):
                s = slice(mm * w, (mm + 1) * w)
                code = np.argmin(
                    ((eq[:, None, s] - cq[None, :, s]) ** 2).sum(-1),
                    axis=1)
                lut = ((qq[qi, None, s] - cq[:, s]) ** 2).sum(-1)
                dists += lut[code]
            order = np.lexsort((np.arange(n), dists))[:6]
            exp.extend((qi, r + 1, int(order[r]), int(dists[order[r]]))
                       for r in range(6))

        for parts in (1, 5):
            out = pq_adc_topk(
                ray.data.from_arrow(t).repartition(parts), cb, qs,
                n_subspaces=m, k=6).take_all()
            got = [(r["query_id"], r["rank"], r["vec_id"], r["dist"])
                   for r in out]
            assert got == exp, parts

    def test_bad_query_shape_raises(self, ray_session):
        import pytest
        import ray.data

        from smartreader_ray.functions.similarity import pq_adc_topk

        t = pa.table({
            "vec_id": pa.array([0], type=pa.int64()),
            "embedding": pa.array([[0.0] * 8],
                                  type=pa.list_(pa.float32())),
        })
        with pytest.raises(ValueError, match="queries must be"):
            pq_adc_topk(ray.data.from_arrow(t), np.zeros((2, 8)),
                        np.zeros(8), n_subspaces=2)


def test_hard_negatives_masks_same_label(ray_session):
    import numpy as np
    import ray.data

    from smartreader_ray.functions import hard_negatives

    # anchor 0 (label 0) is nearly identical to vec 1 (label 0 — must be
    # masked) and close to vec 2 (label 1 — the true hard negative)
    vecs = [
        {"vec_id": 0, "embedding": [1.0, 0.0], "label": 0},
        {"vec_id": 1, "embedding": [0.999, 0.01], "label": 0},
        {"vec_id": 2, "embedding": [0.9, 0.1], "label": 1},
        {"vec_id": 3, "embedding": [0.0, 1.0], "label": 1},
        {"vec_id": 4, "embedding": [-1.0, 0.0], "label": 2},
    ]

    def run(parts):
        ds = ray.data.from_items(vecs).repartition(parts)
        t = hard_negatives(
            ds, np.array([[1.0, 0.0]]), np.array([0]), k=2)
        return list(zip(t.column("vec_id").to_pylist(),
                        t.column("rank").to_pylist()))

    got = run(1)
    assert got == [(2, 1), (3, 2)]      # never vec 1 (same label) / self
    assert got == run(3)                # partitioning invariance
