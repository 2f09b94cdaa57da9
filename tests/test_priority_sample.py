"""Tests for deterministic weighted priority sampling
(`functions/sampling.py: priority_sample`)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


def _ref_sample(ids, w, k):
    q = [(wi << 40) // (int(hashlib.md5(str(i).encode())
                            .hexdigest()[:10], 16) + 1)
         for i, wi in zip(ids, w)]
    order = sorted(range(len(ids)), key=lambda j: (-q[j], ids[j]))[:k]
    return [(ids[j], w[j], q[j]) for j in order]


class TestPrioritySample:
    def test_matches_reference_and_partition_invariant(self, ray_session):
        import ray.data

        from smartreader_ray.functions.sampling import priority_sample

        rng = np.random.default_rng(17)
        n, k = 2000, 50
        ids = rng.permutation(n).astype(np.int64)
        w = rng.integers(1, 5000, n).astype(np.int64)
        exp = _ref_sample(ids.tolist(), w.tolist(), k)
        t = pa.table({"doc_id": ids, "n_chars": w})
        for parts in (1, 9):
            ds = ray.data.from_arrow(t).repartition(parts)
            got = priority_sample(ds, "n_chars", "doc_id",
                                  k=k).to_pandas()
            assert [(r.doc_id, r.weight, r.priority)
                    for r in got.itertuples(index=False)] == exp

    def test_heavier_rows_oversampled(self, ray_session):
        import ray.data

        from smartreader_ray.functions.sampling import priority_sample

        # 1000 light (w=10) + 1000 heavy (w=1000): the top-200 sample
        # should be overwhelmingly heavy rows.
        n = 1000
        ids = np.arange(2 * n, dtype=np.int64)
        w = np.concatenate([np.full(n, 10), np.full(n, 1000)]).astype(
            np.int64)
        ds = ray.data.from_arrow(pa.table({"doc_id": ids, "n_chars": w}))
        got = priority_sample(ds, "n_chars", "doc_id", k=200).to_pandas()
        heavy = (got["weight"] == 1000).sum()
        assert heavy > 180

    def test_weight_guard(self, ray_session):
        import ray.data

        from smartreader_ray.functions.sampling import priority_sample

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1], type=pa.int64()),
            "n_chars": pa.array([1 << 21], type=pa.int64())}))
        with pytest.raises(Exception, match="2\\^20"):
            priority_sample(ds, "n_chars", "doc_id", k=5).materialize()
