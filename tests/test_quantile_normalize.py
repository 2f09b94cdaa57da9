"""Tests for quantile_normalize_by (`functions/standardize.py`)."""

import numpy as np
import pyarrow as pa
import pytest


class TestQuantileNormalize:
    def test_baseline_identity_and_hand_case(self, ray_session):
        import ray.data

        from smartreader_ray.functions.standardize import (
            quantile_normalize_by)

        # baseline a: 10,20,30,40 ; group b: 1,2 -> rank 1/2 maps to the
        # smallest a-value with cum >= 2/4 (=20), rank 2/2 -> 40
        t = pa.table({
            "g": pa.array(["a", "a", "a", "a", "b", "b"]),
            "v": pa.array([10.0, 20.0, 30.0, 40.0, 1.0, 2.0]),
        })
        got = quantile_normalize_by(
            ray.data.from_arrow(t), "g", "v",
            baseline="a").to_pandas().set_index(["g", "v"])
        assert got.loc[("b", 1.0), "normalized"] == 20.0
        assert got.loc[("b", 2.0), "normalized"] == 40.0
        # baseline maps onto itself exactly
        for v in (10.0, 20.0, 30.0, 40.0):
            assert got.loc[("a", v), "normalized"] == v

    def test_distribution_transfer(self, ray_session):
        import ray.data

        from smartreader_ray.functions.standardize import (
            quantile_normalize_by)

        rng = np.random.default_rng(83)
        a = rng.normal(100, 10, 1000).round(1)
        b = rng.normal(500, 50, 800).round(1)  # shifted+scaled group
        t = pa.table({
            "g": pa.array(["a"] * 1000 + ["b"] * 800),
            "v": pa.array(np.concatenate([a, b])),
        })
        got = quantile_normalize_by(
            ray.data.from_arrow(t).repartition(6), "g", "v",
            baseline="a").to_pandas()
        gb = got[got["g"] == "b"]
        # normalized values are baseline DATA values
        assert set(gb["normalized"]).issubset(set(a))
        # mapping is monotone in v
        assert (np.diff(gb.sort_values("v")["normalized"]) >= 0).all()

    def test_missing_baseline_raises(self, ray_session):
        import ray.data

        from smartreader_ray.functions.standardize import (
            quantile_normalize_by)

        t = pa.table({"g": ["b"], "v": [1.0]})
        with pytest.raises(Exception, match="baseline"):
            quantile_normalize_by(ray.data.from_arrow(t), "g", "v",
                                  baseline="a").to_pandas()
