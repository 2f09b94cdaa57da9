"""Tests for ohlc_bars (`functions/windows.py`) and union_by_name
(`functions/setops.py`)."""

import numpy as np
import pyarrow as pa
import pytest


class TestOhlcBars:
    def test_hand_case_with_ties(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import ohlc_bars

        base = np.datetime64("2024-01-01T00:00:00", "us")
        # window 0: values 5, 1, 9 at t=0,10,20 -> open 500, close 900
        # plus TWO events at the same t=30 with values 2 and 7: the
        # composite breaks the tie deterministically (close = min cents
        # at the tied max ts ... comp packs cents low, so max(comp)
        # picks the HIGHER cents at a tied ts)
        t = pa.table({
            "k": pa.array(["a"] * 5),
            "ts": pa.array([base, base + np.timedelta64(10, "s"),
                            base + np.timedelta64(20, "s"),
                            base + np.timedelta64(30, "s"),
                            base + np.timedelta64(30, "s")]),
            "v": pa.array([5.0, 1.0, 9.0, 2.0, 7.0]),
        })
        got = ohlc_bars(ray.data.from_arrow(t).repartition(3),
                        key_col="k", ts_col="ts", value_col="v",
                        width_s=60).to_pandas()
        assert len(got) == 1
        row = got.iloc[0]
        assert row["open_cents"] == 500
        assert row["high_cents"] == 900
        assert row["low_cents"] == 100
        assert row["close_cents"] == 700  # higher cents wins the tie
        assert row["n"] == 5

    def test_partition_invariance(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import ohlc_bars

        rng = np.random.default_rng(59)
        n = 3000
        base = np.datetime64("2024-01-01", "us")
        t = pa.table({
            "k": pa.array(np.array(["x", "y"])[rng.integers(0, 2, n)]),
            "ts": pa.array([base + np.timedelta64(int(o), "ms")
                            for o in rng.choice(10**7, n, replace=False)]),
            "v": pa.array(rng.uniform(0, 100, n)),
        })
        a = ohlc_bars(ray.data.from_arrow(t), "k", "ts", "v",
                      width_s=600).to_pandas()
        b = ohlc_bars(ray.data.from_arrow(t).repartition(7), "k",
                      "ts", "v", width_s=600).to_pandas()
        assert a.equals(b)

    def test_value_range_guard(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import ohlc_bars

        t = pa.table({
            "k": ["a"],
            "ts": pa.array([np.datetime64("2024-01-01", "us")]),
            "v": [2.0e18],
        })
        with pytest.raises(Exception, match="packing range"):
            ohlc_bars(ray.data.from_arrow(t), "k", "ts",
                      "v").to_pandas()


class TestUnionByName:
    def test_null_fill_and_order(self, ray_session):
        import ray.data

        from smartreader_ray.functions.setops import union_by_name

        a = ray.data.from_arrow(pa.table({
            "id": pa.array([1, 2], type=pa.int64()),
            "x": pa.array([1.0, 2.0]),
        }))
        b = ray.data.from_arrow(pa.table({
            "y": pa.array(["p", "q"]),
            "id": pa.array([3, 4], type=pa.int64()),
        }))
        got = union_by_name([a, b]).sort("id").to_pandas()
        assert list(got.columns) == ["id", "x", "y"]  # first-seen order
        assert got["x"].isna().tolist() == [False, False, True, True]
        assert got["y"].isna().tolist() == [True, True, False, False]

    def test_type_conflict_raises(self, ray_session):
        import ray.data

        from smartreader_ray.functions.setops import union_by_name

        a = ray.data.from_arrow(pa.table(
            {"id": pa.array([1], type=pa.int64())}))
        b = ray.data.from_arrow(pa.table(
            {"id": pa.array(["s"], type=pa.string())}))
        with pytest.raises(ValueError, match="conflicting types"):
            union_by_name([a, b])

    def test_empty_list_raises(self, ray_session):
        from smartreader_ray.functions.setops import union_by_name

        with pytest.raises(ValueError):
            union_by_name([])
