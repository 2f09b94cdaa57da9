"""Tests for cusum_changepoints (`functions/windows.py`),
weighted_median_by (`functions/sketch.py`) and largest_remainder_alloc
(`functions/reshape.py`)."""

import numpy as np
import pyarrow as pa
import pytest


def _ref_cusum(cents, k, h):
    """Page's recursion, literal form — the reflection identity the
    vectorized kernel uses must reproduce it exactly."""
    s, alarms, first, mx = 0, 0, None, 0
    out = []
    for i, c in enumerate(cents):
        s_prev = s
        s = max(0, s + (c - k))
        mx = max(mx, s)
        if s_prev < h <= s:
            alarms += 1
            if first is None:
                first = i
    return mx, alarms, first


class TestCusum:
    def test_matches_recursion(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import cusum_changepoints

        rng = np.random.default_rng(41)
        n = 500
        base = np.datetime64("2024-01-01", "us")
        vals = rng.uniform(0, 40, n)
        t = pa.table({
            "user_id": pa.array(rng.integers(0, 8, n), type=pa.int64()),
            "ts": pa.array([base + np.timedelta64(i * 1000, "us")
                            for i in range(n)]),
            "value": pa.array(vals),
        })
        got = cusum_changepoints(
            ray.data.from_arrow(t).repartition(4),
            allowance_cents=50, threshold_cents=3000,
        ).to_pandas().set_index("user_id")

        users = t.column("user_id").to_numpy(zero_copy_only=False)
        cents_all = np.floor(vals * 100 + 0.5).astype(np.int64)
        for u in np.unique(users):
            cents = cents_all[users == u]
            k = int(cents.sum()) // len(cents) + 50
            mx, alarms, _ = _ref_cusum(cents.tolist(), k, 3000)
            row = got.loc[u]
            assert row["max_cusum"] == mx
            assert row["n_alarms"] == alarms
            assert row["n_events"] == len(cents)

    def test_no_alarm_sentinel(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import cusum_changepoints

        base = np.datetime64("2024-01-01", "us")
        t = pa.table({
            "user_id": pa.array([1, 1, 1], type=pa.int64()),
            "ts": pa.array([base + np.timedelta64(i, "s")
                            for i in range(3)]),
            "value": pa.array([1.0, 1.0, 1.0]),
        })
        got = cusum_changepoints(
            ray.data.from_arrow(t), threshold_cents=10**9).to_pandas()
        assert got["n_alarms"].iloc[0] == 0
        assert got["first_alarm_us"].iloc[0] == -1


class TestWeightedMedian:
    def test_hand_case(self, ray_session):
        import ray.data

        from smartreader_ray.functions.sketch import weighted_median_by

        # key a: values 1(w1), 2(w1), 100(w10) -> total 12, crossing at
        # cum 6 -> 100. Unweighted median would be 2.
        t = pa.table({
            "k": pa.array(["a", "a", "a"]),
            "v": pa.array([1.0, 2.0, 100.0]),
            "w": pa.array([1.0, 1.0, 10.0]),
        })
        got = weighted_median_by(
            ray.data.from_arrow(t), "k", "v", "w").to_pandas()
        assert got["wmedian"].iloc[0] == 100.0
        assert got["total_weight"].iloc[0] == 12

    def test_matches_numpy_reference(self, ray_session):
        import ray.data

        from smartreader_ray.functions.sketch import weighted_median_by

        rng = np.random.default_rng(43)
        n = 2000
        keys = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
        v = rng.integers(0, 50, n).astype(np.float64)
        w = rng.integers(1, 9, n).astype(np.float64)
        t = pa.table({"k": keys, "v": v, "w": w})
        got = weighted_median_by(
            ray.data.from_arrow(t).repartition(7), "k", "v", "w",
        ).to_pandas().set_index("k")
        for key in "xyz":
            m = keys == key
            uv = np.unique(v[m])
            uw = np.array([w[m][v[m] == x].sum() for x in uv],
                          dtype=np.int64)
            cum = np.cumsum(uw)
            expect = uv[np.searchsorted(2 * cum, cum[-1], side="left")]
            assert got.loc[key, "wmedian"] == expect
            assert got.loc[key, "total_weight"] == cum[-1]


class TestLargestRemainder:
    def test_sums_to_total_and_hand_case(self, ray_session):
        import ray.data

        from smartreader_ray.functions.reshape import (
            largest_remainder_alloc)

        # weights 1.00 / 1.00 / 1.00 cents over 10 units: base 3 each,
        # leftover 1 goes to the smallest key (all remainders tie)
        t = pa.table({
            "k": pa.array(["a", "b", "c"]),
            "w": pa.array([1.0, 1.0, 1.0]),
        })
        got = largest_remainder_alloc(
            ray.data.from_arrow(t), "k", "w", total_units=10).to_pandas()
        assert got["alloc"].sum() == 10
        assert got.set_index("k")["alloc"].to_dict() == {
            "a": 4, "b": 3, "c": 3}

    def test_partition_invariance(self, ray_session):
        import ray.data

        from smartreader_ray.functions.reshape import (
            largest_remainder_alloc)

        rng = np.random.default_rng(47)
        n = 3000
        t = pa.table({
            "k": pa.array([f"k{i}" for i in rng.integers(0, 37, n)]),
            "w": pa.array(rng.uniform(0, 100, n)),
        })
        a = largest_remainder_alloc(
            ray.data.from_arrow(t), "k", "w").to_pandas()
        b = largest_remainder_alloc(
            ray.data.from_arrow(t).repartition(9), "k", "w").to_pandas()
        assert a.equals(b)
        assert a["alloc"].sum() == 1_000_000

    def test_overflow_guard(self, ray_session):
        import ray.data

        from smartreader_ray.functions.reshape import (
            largest_remainder_alloc)

        t = pa.table({"k": ["a"], "w": [4.0e16]})
        # the OverflowError crosses the task boundary wrapped in
        # RayTaskError; match on its message
        with pytest.raises(Exception, match="int64-exact range"):
            largest_remainder_alloc(
                ray.data.from_arrow(t), "k", "w",
                total_units=10**9).to_pandas()
