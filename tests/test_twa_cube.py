"""Tests for time_weighted_avg (`functions/windows.py`) and
cube_counts (`functions/reshape.py`)."""

import numpy as np
import pyarrow as pa


class TestTimeWeightedAvg:
    def test_matches_hand_computation(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import time_weighted_avg

        # user 1: v=2.00 held 10 s, v=4.00 held 30 s, final event ignored
        # user 2: single event -> dropped
        # user 3: two events same microsecond -> active 0 -> dropped
        base = np.datetime64("2024-01-01T00:00:00", "us")
        t = pa.table({
            "user_id": pa.array([1, 1, 1, 2, 3, 3], type=pa.int64()),
            "ts": pa.array([
                base, base + np.timedelta64(10_000_000, "us"),
                base + np.timedelta64(40_000_000, "us"),
                base, base, base]),
            "value": pa.array([2.0, 4.0, 9.0, 5.0, 1.0, 2.0]),
        })
        ds = ray.data.from_arrow(t).repartition(3)
        got = time_weighted_avg(ds).to_pandas().set_index("user_id")
        assert list(got.index) == [1]
        row = got.loc[1]
        # weighted = 200*10 + 400*30 = 14000 cents*s over 40 s
        assert row["n_events"] == 3
        assert row["active_s"] == 40
        assert row["weighted_cents_s"] == 14000
        assert row["twa_centicents"] == 14000 * 100 // 40  # 350.00 c

    def test_order_and_partition_invariance(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import time_weighted_avg

        rng = np.random.default_rng(29)
        n = 600
        base = np.datetime64("2024-01-01", "us")
        offs = rng.choice(10**7, size=n, replace=False)
        t = pa.table({
            "user_id": pa.array(rng.integers(0, 20, n), type=pa.int64()),
            "ts": pa.array([base + np.timedelta64(int(o) * 1000, "us")
                            for o in offs]),
            "value": pa.array(rng.uniform(0, 50, n)),
        })
        a = time_weighted_avg(ray.data.from_arrow(t)).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        perm = rng.permutation(n)
        b = time_weighted_avg(
            ray.data.from_arrow(t.take(perm)).repartition(7)
        ).to_pandas().sort_values("user_id").reset_index(drop=True)
        assert a.equals(b)


class TestCubeCounts:
    def test_matches_pandas_cube(self, ray_session):
        import ray.data

        from smartreader_ray.functions.reshape import cube_counts

        rng = np.random.default_rng(31)
        n = 800
        a = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
        b = np.array(["p", "q"])[rng.integers(0, 2, n)]
        v = rng.uniform(0, 100, n)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        t = pa.table({"a": a, "b": b, "v": v})
        ds = ray.data.from_arrow(t).repartition(5)
        got = cube_counts(ds, "a", "b", "v").to_pandas()

        import pandas as pd
        df = pd.DataFrame({"a": a, "b": b, "c": cents})
        frames = []
        for ga, gb in ((["a", "b"], None), (["a"], "b"),
                       (["b"], "a"), (None, None)):
            if ga is None:
                frames.append(pd.DataFrame(
                    {"a": ["ALL"], "b": ["ALL"], "n": [n],
                     "value_cents": [cents.sum()]}))
            else:
                g = df.groupby(ga, as_index=False).agg(
                    n=("c", "size"), value_cents=("c", "sum"))
                if gb:
                    g[gb] = "ALL"
                frames.append(g[["a", "b", "n", "value_cents"]])
        exp = (pd.concat(frames).sort_values(["a", "b"])
               .reset_index(drop=True))
        got = got.sort_values(["a", "b"]).reset_index(drop=True)
        assert len(got) == len(exp)
        for col in ("a", "b", "n", "value_cents"):
            assert (got[col].to_numpy() == exp[col].to_numpy()).all()

    def test_total_row_consistency(self, ray_session):
        import ray.data

        from smartreader_ray.functions.reshape import cube_counts

        t = pa.table({"a": ["x", "x", "y"], "b": ["p", "q", "p"],
                      "v": [1.0, 2.0, 3.0]})
        got = cube_counts(ray.data.from_arrow(t), "a", "b",
                          "v").to_pandas()
        total = got[(got["a"] == "ALL") & (got["b"] == "ALL")]
        assert total["n"].iloc[0] == 3
        assert total["value_cents"].iloc[0] == 600
        # each grouping set partitions the rows: counts add up
        for sel in ((got["a"] != "ALL") & (got["b"] != "ALL"),
                    (got["a"] != "ALL") & (got["b"] == "ALL"),
                    (got["a"] == "ALL") & (got["b"] != "ALL")):
            assert got[sel]["n"].sum() == 3
