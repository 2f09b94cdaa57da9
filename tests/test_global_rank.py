"""Differential tests for the distributed global-ranking primitive and
its NTILE / Gini consumers (`functions/reshape.py`)."""

import numpy as np
import pyarrow as pa
import pytest


class TestGlobalRank:
    @pytest.mark.parametrize("parts", [3, 16])
    def test_rank_is_argsort_position(self, ray_session, parts):
        import ray.data

        from smartreader_ray.functions.reshape import global_rank

        rng = np.random.default_rng(5)
        v = rng.permutation(2000).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({"__ck": v})).repartition(9)
        got = {r["__ck"]: r["rn"]
               for r in global_rank(ds, "__ck", num_parts=parts).take_all()}
        for key, rn in got.items():
            assert rn == key + 1  # values are a permutation of 0..n-1
        assert len(got) == 2000

    def test_empty(self, ray_session):
        import ray.data

        from smartreader_ray.functions.reshape import global_rank

        ds = ray.data.from_arrow(
            pa.table({"__ck": pa.array([], type=pa.int64())}))
        assert global_rank(ds, "__ck").count() == 0


class TestNtile:
    def test_matches_duckdb_semantics(self, ray_session):
        import duckdb
        import ray.data

        from smartreader_ray.functions.reshape import ntile_summary

        rng = np.random.default_rng(13)
        n = 1003  # deliberately not divisible by k
        t = pa.table({
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            # heavy ties: only ~40 distinct cent values
            "value": pa.array(np.round(rng.integers(0, 40, n) / 4.0, 2)),
        })
        got = ntile_summary(
            ray.data.from_arrow(t).repartition(7), "value", "event_id",
            k=8, num_parts=5)
        want = duckdb.sql("""
            WITH c AS (SELECT event_id,
                       CAST(FLOOR(CAST(value AS DOUBLE)*100+0.5) AS BIGINT)
                           AS cents FROM t),
            b AS (SELECT cents,
                  ntile(8) OVER (ORDER BY cents, event_id) AS bucket FROM c)
            SELECT CAST(bucket AS BIGINT) bucket,
                   CAST(count(*) AS BIGINT) n_rows,
                   CAST(min(cents) AS BIGINT) min_cents,
                   CAST(max(cents) AS BIGINT) max_cents,
                   CAST(sum(cents) AS BIGINT) sum_cents
            FROM b GROUP BY bucket ORDER BY bucket
        """).arrow()
        assert got.to_pandas().equals(want.to_pandas())

    def test_id_overflow_guard(self, ray_session):
        import ray.data

        from smartreader_ray.functions.reshape import ntile_summary

        t = pa.table({
            "event_id": pa.array([2**31], type=pa.int64()),
            "value": pa.array([1.0]),
        })
        with pytest.raises(Exception, match="2\\^31"):
            ntile_summary(ray.data.from_arrow(t), "value", "event_id", k=2)


class TestKeyGini:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from smartreader_ray.functions.reshape import key_gini

        rng = np.random.default_rng(21)
        # skewed keys: key 0 is hot
        keys = np.concatenate([
            np.zeros(500, dtype=np.int64),
            rng.integers(1, 60, size=800).astype(np.int64)])
        ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(6)
        got = key_gini(ds, "k").to_pylist()[0]

        import collections
        cnt = collections.Counter(keys.tolist())
        ranked = sorted(cnt.items(), key=lambda kv: (kv[1], kv[0]))
        n = len(ranked)
        tot = sum(c for _, c in ranked)
        s1 = sum((i + 1) * c for i, (_, c) in enumerate(ranked))
        gini = float(2 * s1 - (n + 1) * tot) / float(n * tot)
        assert got["n_keys"] == n
        assert got["total_rows"] == tot
        assert got["max_count"] == cnt[0] == 500
        assert got["rank_weighted_sum"] == s1
        assert got["gini"] == gini

    def test_uniform_keys_low_gini(self, ray_session):
        import ray.data

        from smartreader_ray.functions.reshape import key_gini

        keys = np.repeat(np.arange(50, dtype=np.int64), 10)
        ds = ray.data.from_arrow(pa.table({"k": keys}))
        got = key_gini(ds, "k").to_pylist()[0]
        assert got["gini"] == 0.0  # perfectly even counts
