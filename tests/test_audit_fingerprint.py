"""Tests for the data-quality audit (`functions/audit.py`) and the
order-independent table fingerprint (`functions/setops.py`)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

_P = (1 << 61) - 1


class TestDqReport:
    def _orders(self):
        return pa.table({
            "k": pa.array([1, 2, 2, 3, 4, 5], type=pa.int64()),
            "ck": pa.array([10, 20, None, 30, 99, 10], type=pa.int64()),
            "price": pa.array([5.0, -1.0, 3.0, None, 2.0, 0.0]),
            "status": pa.array(["O", "F", "X", "P", "O", None]),
        })

    def test_all_rules(self, ray_session):
        import ray.data

        from smartreader_ray.functions.audit import (ForeignKey,
                                                     GreaterThan, InSet,
                                                     NotNull, Unique,
                                                     dq_report)

        ds = ray.data.from_arrow(self._orders()).repartition(3)
        ref = ray.data.from_arrow(pa.table(
            {"rk": pa.array([10, 20, 30], type=pa.int64())}))
        rules = [
            NotNull("ck", name="nn"),
            GreaterThan("price", 0.0, name="gt"),
            InSet("status", ("O", "F", "P"), name="ins"),
            Unique("k", name="uq"),
            ForeignKey("ck", ref_col="rk", name="fk"),
        ]
        rep = dq_report(ds, rules, fk_refs={"fk": ref})
        got = {r["rule"]: (r["n_violations"], r["n_checked"])
               for r in rep.to_pylist()}
        assert got["nn"] == (1, 6)       # one null ck
        assert got["gt"] == (3, 6)       # -1, None, 0.0
        assert got["ins"] == (2, 6)      # X and None
        assert got["uq"] == (1, 6)       # k=2 twice
        assert got["fk"] == (1, 5)       # 99 orphan, 5 non-null checked

    def test_unknown_rule_raises(self, ray_session):
        from smartreader_ray.functions.audit import dq_report

        with pytest.raises(ValueError, match="unknown rule"):
            dq_report(None, [object()])


def _fp_ref(rows, key_idx, cols_idx):
    """Driver reference: per-group (sum mod P, xor, n) over md5 hashes."""
    acc = {}
    for row in rows:
        h = int(hashlib.md5("|".join(str(row[i]) for i in cols_idx)
                            .encode()).hexdigest()[:15], 16)
        g = row[key_idx]
        s, x, n = acc.get(g, (0, 0, 0))
        acc[g] = ((s + h) % _P, x ^ h, n + 1)
    return acc


class TestTableFingerprint:
    def test_matches_reference_and_partition_invariant(self, ray_session):
        import ray.data

        from smartreader_ray.functions.setops import table_fingerprint

        rng = np.random.default_rng(3)
        n = 500
        t = pa.table({
            "g": pa.array([f"g{v}" for v in rng.integers(0, 4, n)]),
            "a": pa.array(rng.integers(0, 1000, n), type=pa.int64()),
            "b": pa.array([f"s{v}" for v in rng.integers(0, 50, n)]),
        })
        rows = list(zip(t["g"].to_pylist(), t["a"].to_pylist(),
                        t["b"].to_pylist()))
        exp = _fp_ref(rows, 0, (1, 2))

        for parts in (1, 7):
            ds = ray.data.from_arrow(t).repartition(parts)
            got = table_fingerprint(ds, "g", ["a", "b"]).to_pandas()
            assert len(got) == len(exp)
            for r in got.itertuples(index=False):
                s, x, cnt = exp[r.g]
                assert (r.sum_fp, r.xor_fp, r.n_rows) == (s, x, cnt)

    def test_detects_single_value_change(self, ray_session):
        import ray.data

        from smartreader_ray.functions.setops import table_fingerprint

        base = pa.table({"g": ["a"] * 10,
                         "v": pa.array(range(10), type=pa.int64())})
        mut = pa.table({"g": ["a"] * 10,
                        "v": pa.array([*range(9), 99], type=pa.int64())})
        f1 = table_fingerprint(ray.data.from_arrow(base), "g",
                               ["v"]).to_pandas()
        f2 = table_fingerprint(ray.data.from_arrow(mut), "g",
                               ["v"]).to_pandas()
        assert f1.loc[0, "n_rows"] == f2.loc[0, "n_rows"]
        assert f1.loc[0, "sum_fp"] != f2.loc[0, "sum_fp"]
        assert f1.loc[0, "xor_fp"] != f2.loc[0, "xor_fp"]
