"""Tests for star_revenue_by_nation (`functions/join.py`) and
psi_drift (`functions/audit.py`)."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _fixture():
    """Tiny star schema with a known answer. Nations 0/1; customer 0 in
    nation 0, customer 1 in nation 1; suppliers mirror. Only line items
    whose order passes the date filter AND whose customer/supplier
    nations agree may count."""
    base = np.datetime64("2000-01-01", "us")
    orders = pa.table({
        "o_orderkey": pa.array([0, 1, 2], type=pa.int64()),
        "o_custkey": pa.array([0, 1, 0], type=pa.int64()),
        "o_orderdate": pa.array([base, base,
                                 base - np.timedelta64(10, "D")]),
    })
    customer = pa.table({
        "c_custkey": pa.array([0, 1], type=pa.int64()),
        "c_nationkey": pa.array([0, 1], type=pa.int64()),
    })
    supplier = pa.table({
        "s_suppkey": pa.array([0, 1], type=pa.int64()),
        "s_nationkey": pa.array([0, 1], type=pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([0, 1], type=pa.int64()),
        "n_name": pa.array(["ALPHA", "BETA"]),
    })
    # li0: order0/supp0 -> nations agree (0) -> 1000c * (100-10) = 90000
    # li1: order0/supp1 -> nations differ -> dropped
    # li2: order1/supp1 -> agree (1) -> 500c * 100 = 50000
    # li3: order2/supp0 -> date-filtered order -> dropped
    lineitem = pa.table({
        "l_orderkey": pa.array([0, 0, 1, 2], type=pa.int64()),
        "l_suppkey": pa.array([0, 1, 1, 0], type=pa.int64()),
        "l_extendedprice": pa.array([10.0, 7.0, 5.0, 9.0]),
        "l_discount": pa.array([0.10, 0.0, 0.0, 0.0]),
    })
    return lineitem, orders, customer, supplier, nation


class TestStarRevenue:
    def test_hand_case(self, ray_session):
        import ray.data

        from smartreader_ray.functions.join import star_revenue_by_nation

        li, orders, customer, supplier, nation = _fixture()
        date_from = int(np.datetime64("2000-01-01", "us")
                        .astype(np.int64))
        got = star_revenue_by_nation(
            ray.data.from_arrow(li).repartition(3), orders, customer,
            supplier, nation, date_from).to_pandas()
        assert got.set_index("n_name")["revenue_cc"].to_dict() == {
            "ALPHA": 90000, "BETA": 50000}

    def test_partition_invariance(self, ray_session):
        import ray.data

        from smartreader_ray.functions.join import star_revenue_by_nation

        li, orders, customer, supplier, nation = _fixture()
        date_from = int(np.datetime64("1990-01-01", "us")
                        .astype(np.int64))
        a = star_revenue_by_nation(
            ray.data.from_arrow(li), orders, customer, supplier,
            nation, date_from).to_pandas()
        b = star_revenue_by_nation(
            ray.data.from_arrow(li).repartition(4), orders, customer,
            supplier, nation, date_from).to_pandas()
        assert a.equals(b)


class TestPsiDrift:
    def test_hand_counts_and_terms(self, ray_session):
        import ray.data

        from smartreader_ray.functions.audit import psi_drift

        # baseline 'a': values in bins 0,0,1; group 'b': bins 1,1
        t = pa.table({
            "src": pa.array(["a", "a", "a", "b", "b"]),
            "v": pa.array([1.0, 2.0, 70.0, 65.0, 66.0]),
        })
        got = psi_drift(ray.data.from_arrow(t).repartition(2), "src",
                        "v", baseline="a", nbins=2,
                        bin_width=64.0).to_pandas()
        assert got["group"].tolist() == ["b", "b"]
        assert got["expected_n"].tolist() == [2, 1]
        assert got["actual_n"].tolist() == [0, 2]
        p0, q0 = (2 + 1) / (3 + 2), (0 + 1) / (2 + 2)
        assert got["psi_term"].iloc[0] == (q0 - p0) * math.log(q0 / p0)

    def test_missing_baseline_raises(self, ray_session):
        import ray.data

        from smartreader_ray.functions.audit import psi_drift

        t = pa.table({"src": ["b"], "v": [1.0]})
        with pytest.raises(Exception, match="baseline"):
            psi_drift(ray.data.from_arrow(t), "src", "v",
                      baseline="a").to_pandas()

    def test_partition_invariance(self, ray_session):
        import ray.data

        from smartreader_ray.functions.audit import psi_drift

        rng = np.random.default_rng(53)
        n = 4000
        t = pa.table({
            "src": pa.array(np.array(["a", "b", "c"])[
                rng.integers(0, 3, n)]),
            "v": pa.array(rng.uniform(0, 1200, n)),
        })
        a = psi_drift(ray.data.from_arrow(t), "src", "v",
                      baseline="a").to_pandas()
        b = psi_drift(ray.data.from_arrow(t).repartition(9), "src",
                      "v", baseline="a").to_pandas()
        assert a.equals(b)
