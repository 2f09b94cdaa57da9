"""Round-4 session operators: mode_by, rollup_agg, retention_cohorts,
resample_daily — unit semantics on crafted inputs (the sf0.01 oracle
gate covers the distributed/SQL parity side)."""

import datetime

import pyarrow as pa


def test_mode_by_tiebreak_and_counts(ray_session):
    import ray.data

    from smartreader_ray.functions.reshape import mode_by

    t = pa.table({
        "source": ["a", "a", "a", "a", "b", "b"],
        "lang": ["en", "fr", "fr", "en", "de", "de"],
    })
    out = mode_by(ray.data.from_arrow(t), "source", "lang").take_all()
    by = {r["source"]: r for r in out}
    # source a: en=2, fr=2 — tie broken to the smaller value 'en'
    assert by["a"]["mode_lang"] == "en"
    assert by["a"]["n_mode"] == 2 and by["a"]["n_rows"] == 4
    assert by["b"]["mode_lang"] == "de" and by["b"]["n_rows"] == 2


def test_mode_by_partitioning_invariance(ray_session):
    import ray.data

    from smartreader_ray.functions.reshape import mode_by

    t = pa.table({
        "source": ["s%d" % (i % 3) for i in range(60)],
        "lang": ["l%d" % (i % 5) for i in range(60)],
    })
    a = mode_by(ray.data.from_arrow(t), "source", "lang").take_all()
    b = mode_by(
        ray.data.from_arrow(t).repartition(7), "source", "lang"
    ).take_all()
    assert a == b


def test_rollup_grains_consistent(ray_session):
    import ray.data

    from smartreader_ray.functions.reshape import rollup_agg

    t = pa.table({
        "f": ["A", "A", "B", "B", "B"],
        "s": ["X", "Y", "X", "X", "Y"],
        "v": [1.01, 2.02, 3.03, 4.04, 5.05],
    })
    out = rollup_agg(ray.data.from_arrow(t).repartition(3),
                     ["f", "s"], ["v"]).take_all()
    rows = {(r["f"], r["s"]): r for r in out}
    # leaf grains
    assert rows[("A", "X")]["sum_v_cents"] == 101
    assert rows[("B", "X")]["sum_v_cents"] == 303 + 404
    # level-1 rollup = sum of its leaves
    assert rows[("A", "(all)")]["sum_v_cents"] == 101 + 202
    assert rows[("A", "(all)")]["n"] == 2
    # grand total
    g = rows[("(all)", "(all)")]
    assert g["sum_v_cents"] == 101 + 202 + 303 + 404 + 505
    assert g["n"] == 5
    # grain count: leaves(4: AX AY BX BY) + level1(2) + total(1)
    assert len(out) == 7


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_retention_cohorts(ray_session):
    import ray.data

    from smartreader_ray.functions.windows import retention_cohorts

    # user 1: first day 1, active days 1,2,4 (two events day 1)
    # user 2: first day 2, active days 2
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
        "ts": pa.array(
            [_ts(1, 3), _ts(1, 9), _ts(2), _ts(4), _ts(2)],
            type=pa.timestamp("us")),
    })
    out = retention_cohorts(ray.data.from_arrow(t).repartition(3)).take_all()
    d1 = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
    got = {(r["cohort_day"], r["offset_days"]): r["n_users"] for r in out}
    assert got == {
        (d1, 0): 1, (d1, 1): 1, (d1, 3): 1,
        (d1 + 1, 0): 1,
    }


def test_resample_daily_zero_fills_gaps(ray_session):
    import ray.data

    from smartreader_ray.functions.windows import resample_daily

    # type 'a' active days 1 and 4; type 'b' only day 2 → both types
    # must be densified over the GLOBAL span [1, 4]
    t = pa.table({
        "event_type": ["a", "a", "a", "b"],
        "ts": pa.array([_ts(1), _ts(1), _ts(4), _ts(2)],
                       type=pa.timestamp("us")),
    })
    out = resample_daily(ray.data.from_arrow(t).repartition(2)).take_all()
    assert len(out) == 8  # 2 types × 4 days
    got = {(r["event_type"], r["day"]): r["n"] for r in out}
    d1 = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
    assert got[("a", d1)] == 2
    assert got[("a", d1 + 1)] == 0 and got[("a", d1 + 2)] == 0
    assert got[("a", d1 + 3)] == 1
    assert got[("b", d1)] == 0 and got[("b", d1 + 1)] == 1


def test_unpivot_inverts_pivot(ray_session):
    import ray.data

    from smartreader_ray.functions.reshape import pivot_counts, unpivot

    t = pa.table({
        "k": ["a", "a", "b", "b", "b"],
        "c": ["x", "y", "x", "x", "z"],
    })
    wide = pivot_counts(ray.data.from_arrow(t).repartition(2),
                        "k", "c", ["x", "y", "z"])
    long = unpivot(wide, "k", ["n_x", "n_y", "n_z"],
                   var_col="variable", val_col="n").take_all()
    got = {(r["k"], r["variable"]): r["n"] for r in long}
    assert got == {
        ("a", "n_x"): 1, ("a", "n_y"): 1, ("a", "n_z"): 0,
        ("b", "n_x"): 2, ("b", "n_y"): 0, ("b", "n_z"): 1,
    }


def test_ewma_decay_exact_fixed_point(ray_session):
    """Q40 EWMA equals the closed-form dyadic sum; missing days decay
    implicitly; result is partitioning-invariant."""
    import datetime as dt

    import numpy as np
    import pyarrow as pa
    import ray.data

    from smartreader_ray.functions.windows import ewma_decay

    base = dt.datetime(2024, 3, 1)
    rows_k, rows_t = [], []
    # key "a": 3 events day0, 1 event day2 (T=day2): ewma = 1*2^40 + 3*2^38
    for _ in range(3):
        rows_k.append("a"); rows_t.append(base)
    rows_k.append("a"); rows_t.append(base + dt.timedelta(days=2))
    # key "b": 2 events on day1 only: gap=1 -> 2*2^39
    for _ in range(2):
        rows_k.append("b"); rows_t.append(base + dt.timedelta(days=1))
    t = pa.table({"event_type": pa.array(rows_k),
                  "ts": pa.array(rows_t, type=pa.timestamp("us"))})
    for parts in (1, 4):
        out = {r["event_type"]: r for r in ewma_decay(
            ray.data.from_arrow(t).repartition(parts)).take_all()}
        assert out["a"]["ewma_q40"] == (1 << 40) + 3 * (1 << 38)
        assert out["a"]["n_events"] == 4 and out["a"]["n_days"] == 2
        assert out["b"]["ewma_q40"] == 2 * (1 << 39)
        assert out["b"]["n_events"] == 2 and out["b"]["n_days"] == 1
