"""table_diff (snapshot CDC) and skyline (2-D Pareto front) semantics."""

import numpy as np
import pyarrow as pa
import pytest


def test_table_diff_classifies(ray_session):
    import ray.data

    from smartreader_ray.functions.setops import table_diff

    left = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": ["a", "b", "c", "d"],
    })
    right = pa.table({
        "doc_id": pa.array([2, 3, 4, 5], type=pa.int64()),
        "text": ["b", "c CHANGED", "d", "e"],
    })
    out = table_diff(ray.data.from_arrow(left).repartition(2),
                     ray.data.from_arrow(right).repartition(3)).take_all()
    got = {(r["doc_id"], r["status"]) for r in out}
    # 1 removed, 3 changed, 5 added; 2 and 4 identical → absent
    assert got == {(1, "removed"), (3, "changed"), (5, "added")}


def test_table_diff_rejects_duplicate_keys(ray_session):
    import ray.data

    from smartreader_ray.functions.setops import table_diff

    left = pa.table({
        "doc_id": pa.array([1, 1], type=pa.int64()),
        "text": ["a", "b"],
    })
    right = pa.table({
        "doc_id": pa.array([2], type=pa.int64()),
        "text": ["c"],
    })
    with pytest.raises(Exception, match="duplicate key"):
        table_diff(ray.data.from_arrow(left),
                   ray.data.from_arrow(right)).take_all()


def _brute_skyline(x, y):
    keep = []
    for i in range(len(x)):
        dominated = False
        for j in range(len(x)):
            if (x[j] >= x[i] and y[j] >= y[i]
                    and (x[j] > x[i] or y[j] > y[i])):
                dominated = True
                break
        if not dominated:
            keep.append(i)
    return set(keep)


def test_skyline_matches_bruteforce(ray_session):
    import ray.data

    from smartreader_ray.functions.topk import skyline

    rng = np.random.default_rng(7)
    n = 400
    x = rng.integers(0, 50, n).astype(np.float64)
    y = rng.integers(0, 50, n).astype(np.int64)
    t = pa.table({
        "rid": pa.array(np.arange(n), type=pa.int64()),
        "x": pa.array(x), "y": pa.array(y),
    })
    out = skyline(ray.data.from_arrow(t).repartition(5),
                  "x", "y").take_all()
    got = {r["rid"] for r in out}
    assert got == _brute_skyline(x, y)


def test_skyline_keeps_equal_points_and_is_partition_invariant(ray_session):
    import ray.data

    from smartreader_ray.functions.topk import skyline

    # two identical frontier points — neither dominates the other
    t = pa.table({
        "rid": pa.array([0, 1, 2], type=pa.int64()),
        "x": pa.array([5.0, 5.0, 1.0]),
        "y": pa.array([9, 9, 1], type=pa.int64()),
    })
    out = sorted(r["rid"] for r in
                 skyline(ray.data.from_arrow(t), "x", "y").take_all())
    assert out == [0, 1]

    rng = np.random.default_rng(11)
    big = pa.table({
        "rid": pa.array(np.arange(300), type=pa.int64()),
        "x": pa.array(rng.integers(0, 20, 300).astype(np.float64)),
        "y": pa.array(rng.integers(0, 20, 300), type=pa.int64()),
    })
    a = sorted(r["rid"] for r in skyline(
        ray.data.from_arrow(big).repartition(2), "x", "y").take_all())
    b = sorted(r["rid"] for r in skyline(
        ray.data.from_arrow(big).repartition(9), "x", "y").take_all())
    assert a == b
