"""interval_window_overlap: bucket-binned interval x window join."""

import datetime

import pyarrow as pa


def test_interval_overlap_matches_bruteforce(ray_session):
    import ray.data

    from smartreader_ray.functions.windows import interval_window_overlap

    def ts(day, hour, minute=0):
        return datetime.datetime(2024, 1, day, hour, minute)

    # user 1 day 1: 01:30–13:10 → windows 00:00, 06:00, 12:00
    # user 2 day 1: 05:00–05:10 → window 00:00
    # user 1 day 2: 23:00–23:30 → window 18:00
    t = pa.table({
        "user_id": pa.array([1, 1, 2, 2, 1, 1], type=pa.int64()),
        "ts": pa.array(
            [ts(1, 1, 30), ts(1, 13, 10), ts(1, 5), ts(1, 5, 10),
             ts(2, 23), ts(2, 23, 30)],
            type=pa.timestamp("us")),
    })
    out = interval_window_overlap(
        ray.data.from_arrow(t).repartition(3), window_s=21_600).take_all()

    def us(day, hour):
        return int(datetime.datetime(2024, 1, day, hour).timestamp()
                   * 1_000_000)

    got = {r["window_us"]: r["n_intervals"] for r in out}
    assert got == {
        us(1, 0): 2,   # user1-day1 + user2-day1
        us(1, 6): 1,
        us(1, 12): 1,
        us(2, 18): 1,
    }


def test_interval_overlap_partitioning_invariant(ray_session):
    import datetime

    import numpy as np
    import ray.data

    from smartreader_ray.functions.windows import interval_window_overlap

    rng = np.random.default_rng(6)
    n = 400
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 12, n), type=pa.int64()),
        "ts": pa.array(
            [datetime.datetime(2024, 1, 1)
             + datetime.timedelta(seconds=int(s))
             for s in rng.integers(0, 5 * 86_400, n)],
            type=pa.timestamp("us")),
    })
    a = interval_window_overlap(
        ray.data.from_arrow(t).repartition(2)).take_all()
    b = interval_window_overlap(
        ray.data.from_arrow(t).repartition(9)).take_all()
    assert a == b
