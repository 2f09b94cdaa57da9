"""Differential tests for markov_transitions / session_attribution /
rolling_anomaly against brute-force pure-Python references on a small
seeded event stream (ties, singleton users, empty-window edges)."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _mk_events(seed=7, n=400, users=12, types=("view", "click",
                                               "purchase", "error")):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 10_000_000, size=n)) * 1_000_000
    return pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(0, users, size=n),
                            type=pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "event_type": pa.array(rng.choice(types, size=n)),
        "value": pa.array(np.round(rng.uniform(0, 300, size=n), 2)),
    })


def _rows(t):
    return list(zip(*[t.column(c).to_pylist() for c in t.column_names]))


class TestMarkov:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import markov_transitions

        t = _mk_events()
        got = markov_transitions(ray.data.from_arrow(t).repartition(7))

        seq = {}
        for eid, uid, ts, et, _v in _rows(t):
            seq.setdefault(uid, []).append((ts, eid, et))
        counts = {}
        for uid, evs in seq.items():
            evs.sort()
            for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        tots = {}
        for (a, _b), n in counts.items():
            tots[a] = tots.get(a, 0) + n

        assert got.num_rows == len(counts)
        for prev, curr, n, p in _rows(got):
            assert counts[(prev, curr)] == n
            assert p == n / tots[prev]  # bit-equal single division
        # probabilities per prev row-normalize to ~1
        by_prev = {}
        for prev, _c, _n, p in _rows(got):
            by_prev[prev] = by_prev.get(prev, 0.0) + p
        for s in by_prev.values():
            assert math.isclose(s, 1.0, rel_tol=1e-12)

    def test_singleton_user_emits_nothing(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import markov_transitions

        t = pa.table({
            "event_id": pa.array([1], type=pa.int64()),
            "user_id": pa.array([5], type=pa.int64()),
            "ts": pa.array(np.array([0], dtype="datetime64[us]")),
            "event_type": pa.array(["view"]),
        })
        got = markov_transitions(ray.data.from_arrow(t))
        assert got.num_rows == 0


class TestAttribution:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import session_attribution

        t = _mk_events(seed=11, n=500)
        gap_s = 1800.0
        got = session_attribution(
            ray.data.from_arrow(t).repartition(5), gap_s=gap_s)

        seq = {}
        for eid, uid, ts, et, v in _rows(t):
            seq.setdefault(uid, []).append((ts, eid, et, v))
        agg = {}
        for uid, evs in seq.items():
            evs.sort()
            sessions = []
            for ev in evs:
                if (not sessions or (ev[0] - sessions[-1][-1][0])
                        .total_seconds() > gap_s):
                    sessions.append([ev])
                else:
                    sessions[-1].append(ev)
            for s in sessions:
                ft = s[0][2]
                a = agg.setdefault(ft, [0, 0, 0])
                a[0] += 1
                conv = [ev for ev in s if ev[2] == "purchase"]
                if conv:
                    a[1] += 1
                    a[2] += sum(
                        int(math.floor(ev[3] * 100 + 0.5)) for ev in conv)

        assert {r[0]: tuple(r[1:]) for r in _rows(got)} == {
            k: tuple(v) for k, v in agg.items()}


class TestRollingAnomaly:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import rolling_anomaly

        t = _mk_events(seed=3, n=600, users=9)
        k, factor = 4, 2
        got = rolling_anomaly(
            ray.data.from_arrow(t).repartition(6), k=k, factor=factor)

        seq = {}
        for eid, uid, ts, _et, v in _rows(t):
            seq.setdefault(uid, []).append((ts, eid, v))
        want = set()
        for uid, evs in seq.items():
            evs.sort()
            cents = [int(math.floor(v * 100 + 0.5)) for _, _, v in evs]
            for i in range(k, len(evs)):
                trail = sum(cents[i - k:i])
                if cents[i] * k > factor * trail:
                    want.add((uid, evs[i][1], cents[i], trail))
        rows = {(r["user_id"], r["event_id"], r["cents"], r["trail_sum"])
                for r in got.take_all()}
        assert rows == want
        assert len(rows) > 0  # the seed produces anomalies

    def test_short_user_no_rows(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import rolling_anomaly

        t = pa.table({
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "user_id": pa.array([1, 1, 1], type=pa.int64()),
            "ts": pa.array(np.array([0, 1, 2], dtype="datetime64[us]")),
            "value": pa.array([1.0, 2.0, 300.0]),
        })
        assert rolling_anomaly(
            ray.data.from_arrow(t), k=4).count() == 0


class TestIntervalUnion:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import interval_union

        t = _mk_events(seed=23, n=400, users=7)
        span_us = 300 * 1_000_000
        got = {r["user_id"]: (r["n_islands"], r["covered_us"])
               for r in interval_union(
                   ray.data.from_arrow(t).repartition(5),
                   span_s=300.0).take_all()}

        seq = {}
        for _eid, uid, ts, _et, _v in _rows(t):
            us = int(ts.timestamp() * 1e6) if hasattr(ts, "timestamp") \
                else int(np.datetime64(ts, "us").astype(np.int64))
            seq.setdefault(uid, []).append(us)
        for uid, starts in seq.items():
            starts.sort()
            islands = []
            for st in starts:
                if islands and st <= islands[-1][1]:
                    islands[-1][1] = max(islands[-1][1], st + span_us)
                else:
                    islands.append([st, st + span_us])
            want = (len(islands), sum(e - s for s, e in islands))
            assert got[uid] == want, uid

    def test_touching_intervals_merge(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import interval_union

        ts = np.array([0, 300_000_000, 900_000_000],
                      dtype="datetime64[us]")
        t = pa.table({
            "user_id": pa.array([1, 1, 1], type=pa.int64()),
            "ts": pa.array(ts),
        })
        r = interval_union(ray.data.from_arrow(t),
                           span_s=300.0).take_all()[0]
        # [0,300s) + [300s,600s) merge; [900s,1200s) separate
        assert r["n_islands"] == 2
        assert r["covered_us"] == 600_000_000 + 300_000_000


class TestDailyStreaks:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import daily_streaks

        t = _mk_events(seed=29, n=500, users=8)
        got = {r["user_id"]: (r["n_days"], r["longest_streak"])
               for r in daily_streaks(
                   ray.data.from_arrow(t).repartition(4)).take_all()}

        seq = {}
        for _eid, uid, ts, _et, _v in _rows(t):
            us = int(np.datetime64(ts, "us").astype(np.int64))
            seq.setdefault(uid, set()).add(us // 86_400_000_000)
        for uid, days in seq.items():
            ds_ = sorted(days)
            best = cur = 1
            for a, b in zip(ds_, ds_[1:]):
                cur = cur + 1 if b - a == 1 else 1
                best = max(best, cur)
            assert got[uid] == (len(ds_), best), uid


class TestProximityJoin:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import proximity_join

        t = _mk_events(seed=41, n=600, users=6)
        win = 600 * 1_000_000
        got = {r["event_id"]: (r["n_before"], r["n_after"],
                               r["nearest_abs_us"])
               for r in proximity_join(
                   ray.data.from_arrow(t).repartition(5),
                   "purchase", "click", window_s=600.0).take_all()}

        rows = _rows(t)
        us = {eid: int(np.datetime64(ts, "us").astype(np.int64))
              for eid, _u, ts, _e, _v in rows}
        n_checked = 0
        for eid, uid, _ts, et, _v in rows:
            if et != "purchase":
                continue
            lt = us[eid]
            rts = [us[e2] for e2, u2, _t2, e2t, _v2 in rows
                   if u2 == uid and e2t == "click"]
            inw = [r for r in rts if abs(r - lt) <= win]
            nb = sum(1 for r in inw if r <= lt)
            na = sum(1 for r in inw if r > lt)
            nearest = min((abs(r - lt) for r in inw), default=None)
            assert got[eid] == (nb, na, nearest), eid
            n_checked += 1
        assert n_checked and len(got) == n_checked
        # some purchases must be click-less (NULL nearest) and some not
        vals = [v[2] for v in got.values()]
        assert any(v is None for v in vals) or all(
            v is not None for v in vals)

    def test_same_microsecond_counts_before(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import proximity_join

        ts = np.array([1_000_000, 1_000_000], dtype="datetime64[us]")
        t = pa.table({
            "event_id": pa.array([1, 2], type=pa.int64()),
            "user_id": pa.array([7, 7], type=pa.int64()),
            "ts": pa.array(ts),
            "event_type": pa.array(["purchase", "click"]),
        })
        r = proximity_join(ray.data.from_arrow(t), "purchase", "click",
                           window_s=1.0).take_all()[0]
        assert (r["n_before"], r["n_after"], r["nearest_abs_us"]) \
            == (1, 0, 0)


class TestHourlyProfile:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import hourly_profile

        t = _mk_events(seed=43, n=700)
        got = {(r["dow"], r["hour"]): (r["n"], r["value_cents"])
               for r in hourly_profile(
                   ray.data.from_arrow(t).repartition(6)).take_all()}

        want = {}
        for _eid, _uid, ts, _et, v in _rows(t):
            us = int(np.datetime64(ts, "us").astype(np.int64))
            key = ((us // 86_400_000_000 + 4) % 7,
                   (us // 3_600_000_000) % 24)
            n, s = want.get(key, (0, 0))
            want[key] = (n + 1, s + int(math.floor(v * 100 + 0.5)))
        assert got == want

    def test_epoch_day_zero_is_thursday(self, ray_session):
        import ray.data

        from smartreader_ray.functions.windows import hourly_profile

        t = pa.table({
            "ts": pa.array(np.array([0], dtype="datetime64[us]")),
            "value": pa.array([1.0]),
        })
        r = hourly_profile(ray.data.from_arrow(t)).take_all()[0]
        assert (r["dow"], r["hour"]) == (4, 0)  # 1970-01-01 00:00 Thu
