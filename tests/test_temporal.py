"""Sessionize and range_join: gap boundaries, overlap semantics, plan shape,
and randomized brute-force equivalence."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from fulltextsearch_spark.operators.temporal import range_join, sessionize

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


def test_sessionize_gap_boundary(spark):
    # gap exactly equal to gap_s stays in the SAME session (> is strict)
    rows = [(1, 0, _ts(0)), (1, 1, _ts(100)), (1, 2, _ts(200)),
            (1, 3, _ts(301)), (2, 4, _ts(0))]
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    out = sessionize(ev, key="user_id", ts="ts", ord_col="event_id",
                     gap_s=100.0).collect()
    got = {r["event_id"]: r["session_id"] for r in out}
    # 0->100 and 100->200 are exactly 100s (same session); 200->301 exceeds
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 0}


def test_sessionize_bruteforce(spark):
    rng = random.Random(99)
    rows = []
    for i in range(200):
        rows.append((rng.randrange(4), i, _ts(rng.randrange(100000))))
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    out = sessionize(ev, key="user_id", ts="ts", ord_col="event_id",
                     gap_s=1800.0).collect()
    got = {r["event_id"]: (r["user_id"], r["session_id"]) for r in out}
    want = {}
    by_user: dict = {}
    for u, eid, t in rows:
        by_user.setdefault(u, []).append((t, eid))
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = -1, None
        for t, eid in evs:
            if prev is None or (t - prev).total_seconds() > 1800.0:
                sid += 1
            want[eid] = (u, sid)
            prev = t
    assert got == want


def test_range_join_overlap_boundaries_and_plan(spark):
    points = spark.createDataFrame(
        [(0, _ts(0)), (1, _ts(3600)), (2, _ts(5400)), (3, _ts(7200)),
         (4, _ts(10800))],
        ["pid", "ts"],
    )
    # [0, 7200) and [3600, 10800) overlap on [3600, 7200); end exclusive
    iv = spark.createDataFrame(
        [(10, _ts(0), _ts(7200)), (11, _ts(3600), _ts(10800)),
         (12, _ts(50000), _ts(50000))],  # empty interval -> no matches
        ["iid", "begin", "end"],
    )
    df = range_join(points, iv, bucket_s=3600.0)
    got = sorted((r["pid"], r["iid"]) for r in df.collect())
    assert got == [(0, 10), (1, 10), (1, 11), (2, 10), (2, 11), (3, 11)]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan  # bucketed equi-join, not a theta join


def test_range_join_bruteforce(spark):
    rng = random.Random(7)
    pts = [(i, _ts(rng.randrange(200000))) for i in range(150)]
    ivs = []
    for i in range(30):
        b = rng.randrange(200000)
        ivs.append((i, _ts(b), _ts(b + rng.randrange(1, 20000))))
    points = spark.createDataFrame(pts, ["pid", "ts"])
    intervals = spark.createDataFrame(ivs, ["iid", "begin", "end"])
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, bucket_s=2500.0).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, t in pts
        for iid, b, e in ivs
        if b <= t < e
    )
    assert got == want


def test_funnel_steps_strict_order_and_window(spark):
    """Funnel: strict (ts, event_id) ordering, greedy earliest anchors,
    optional conversion horizon from the step-0 anchor."""
    from datetime import datetime as dt

    from fulltextsearch_spark.operators.temporal import funnel_steps

    T = lambda m: dt(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1 full funnel in order
        (1, T(0), 1, "view"), (2, T(1), 1, "click"), (3, T(2), 1, "purchase"),
        # u2 click BEFORE view -> stops after view
        (4, T(1), 2, "click"), (5, T(2), 2, "view"),
        # u3 equal ts: click same instant as view but higher event_id counts
        (6, T(0), 3, "view"), (7, T(0), 3, "click"),
        # u4 click arrives past the 30-min window
        (8, T(0), 4, "view"), (9, T(40), 4, "click"),
        # u5 never views
        (10, T(0), 5, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING"
    )
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel_steps(df, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 4, "click": 3, "purchase": 1}
    gotw = {
        r["step_name"]: r["n_users"]
        for r in funnel_steps(
            df, ["view", "click", "purchase"], window_seconds=1800
        ).collect()
    }
    assert gotw == {"view": 4, "click": 2, "purchase": 1}
    with pytest.raises(ValueError):
        funnel_steps(df, [])


def test_cohort_retention_week_buckets(spark):
    """Retention: cohorts keyed by first-event week, offsets count distinct
    returning users; a user active twice in one week counts once."""
    from fulltextsearch_spark.operators.temporal import cohort_retention

    T = lambda d, h=0: dt.datetime(2024, 1, d, h)  # noqa: E731  (2024-01-01 = Monday)
    rows = [
        # u1: cohort wk0, active wk0 twice, wk1
        (1, T(1)), (1, T(3)), (1, T(9)),
        # u2: cohort wk0, only wk0
        (2, T(2)),
        # u3: cohort wk1, active wk1 and wk3
        (3, T(8)), (3, T(23)),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    got = {
        (r["cohort_week"].strftime("%Y-%m-%d") if hasattr(r["cohort_week"], "strftime") else str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    exp = {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 2): 1,
    }
    assert {(k[0][:10], k[1]): v for k, v in got.items()} == exp
