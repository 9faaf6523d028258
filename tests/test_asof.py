"""As-of join: inclusive-tie semantics, right_ord tiebreak, inner drop,
and equivalence with a brute-force reference on randomized data."""

from __future__ import annotations

import random

from fulltextsearch_spark.operators.asof import asof_join


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_basic_latest_at_or_before(spark):
    left = _df(spark, [(1, 10, "l10"), (1, 25, "l25"), (2, 5, "l5")],
               ["k", "ts", "lv"])
    right = _df(spark, [(1, 10, "r10"), (1, 20, "r20"), (2, 6, "r6")],
                ["k", "ts", "rv"])
    rows = asof_join(left, right, on=["k"]).collect()
    got = {(r["k"], r["lv"]): (r["r_rv"], r["r_ts"]) for r in rows}
    # ts=10 matches the equal-ts right row (inclusive); ts=25 takes r20;
    # k=2 left at ts=5 has no right <= 5 -> dropped (inner)
    assert got == {(1, "l10"): ("r10", 10), (1, "l25"): ("r20", 20)}


def test_tiebreak_greatest_right_ord(spark):
    left = _df(spark, [(1, 10)], ["k", "ts"])
    right = _df(spark, [(1, 10, 3), (1, 10, 7), (1, 9, 99)], ["k", "ts", "rid"])
    rows = asof_join(left, right, on=["k"], right_ord="rid").collect()
    assert len(rows) == 1 and rows[0]["r_rid"] == 7


def test_matches_bruteforce_randomized(spark):
    rng = random.Random(417)
    left_rows = [(rng.randrange(5), rng.randrange(100), i) for i in range(80)]
    right_rows = [(rng.randrange(5), rng.randrange(100), i) for i in range(80)]
    left = _df(spark, left_rows, ["k", "ts", "lid"])
    right = _df(spark, right_rows, ["k", "ts", "rid"])
    got = {
        r["lid"]: r["r_rid"]
        for r in asof_join(left, right, on=["k"], right_ord="rid").collect()
    }
    want = {}
    for k, ts, lid in left_rows:
        cands = [(rts, rid) for rk, rts, rid in right_rows if rk == k and rts <= ts]
        if cands:
            want[lid] = max(cands)[1]
    assert got == want


def test_tiebreak_exact_above_double_precision(spark):
    # ids above 2^53 are indistinguishable as doubles; the tiebreak must
    # compare in the column's native int64 type
    a, b = (1 << 53) + 1, (1 << 53) + 2
    left = _df(spark, [(1, 10)], ["k", "ts"])
    right = _df(spark, [(1, 10, a), (1, 10, b)], ["k", "ts", "rid"])
    rows = asof_join(left, right, on=["k"], right_ord="rid").collect()
    assert len(rows) == 1 and rows[0]["r_rid"] == b
