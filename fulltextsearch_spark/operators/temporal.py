"""Temporal operators Spark lacks as primitives: sessionization, range join.

Companions to :mod:`.asof` for clickstream/event analytics over the engine's
corpus pipeline (query-log sessionization is how web-search engines mine
query reformulations; range joins attach events to campaign/deploy windows).

Both are built scale-first:

* ``sessionize`` is the classic gaps-and-islands formulation — one shuffle
  on the key, two window passes over each key's partition (lag + prefix
  sum), no self-join. Skew bounds at per-key event counts.
* ``range_join`` is the BUCKETED interval join: intervals explode to the
  fixed-width time buckets they overlap, points map to exactly one bucket,
  and the equi-join on (bucket) runs through the normal hash-shuffle
  machinery with the precise containment predicate applied AFTER the join.
  Candidate volume is |points| + |intervals| x (len/bucket_width + 1) —
  never the |points| x |intervals| cross-product a plain theta join
  (BroadcastNestedLoopJoin) materializes. Choose ``bucket`` on the order
  of the longest interval so each interval explodes to O(1) buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cohort_retention", "funnel_steps", "range_join", "sessionize"]


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    ord_col: str | None = None,
    gap_s: float = 1800.0,
) -> DataFrame:
    """Assign inactivity-gap sessions: a new session starts when the time
    since the key's previous event exceeds ``gap_s`` seconds.

    Adds ``session_id`` (0-based ordinal per key, in time order). Events at
    identical timestamps order deterministically by ``ord_col`` (defaults
    to ``ts``; pass a unique id when timestamps can repeat).
    """
    ord_col = ord_col or ts
    w = Window.partitionBy(key).orderBy(ts, ord_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = int(gap_s * 1_000_000)
    with_prev = events.withColumn("_prev_ts", F.lag(ts).over(w))
    new_sess = (
        F.col("_prev_ts").isNull()
        | (F.expr(f"timestampdiff(MICROSECOND, _prev_ts, {ts})") > gap_us)
    ).cast("int")
    return (
        with_prev.withColumn("_new", new_sess)
        .withColumn("session_id", (F.sum("_new").over(run) - 1).cast("long"))
        .drop("_prev_ts", "_new")
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    begin: str = "begin",
    end: str = "end",
    bucket_s: float = 3600.0,
) -> DataFrame:
    """Join each point row to every interval containing it
    (``begin <= ts < end``), without a cross-product.

    Both sides gain a time-bucket key: the point's single bucket, and the
    contiguous bucket range each interval overlaps (via ``sequence`` +
    ``explode`` — O(interval_len / bucket_s) rows per interval). The
    equi-join on the bucket runs as a normal shuffled/broadcast hash join;
    the exact containment filter afterwards removes same-bucket misses.
    Timestamps are compared at microsecond precision (epoch micros via a
    DAY-diff-free long expression that supports TIMESTAMP_NTZ).
    """
    us = int(bucket_s * 1_000_000)

    def _epoch_us(df: DataFrame, col: str):  # noqa: ANN202
        # reference literal cast to the column's OWN type so timestampdiff
        # never sees mixed TIMESTAMP / TIMESTAMP_NTZ operands
        dt = dict(df.dtypes)[col]
        return F.expr(
            f"timestampdiff(MICROSECOND, cast('1970-01-01 00:00:00' as {dt}), {col})"
        )

    p_us = _epoch_us(points, point_ts)
    b_us = _epoch_us(intervals, begin)
    e_us = _epoch_us(intervals, end)
    p = points.withColumn("_p_us", p_us).withColumn(
        "_bkt", (F.col("_p_us") / us).cast("long")
    )
    iv = (
        intervals.withColumn("_b_us", b_us)
        .withColumn("_e_us", e_us)
        # empty/inverted intervals contain nothing; dropping them up front
        # also keeps sequence() from generating a descending bucket range
        .filter(F.col("_e_us") > F.col("_b_us"))
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    (F.col("_b_us") / us).cast("long"),
                    # end is exclusive, but an interval ending exactly on a
                    # bucket boundary still owns no point there — the strict
                    # filter below handles it; ceil-to-last-contained bucket
                    ((F.col("_e_us") - 1) / us).cast("long"),
                )
            ),
        )
    )
    joined = p.join(iv, "_bkt").filter(
        (F.col("_b_us") <= F.col("_p_us")) & (F.col("_p_us") < F.col("_e_us"))
    )
    return joined.drop("_bkt", "_p_us", "_b_us", "_e_us")


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    window_seconds: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """-> (step, step_name, n_users): strict-order funnel analysis.

    A user reaches step i when an event of ``steps[i]`` exists STRICTLY
    after their step-(i-1) event under the total (ts, event_id) order —
    the deterministic tiebreak the whole events suite uses. The step-i
    anchor is the EARLIEST such event (greedy matching, the standard
    funnel semantics). With ``window_seconds``, later steps must also
    fall within that horizon of the user's step-0 anchor.

    Scale shape: per step one filtered min-struct hash aggregate (map-side
    partial) plus a join against the previous step's per-user anchor —
    each intermediate is one row per surviving user, monotonically
    shrinking; no windows, no event-level shuffle beyond the per-step
    aggregate. Counts are exact integers.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("i"),
        F.col(type_col).alias("e"),
    )
    counts = []
    reached: DataFrame | None = None
    for idx, step in enumerate(steps):
        cur = ev.filter(F.col("e") == step)
        if reached is None:
            agg = (
                cur.groupBy("u")
                .agg(F.min(F.struct("t", "i")).alias("_t"))
                .withColumn("_t0", F.col("_t.t"))
            )
        else:
            cond = F.struct("t", "i") > F.col("_t")
            if window_seconds is not None:
                cond = cond & (
                    F.col("t")
                    <= F.col("_t0") + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
                )
            agg = (
                cur.join(reached.select("u", "_t", "_t0"), "u")
                .filter(cond)
                .groupBy("u")
                .agg(
                    F.min(F.struct("t", "i")).alias("_t"),
                    F.min("_t0").alias("_t0"),
                )
            )
        # truncate lineage: each survivor frame is one skinny row per user;
        # without this every counts[i] replays all prior steps' event scans
        reached = agg.localCheckpoint()
        counts.append(
            agg.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(idx + 1).cast("long").alias("step"),
                F.lit(step).alias("step_name"),
                F.col("n_users").cast("long"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """-> (cohort_week, week_offset, n_users): classic cohort retention —
    users grouped by the calendar week of their FIRST event; cell
    (c, k) counts how many of cohort c were active k weeks later
    (week_offset 0 is the cohort size). Distinct-user counts are exact
    integers and week truncation is calendar arithmetic, so the whole
    table is FP-free and SQL-replayable.

    Scale shape: one min-aggregate per user (map-side partials), one
    broadcast-or-shuffle join of the skinny (user, cohort) table back to
    events, one distinct-count aggregate over (cohort, offset) — bounded
    by users, then by weeks^2, never by raw event volume after the first
    aggregate.
    """
    ev = events.select(
        F.col(user_col).alias("u"), F.date_trunc("week", F.col(ts_col)).alias("w")
    )
    first = ev.groupBy("u").agg(F.min("w").alias("w0"))
    joined = ev.join(first, "u")
    return (
        joined.select(
            F.col("w0").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("w0")) / 7).cast("long").alias("week_offset"),
            "u",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("u").cast("long").alias("n_users"))
    )
