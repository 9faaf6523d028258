"""As-of join: for each left row, the latest right row at-or-before it.

Spark has no native as-of join (pandas ``merge_asof`` / DuckDB ``ASOF
JOIN`` semantics), so this implements it as a composition of existing
DataFrame ops — the union–sort–carry-forward formulation:

1. tag both inputs and union them on the join key + timestamp;
2. one window per key, ordered by ``(ts, side, right-tiebreak)`` with right
   rows sorting BEFORE left rows at equal timestamps (ties are inclusive:
   ``right_ts <= left_ts``);
3. ``last(right_struct, ignorenulls=True)`` over rows-unbounded-preceding
   carries the most recent right row forward; left rows then just read it.

Scale shape: exactly one shuffle (the window exchange on the key), then a
linear per-partition scan — the streaming-merge shape an as-of join has in
purpose-built engines (kdb+ ``aj``, QuestDB/ClickHouse ASOF). Skew is
bounded by per-key row counts, not table size. No range cross-product is
ever materialized, unlike the naive ``t1 <= t2`` theta-join which explodes
to O(left x right) per key before filtering.

Determinism: among right rows sharing ``(key, ts)``, the row with the
greatest ``right_ord`` wins — an explicit total order, where pandas
``merge_asof`` silently takes physical input order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_ord: str | None = None,
) -> DataFrame:
    """Inner as-of join: left rows paired with the latest right row having
    ``right_ts <= left_ts`` on the same ``on`` key.

    Returns every left column plus the matched right columns prefixed
    ``r_`` (key and timestamp included as ``r_<right_ts>``). Left rows with
    no prior right row are dropped (inner semantics). ``right_ord`` breaks
    ties among right rows at the same (key, ts) — greatest wins; defaults
    to ``right_ts`` (i.e. arbitrary-but-total only when true duplicates
    exist, so pass a unique id when the right side can repeat timestamps).
    """
    on = list(on)
    right_ord = right_ord or right_ts
    r_payload = [c for c in right.columns if c not in on]
    # keep right_ord's NATIVE type: casting to double would collapse int64
    # ids above 2^53 (and NULL out non-numeric columns), silently breaking
    # the documented total-order tiebreak
    ord_type = right.schema[right_ord].dataType
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_ord).alias("_ord"),
        F.struct(*[F.col(c).alias(f"r_{c}") for c in r_payload]).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
          if c not in on],
    )
    l_cols = [c for c in left.columns if c not in on]
    lf = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        # left rows never compete on _ord (their _side sorts after every
        # right row at equal ts); NULL keeps the union type exact
        F.lit(None).cast(ord_type).alias("_ord"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *l_cols,
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side", "_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lf.unionByName(r.select(*lf.columns)).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out = carried.filter((F.col("_side") == 1) & F.col("_match").isNotNull())
    return out.select(
        *on,
        *l_cols,
        *[F.col(f"_match.r_{c}").alias(f"r_{c}") for c in r_payload],
    )
