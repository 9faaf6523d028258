"""Faceted result aggregation over a top-k result set.

Search engines return, next to the ranked hits, per-facet bucket counts
over document metadata (language, source, domain) so a UI can offer
drill-down filters. The reference's result surface is the bare ranked list
(``/root/reference/src/main.cpp:64-105``); facets complete it the way
:func:`~fulltextsearch_spark.operators.query.search_filtered` completes
the drill-down itself.

Scale shape: the result set is tiny (k rows per query) and is BROADCAST to
the metadata table, so the corpus-sized side never shuffles — one
broadcast-hash join plus a hash aggregate over ``queries × k`` rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "adjacency_matrix",
    "composite_agg",
    "date_histogram",
    "extended_stats",
    "facet_counts",
    "field_percentiles",
    "matrix_stats",
    "percentile_ranks",
    "pipeline_aggs",
    "rare_terms",
    "top_hits",
    "value_histogram",
]


def date_histogram(
    df: DataFrame,
    ts: str = "ts",
    interval: str = "day",
    keys: tuple[str, ...] = (),
    value: str | None = None,
) -> DataFrame:
    """Elasticsearch date_histogram analogue: calendar-bucketed counts
    (plus an optional summed metric) per key combination.

    Returns ``(bucket, *keys, n[, sum_<value>])`` with ``bucket`` the
    calendar truncation of ``ts`` (``interval`` is any ``date_trunc``
    unit). One hash aggregate with map-side partials — the ideal
    whole-stage-codegen shape; bucket cardinality is time-bounded, so the
    shuffle never scales with row count.
    """
    b = F.date_trunc(interval, F.col(ts)).alias("bucket")
    aggs = [F.count(F.lit(1)).alias("n")]
    if value is not None:
        aggs.append(F.sum(value).alias(f"sum_{value}"))
    return df.groupBy(b, *[F.col(k) for k in keys]).agg(*aggs)


def pipeline_aggs(
    buckets: DataFrame,
    metric: str = "n",
    keys: tuple[str, ...] = (),
    bucket_col: str = "bucket",
    window: int = 3,
) -> DataFrame:
    """Elasticsearch pipeline aggregations over a bucketed series: the
    second-pass aggs (`derivative`, `cumulative_sum`, `moving_fn` with the
    unweighted-average function) that ES runs over a parent
    ``date_histogram``'s buckets.

    Input is the OUTPUT of :func:`date_histogram` (or any
    ``(bucket, *keys, metric)`` series); returns it with three new columns:

    * ``deriv``   — ``metric - lag(metric)`` per key, NULL on each series'
      first bucket (exact ES derivative semantics over present buckets;
      ES's ``min_doc_count=0`` gap-filling is the caller's concern).
    * ``cum``     — running sum up to and including the bucket.
    * ``mov_avg`` — trailing-``window`` unweighted mean (the ES
      ``moving_fn: MovingFunctions.unweightedAvg`` shape over a window of
      the current + previous ``window-1`` buckets), rounded to 4 dp; on an
      integer metric the pre-round value is a single exact-operand IEEE
      division, so it replays bit-for-bit in SQL.

    Scale shape: the windows partition by ``keys`` and order by the bucket —
    per-key bucket counts are time-bounded (days x key cardinality), never
    row-count-bounded, so each partition's window state is small however
    large the raw table was. With ``keys=()`` the series is global and the
    single-partition window is exactly as big as the histogram itself.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(bucket_col)
    m = F.col(metric)
    trail = w.rowsBetween(-(window - 1), 0)
    return buckets.select(
        "*",
        (m - F.lag(metric).over(w)).alias("deriv"),
        F.sum(metric).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.round(
            F.sum(metric).over(trail).cast("double")
            / F.count(F.lit(1)).over(trail).cast("double"),
            4,
        ).alias("mov_avg"),
    )


def facet_counts(results: DataFrame, doc_meta: DataFrame, facet_col: str) -> DataFrame:
    """Bucket a ``(query_id, rank, doc_id, ...)`` result set by a metadata column.

    Returns ``(query_id, <facet_col>, n_docs, best_rank)`` — hit count and
    best (lowest) rank per facet value per query. ``doc_meta`` is any
    DataFrame carrying ``doc_id`` and ``facet_col``; it is probed on the
    big side of a broadcast join, so only ``doc_id`` and the facet column
    are scanned (column pruning) and no corpus shuffle occurs.
    """
    hits = results.select("query_id", "rank", "doc_id")
    joined = doc_meta.select("doc_id", facet_col).join(F.broadcast(hits), "doc_id")
    return joined.groupBy("query_id", facet_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("rank").alias("best_rank"),
    )


def field_percentiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    percentiles: list[float],
) -> DataFrame:
    """ES ``percentiles`` aggregation, exact: per-key linear-interpolated
    percentiles of a numeric field.

    Returns ``(*key_cols, p<pct>, ...)`` with one column per requested
    percentile (``0.25 -> p25``, ``0.999 -> p99_9``). Uses Spark's EXACT
    ``percentile`` aggregate (linear interpolation at rank ``p*(n-1)`` —
    the same definition as SQL ``quantile_cont``), not the t-digest
    approximation: at web scale ES reaches for t-digest because its
    coordinator merges shard sketches, but a Spark sort-based exact
    aggregate distributes fine for grouped percentiles whose groups fit a
    partition each; swap in ``percentile_approx`` only when a single group's
    values exceed executor memory.
    """
    def _name(p: float) -> str:
        s = f"{p * 100:g}".replace(".", "_")
        return f"p{s}"

    aggs = [
        F.percentile(F.col(value_col), F.lit(p)).alias(_name(p))
        for p in percentiles
    ]
    return df.groupBy(*[F.col(k) for k in key_cols]).agg(*aggs)


def top_hits(
    scored: DataFrame,
    doc_meta: DataFrame,
    facet_col: str,
    n_per_bucket: int = 3,
) -> DataFrame:
    """ES ``top_hits`` sub-aggregation: the best N hits inside each facet
    bucket of each query's FULL match set (not just the global top-k).

    Returns ``(query_id, <facet_col>, bucket_rank, doc_id, score)``.
    ``scored`` is the per-(query, doc) accumulated score frame (the
    pre-top-k candidate set from
    :func:`~fulltextsearch_spark.operators.query._scored_candidates`).

    Scale shape: candidates join ``doc_meta`` on ``doc_id`` — at web scale
    both sides are corpus-sized, so this is one shuffle join on the doc
    key; the per-bucket window then partitions by (query, facet), which is
    well-spread by construction (bucket cardinality × queries partitions).
    No single-partition window, no corpus broadcast.
    """
    from pyspark.sql import Window

    meta = doc_meta.select("doc_id", facet_col)
    w = Window.partitionBy("query_id", facet_col).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.join(meta, "doc_id")
        .withColumn("bucket_rank", F.row_number().over(w))
        .where(F.col("bucket_rank") <= n_per_bucket)
        .select("query_id", facet_col, "bucket_rank", "doc_id", "score")
    )


def rare_terms(
    df_table: DataFrame,
    n_docs: int,
    max_share: float = 0.05,
) -> DataFrame:
    """ES ``rare_terms`` aggregation: the long-tail terms whose document
    frequency is at most ``ceil(max_share * n_docs)``.

    Returns ``(term, df)``. ES bounds this with a CuckooFilter because its
    coordinator must merge unbounded shard dictionaries; in Spark the df
    table is already a materialized aggregate, so rare-term selection is a
    pushed-down filter on it — no extra shuffle at any scale. The threshold
    is relative (share of corpus) so the query means the same thing at
    sf0.01 and at 10^12 docs.
    """
    import math

    cap = int(math.ceil(max_share * n_docs))
    return df_table.select("term", "df").where(F.col("df") <= F.lit(cap))


def adjacency_matrix(
    tf: DataFrame,
    filters: dict[str, str],
) -> DataFrame:
    """ES ``adjacency_matrix`` aggregation: document counts for every named
    term-filter and every pairwise intersection of filters.

    ``filters`` maps bucket key -> term; a document is in bucket ``k`` when
    it contains ``filters[k]`` at least once. Returns
    ``(key1, key2, doc_count)`` for ``key1 <= key2`` (the ES convention:
    the diagonal is the plain filter count, off-diagonal the intersection),
    only non-empty buckets, like ES.

    Scale shape: ``tf`` is filtered to the |filters| requested terms BEFORE
    any join (predicate pushdown to the scan), so the self-join operates on
    a tiny fraction of the corpus; the join key is ``doc_id`` and the
    final aggregate has at most |filters|^2 groups.
    """
    keys = [(k, t) for k, t in sorted(filters.items())]
    spark = tf.sparkSession
    kmap = spark.createDataFrame(keys, ["key", "term"])
    flags = (
        tf.where(F.col("term").isin([t for _, t in keys]))
        .join(F.broadcast(kmap), "term")
        .select("doc_id", "key")
        .distinct()
    )
    a = flags.alias("a")
    b = flags.alias("b")
    return (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.key") <= F.col("b.key")))
        .groupBy(F.col("a.key").alias("key1"), F.col("b.key").alias("key2"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


def composite_agg(
    df: DataFrame,
    sources: list[str],
    size: int,
    after: tuple | None = None,
) -> DataFrame:
    """ES ``composite`` aggregation: multi-source bucket counts streamed in
    deterministic source order with after-key pagination.

    Returns the next ``size`` buckets ``(*sources, doc_count)`` whose
    composite key sorts strictly AFTER ``after`` (a tuple aligned with
    ``sources``; ``None`` = first page). This is the aggregation-side
    analogue of ``search_after`` — the reason ES has it is exactly the
    reason it suits Spark: pagination never re-materializes earlier pages.

    Scale shape: one hash aggregate over the source columns (map-side
    partials), the after-key predicate prunes buckets BEFORE the ordering,
    and ``orderBy().limit(size)`` compiles to TakeOrdered — a per-partition
    top-``size`` plus a ``size``-row merge, never a global sort of the
    bucket set.
    """
    grouped = df.groupBy(*[F.col(s) for s in sources]).agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    if after is not None:
        # lexicographic (s0, s1, ...) > (a0, a1, ...)
        pred = F.lit(False)
        eq = F.lit(True)
        for col, val in zip(sources, after):
            pred = pred | (eq & (F.col(col) > F.lit(val)))
            eq = eq & (F.col(col) == F.lit(val))
        grouped = grouped.where(pred)
    return grouped.orderBy(*[F.asc(s) for s in sources]).limit(size)


def percentile_ranks(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    thresholds: list[float],
) -> DataFrame:
    """ES ``percentile_ranks`` aggregation, exact: for each threshold, the
    percentage of values <= it, per key combination.

    Returns ``(*key_cols, pr_<t>, ...)``. ES approximates this with
    t-digest for the same coordinator-merge reason as ``percentiles``; one
    Spark hash aggregate computes it exactly (a conditional-count per
    threshold, all map-side-partial).
    """
    def _name(t: float) -> str:
        return "pr_" + f"{t:g}".replace(".", "_").replace("-", "m")

    aggs = [
        F.round(
            100.0 * F.avg((F.col(value_col) <= F.lit(t)).cast("double")), 4
        ).alias(_name(t))
        for t in thresholds
    ]
    return df.groupBy(*[F.col(k) for k in key_cols]).agg(*aggs)


def matrix_stats(df: DataFrame, fields: list[str]) -> DataFrame:
    """ES ``matrix_stats`` aggregation: per-field-pair second-moment
    statistics over numeric fields.

    Returns one row per ordered-unique pair ``(field_x <= field_y)``:
    ``(field_x, field_y, n, mean_x, mean_y, covariance, correlation)``
    (population covariance; the diagonal's covariance is the variance and
    its correlation 1). Everything reduces in ONE hash aggregate pass —
    |fields|^2 scalar aggregates with map-side partials — then a constant
    ``stack`` unpivot of the single result row; nothing scales with row
    count except the scan.
    """
    pairs = [
        (fx, fy) for i, fx in enumerate(fields) for fy in fields[i:]
    ]
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for f_ in fields:
        aggs.append(F.avg(F.col(f_)).alias(f"_mean_{f_}"))
    for fx, fy in pairs:
        aggs.append(F.covar_pop(F.col(fx), F.col(fy)).alias(f"_cov_{fx}_{fy}"))
        aggs.append(F.corr(F.col(fx), F.col(fy)).alias(f"_cor_{fx}_{fy}"))
    one = df.agg(*aggs)
    stack_args = []
    for fx, fy in pairs:
        stack_args.append(
            f"'{fx}', '{fy}', _n, _mean_{fx}, _mean_{fy}, "
            f"round(_cov_{fx}_{fy}, 6), round(_cor_{fx}_{fy}, 6)"
        )
    expr = (
        f"stack({len(pairs)}, " + ", ".join(stack_args) +
        ") as (field_x, field_y, n, mean_x, mean_y, covariance, correlation)"
    )
    return one.selectExpr(expr)


def extended_stats(
    df: DataFrame, value: str, keys: tuple[str, ...] = ()
) -> DataFrame:
    """Elasticsearch extended_stats analogue: count / min / max / sum /
    avg / sum_of_squares / variance / std_deviation per key combination.

    Variance and std are DERIVED from the moment sums
    (``sumsq/n - (sum/n)^2``, ES's own population formula) instead of a
    native VAR_POP aggregate, so when the value column is integral the
    moment sums are exact and the derived doubles are bit-identical
    under any partitioning / aggregation order — SQL-replayable by
    construction. One hash aggregate with map-side partials.
    """
    g = df.groupBy(*[F.col(k) for k in keys]) if keys else df.groupBy()
    v = F.col(value).cast("double")
    base = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v).alias("sum_v"),
        F.sum(v * v).alias("sumsq_v"),
    )
    mean = F.col("sum_v") / F.col("n")
    # clamp at 0: FP cancellation on non-integral columns can yield a tiny
    # negative raw variance -> NaN std (ES clamps the same way)
    var = F.greatest(
        F.col("sumsq_v") / F.col("n") - mean * mean, F.lit(0.0)
    )
    return base.select(
        *keys,
        "n",
        "min_v",
        "max_v",
        "sum_v",
        mean.alias("avg_v"),
        "sumsq_v",
        var.alias("variance"),
        F.sqrt(var).alias("std_dev"),
    )


def value_histogram(
    df: DataFrame, value: str, interval: int, min_doc_count: int = 0
) -> DataFrame:
    """Elasticsearch numeric histogram analogue: fixed-``interval``
    buckets of ``floor(value / interval) * interval``, with ES's
    ``min_doc_count=0`` semantics — EMPTY buckets between the min and max
    observed bucket are emitted with n=0 (the gap fill that makes the
    histogram plottable without client-side densification).

    The gap fill is a sequence over the [min_bucket, max_bucket] range —
    bucket cardinality is (max-min)/interval regardless of row count, so
    the densify side stays tiny while the counting side is one map-side-
    partial hash aggregate.
    """
    b = (F.floor(F.col(value).cast("double") / interval) * interval).cast(
        "long"
    ).alias("bucket")
    counts = df.select(b).groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    if min_doc_count > 0:
        return counts.filter(F.col("n") >= min_doc_count)
    rng = counts.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    ).select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(int(interval)))
        ).alias("bucket")
    )
    return rng.join(counts, "bucket", "left").select(
        "bucket", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
