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

__all__ = ["date_histogram", "facet_counts", "field_percentiles"]


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
