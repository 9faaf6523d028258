"""Function-score retrieval: relevance x document-attribute decay.

The Elasticsearch ``function_score`` query with an ``exp`` decay function
(the classic recency boost): the text score is multiplied by::

    mult = exp( ln(decay) * max(0, |value - origin| - offset) / scale )

so a doc AT the origin keeps its full score and a doc ``scale`` away from
``origin + offset`` keeps exactly ``decay`` of it. With BM25 as the text
score this is the standard freshness-weighted ranking over a web corpus
(newer crawl snapshots outrank stale ones at equal relevance).

Scale shape: candidates come from the unchanged broadcast posting probe
(:func:`~fulltextsearch_spark.operators.query._scored_candidates`), the
attribute table joins on ``doc_id`` AFTER scoring — the join input is the
per-(query, doc) candidate set, not the corpus, and the attribute side is
pruned to ``(doc_id, value)`` before the exchange. AQE broadcasts the
attribute slice when it is small; at full scale both sides hash-partition
on ``doc_id`` once. The multiplier is pure Column arithmetic — whole-stage
codegen, no UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fulltextsearch_spark.config import DEFAULT_CONFIG, EngineConfig
from fulltextsearch_spark.operators.index_build import IndexTables
from fulltextsearch_spark.operators.query import _scored_candidates, query_terms, topk

__all__ = ["decay_multiplier", "search_boosting", "search_decay"]


def decay_multiplier(
    value_col,
    origin: float = 0.0,
    scale: float = 30.0,
    decay: float = 0.5,
    offset: float = 0.0,
) -> F.Column:
    """ES ``exp`` decay multiplier Column over a numeric attribute."""
    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    lam = math.log(decay) / float(scale)
    dist = F.greatest(
        F.lit(0.0), F.abs(value_col.cast("double") - F.lit(float(origin))) - F.lit(float(offset))
    )
    return F.exp(F.lit(lam) * dist)


def search_decay(
    index: IndexTables,
    queries: DataFrame,
    doc_values: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    scoring: str = "bm25",
    k: int | None = None,
    origin: float = 0.0,
    scale: float = 30.0,
    decay: float = 0.5,
    offset: float = 0.0,
) -> DataFrame:
    """queries(query_id, content) x doc_values(doc_id, value) ->
    (query_id, rank, doc_id, score) top-k under ``text_score * exp decay``.

    Docs absent from ``doc_values`` are dropped (ES treats a missing decay
    field as non-matching for the function; supply a default row to keep
    them)."""
    q_terms = query_terms(queries, stem=cfg.stem)
    scored = _scored_candidates(index, q_terms, cfg, scoring)
    mult = decay_multiplier(F.col("value"), origin, scale, decay, offset)
    rescored = (
        scored.join(doc_values.select("doc_id", "value"), "doc_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("score") * mult).alias("score"),
        )
    )
    return topk(rescored, k if k is not None else cfg.k)


def search_boosting(
    index: IndexTables,
    queries: DataFrame,
    negative_queries: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    scoring: str = "bm25",
    k: int | None = None,
    negative_boost: float = 0.2,
) -> DataFrame:
    """Lucene ``BoostingQuery`` / ES ``boosting``: demote, don't exclude.

    Docs are ranked by the positive query's score; any doc ALSO matching a
    term of the paired negative query (same ``query_id``) keeps only
    ``negative_boost`` of its score. Unlike a boolean NOT, demoted docs can
    still surface when nothing better matches — the classic
    "apple -fruit-ish" disambiguation ranking.

    Plan shape: two broadcast posting probes (positive scored candidates +
    the negative MATCH SET, which needs no scores — a skinny distinct
    (query, doc) projection), one left-semi-style join between them, then
    the usual top-k. The negative probe touches only its own terms' posting
    row groups.
    """
    if not (0.0 < negative_boost <= 1.0):
        raise ValueError(f"negative_boost must be in (0, 1], got {negative_boost}")
    pos_terms = query_terms(queries, stem=cfg.stem)
    scored = _scored_candidates(index, pos_terms, cfg, scoring)
    neg_terms = query_terms(negative_queries, stem=cfg.stem).select("query_id", "term")
    neg_docs = (
        index.postings.join(F.broadcast(neg_terms), "term")
        .select("query_id", F.explode("postings").alias("p"))
        .select("query_id", F.col("p.doc_id").alias("doc_id"))
        .distinct()
        .withColumn("_neg", F.lit(True))
    )
    demoted = (
        scored.join(neg_docs, ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "doc_id",
            F.when(F.col("_neg"), F.col("score") * F.lit(float(negative_boost)))
            .otherwise(F.col("score"))
            .alias("score"),
        )
    )
    return topk(demoted, k if k is not None else cfg.k)
