"""Field collapsing: one best document per group key in the top-k.

The Elasticsearch ``collapse`` / Lucene grouping surface: results are
grouped by a document attribute (site, domain, source feed) and each group
contributes only its single best-scoring document, so one prolific source
cannot monopolize the result page. Exact semantics — collapse happens over
ALL scored candidates, then top-k is taken over the collapsed set (a
post-collapse of the uncollapsed top-k under-fills k whenever one group
holds several top slots; same reasoning as filtered search,
:func:`~fulltextsearch_spark.operators.query.search_filtered`).

Scale shape: the key source is a skinny ``(doc_id, key)`` projection —
Catalyst prunes the corpus table to two columns before the join, and AQE
broadcasts it when small; otherwise the join shuffles candidate rows only
(queries x matched docs, never the corpus). Both windows compile to
WindowGroupLimit (rank pushdown): per-partition top-1 per (query, key) and
top-k per query keep partial state bounded, the distributed analogue of
Lucene's per-group head in ``TopGroupsCollector``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fulltextsearch_spark.config import DEFAULT_CONFIG, EngineConfig
from fulltextsearch_spark.operators.index_build import IndexTables
from fulltextsearch_spark.operators.query import _scored_candidates, query_terms

__all__ = ["collapse_topk", "search_collapsed"]


def collapse_topk(scored: DataFrame, doc_keys: DataFrame, k: int) -> DataFrame:
    """scored(query_id, doc_id, score) x doc_keys(doc_id, key) ->
    (query_id, rank, key, doc_id, score): per query, the best doc per key,
    ranked (score DESC, doc_id ASC), top-k groups kept.

    Docs absent from ``doc_keys`` are dropped (the ES contract: collapsing
    requires the field; callers wanting a catch-all group can supply one).
    """
    cand = scored.join(doc_keys.select("doc_id", "key"), "doc_id", "inner")
    best = Window.partitionBy("query_id", "key").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    collapsed = (
        cand.withColumn("_rn", F.row_number().over(best))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        collapsed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "key", "doc_id", "score")
    )


def search_collapsed(
    index: IndexTables,
    queries: DataFrame,
    doc_keys: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    scoring: str = "bm25",
    k: int | None = None,
) -> DataFrame:
    """queries(query_id, content) + doc_keys(doc_id, key) ->
    (query_id, rank, key, doc_id, score) field-collapsed top-k."""
    q_terms = query_terms(queries, stem=cfg.stem)
    scored = _scored_candidates(index, q_terms, cfg, scoring)
    return collapse_topk(scored, doc_keys, k if k is not None else cfg.k)
