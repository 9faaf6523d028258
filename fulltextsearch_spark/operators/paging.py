"""Keyset pagination: the Elasticsearch ``search_after`` cursor.

Deep pagination done right: instead of materializing ``offset + k``
candidates per page (ES ``from``/``size``, which at page 1000 forces every
shard to ship 1000·k hits to the coordinator), the caller passes the sort
key of the last hit of the previous page and the engine returns the top-k
STRICTLY AFTER that key. The engine's total order is (score DESC, doc_id
ASC) — deterministic and free of ties, so the cursor predicate

    score < after_score  OR  (score = after_score AND doc_id > after_doc_id)

partitions the candidate space exactly and every page costs the same as
page one.

Scale shape: identical broadcast posting probe as
:func:`~fulltextsearch_spark.operators.query.search`; the cursor table is
per-query one row, **broadcast**, and the predicate is applied BEFORE the
top-k window — WindowGroupLimit keeps per-partition state at k rows
regardless of page depth. This is the property ES built search_after for;
the DataFrame expression gets it from the same filter-then-rank shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fulltextsearch_spark.config import DEFAULT_CONFIG, EngineConfig
from fulltextsearch_spark.operators.index_build import IndexTables
from fulltextsearch_spark.operators.query import _scored_candidates, query_terms, topk

__all__ = ["page_cursor", "search_after"]


def page_cursor(page: DataFrame) -> DataFrame:
    """(query_id, after_score, after_doc_id) — the cursor at a result page's
    last row (its maximum rank), ready to feed :func:`search_after`."""
    last = page.groupBy("query_id").agg(F.max("rank").alias("rank"))
    return page.join(last, ["query_id", "rank"]).select(
        "query_id",
        F.col("score").alias("after_score"),
        F.col("doc_id").alias("after_doc_id"),
    )


def search_after(
    index: IndexTables,
    queries: DataFrame,
    cursor: DataFrame | None = None,
    cfg: EngineConfig = DEFAULT_CONFIG,
    scoring: str = "bm25",
    k: int | None = None,
) -> DataFrame:
    """queries(query_id, content) [x cursor(query_id, after_score,
    after_doc_id)] -> (query_id, rank, doc_id, score): the top-k page
    strictly after the cursor, rank 1..k within the page.

    A query absent from the cursor (or ``cursor=None``) gets its first page
    — the ES contract for a missing ``search_after`` body.
    """
    q_terms = query_terms(queries, stem=cfg.stem)
    scored = _scored_candidates(index, q_terms, cfg, scoring)
    if cursor is not None:
        scored = (
            scored.join(F.broadcast(cursor), "query_id", "left")
            .filter(
                F.col("after_score").isNull()
                | (F.col("score") < F.col("after_score"))
                | (
                    (F.col("score") == F.col("after_score"))
                    & (F.col("doc_id") > F.col("after_doc_id"))
                )
            )
            .select("query_id", "doc_id", "score")
        )
    return topk(scored, k if k is not None else cfg.k)
