"""Parent-child retrieval: the ES/Lucene ``has_child`` query.

Elasticsearch's join field lets a query match CHILD documents (paragraphs,
comments, reviews) and return their PARENTS, scored by an aggregate of the
matching children's scores (``score_mode``: max / sum / avg) with a
``min_children`` support floor. The reference engine is doc-granular
(/root/reference/src/algorithms/inverted/inverted_index_engine.cpp), so this
is the natural containment extension — the paragraph level already exists in
this repo for dedup (webfilters.paragraph_dedup_stats); here the same
children become a retrieval target.

Children are scored as an independent mini-corpus: BM25 with
``N = count(children)`` and ``avgdl = avg(child dl)`` (NOT the reference's
``max(id)+1`` quirk — children have no dense id contract), df = number of
children containing the term.

Scale shape: the child explode is narrow (posexplode in the scan stage);
child tf/df are the standard map-side-partial hash aggregates; the query
probe broadcasts the (tiny) query-term set; the parent rollup is one hash
aggregate keyed by (query, parent). Nothing corpus-sized is ever collected
or broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fulltextsearch_spark.functions.scoring import bm25_col
from fulltextsearch_spark.functions.tokenizer import tokenize_udf
from fulltextsearch_spark.operators.query import topk

__all__ = ["child_docs", "has_child_topk"]


def child_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(parent_id, child_idx, child_text): newline-separated, trimmed,
    non-empty paragraphs — the same child derivation the paragraph-dedup
    op uses, so one corpus prep serves both."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("parent_id"),
        F.posexplode(lines).alias("child_idx", "child_text"),
    )


def has_child_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    score_mode: str = "max",
    min_children: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
    stem: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """(query_id, content) -> (query_id, rank, parent_id, n_children, score).

    A parent qualifies when at least ``min_children`` of its children match
    the query (a child matches when it contains >=1 query term); its score
    is the ``score_mode`` aggregate (max / sum / avg) of the matching
    children's BM25 scores over the child mini-corpus.
    """
    if score_mode not in ("max", "sum", "avg"):
        raise ValueError(f"unknown score_mode {score_mode!r}")

    children = child_docs(docs, text_col)
    tok = tokenize_udf(do_stem=stem)
    ctoks = children.select(
        "parent_id", "child_idx", tok(F.col("child_text")).alias("_toks")
    )
    # Child corpus stats: N over ALL children (empty-token ones included),
    # avgdl over the same set.
    stats = ctoks.agg(
        F.count(F.lit(1)).cast("long").alias("n_child"),
        F.avg(F.size("_toks")).alias("avgdl"),
    ).collect()[0]
    n_child, avgdl = int(stats["n_child"]), float(stats["avgdl"] or 0.0)

    ctf = (
        ctoks.select(
            "parent_id",
            "child_idx",
            F.size("_toks").cast("long").alias("cdl"),
            F.explode("_toks").alias("term"),
        )
        .groupBy("parent_id", "child_idx", "cdl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    cdf = ctf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))

    q_terms = (
        queries.select("query_id", F.explode(tok(F.col("content"))).alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("qtf"))
    )
    child_scores = (
        ctf.join(cdf, "term")
        .join(F.broadcast(q_terms), "term")
        .groupBy("query_id", "parent_id", "child_idx")
        .agg(
            F.sum(
                F.col("qtf")
                * bm25_col(
                    F.col("tf"), F.col("df"), F.col("cdl"), n_child, avgdl, k1, b
                )
            ).alias("child_score")
        )
    )
    agg = {"max": F.max, "sum": F.sum, "avg": F.avg}[score_mode]
    parents = (
        child_scores.groupBy("query_id", "parent_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_children"),
            agg("child_score").alias("score"),
        )
        .filter(F.col("n_children") >= min_children)
    )
    ranked = topk(
        parents.select(
            "query_id", F.col("parent_id").alias("doc_id"), "score"
        ),
        k,
    ).withColumnRenamed("doc_id", "parent_id")
    return ranked.join(
        parents.select("query_id", "parent_id", "n_children"),
        ["query_id", "parent_id"],
    ).select("query_id", "rank", "parent_id", "n_children", "score")
