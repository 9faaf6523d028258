"""Percolator: reverse search — match incoming documents against stored queries.

The Elasticsearch percolate query (and Lucene's ``MemoryIndex`` alerting
pattern): a registry of saved queries is matched against each new document,
answering "which standing alerts does this doc trigger?". Semantics here are
boolean-AND percolation — a document matches a stored query iff it contains
EVERY distinct term of that query (``minimum_should_match=100%``), with an
optional ``min_match`` relaxation mirroring
:func:`~fulltextsearch_spark.operators.query.search_conjunctive`.

Scale shape: the query registry is the small side — tokenized once and
**broadcast** (a registry of even 10^6 alert queries is a few hundred MB of
terms; far under the corpus). Documents stream through a single map-side
pass: tokenize (Arrow), distinct terms per doc, hash-probe the broadcast
term table, then one partial-aggregated groupBy per (doc, query) — the only
shuffle, keyed on the doc, sized by matched pairs, never by the corpus
vocabulary. This is the plan you want for percolating a 100 TB crawl
against an alert registry: embarrassingly parallel over doc splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fulltextsearch_spark.config import DEFAULT_CONFIG, EngineConfig
from fulltextsearch_spark.functions.tokenizer import tokenize_udf
from fulltextsearch_spark.operators.query import query_terms

__all__ = ["percolate"]


def percolate(
    docs: DataFrame,
    stored_queries: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    min_match: int | None = None,
) -> DataFrame:
    """docs(doc_id, text) x stored_queries(query_id, content) ->
    (query_id, doc_id, n_matched) — one row per (stored query, doc) the doc
    triggers.

    ``n_matched`` counts distinct query terms present in the doc; a row is
    kept when it reaches the query's distinct-term count (boolean AND), or
    ``min(min_match, n_q)`` when ``min_match`` is given.
    """
    q_terms = query_terms(stored_queries, stem=cfg.stem).select("query_id", "term")
    need = q_terms.groupBy("query_id").agg(F.count(F.lit(1)).alias("_n_q"))
    if min_match is not None:
        need = need.select(
            "query_id", F.least(F.lit(min_match), F.col("_n_q")).alias("_n_q")
        )

    # per-doc term dedup is map-side (array_distinct on the token array) —
    # no corpus-wide distinct shuffle; the groupBy below is the only exchange.
    tok = tokenize_udf(cfg.stem)
    doc_terms = docs.select(
        "doc_id", F.explode(F.array_distinct(tok(F.col("text")))).alias("term")
    )
    matched = (
        doc_terms.join(F.broadcast(q_terms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        matched.join(F.broadcast(need), "query_id")
        .filter(F.col("n_matched") >= F.col("_n_q"))
        .select("query_id", "doc_id", "n_matched")
    )
