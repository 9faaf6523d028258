"""Vector-space-model (tf-idf cosine) ranking engine.

The reference DECLARES this engine but never implemented it — every method of
``/root/reference/src/algorithms/vsm/vector_space_model_engine.cpp:8-33``
throws ``std::runtime_error("... not yet implemented.")``. This module
completes the reference's own roadmap with classical VSM semantics over the
same logical index the other engines share:

* document weight  ``w(d,t) = (tf/dl) * idf(t)``   (the reference's TF-IDF
  weight, ``src/scoring/tf_idf.cpp:7-15``, with its BM25+-style idf
  ``src/scoring/scoring_function.hpp:65-69``)
* query weight     ``q(t)   = qtf * idf(t)``       (duplicate query tokens
  keep multiplicity, matching the accumulation rule of
  ``inverted_index_engine.cpp:116-135``)
* ``score(q,d) = sum_t w(d,t) q(t) / (||d|| * ||q||)`` — cosine over the
  corpus vocabulary; query terms absent from the corpus drop out of both the
  dot product and ``||q||`` (inner-join semantics, mirroring the reference's
  skip of unknown terms at :121-126).

Everything is Column math (no UDF beyond the shared tokenizer): the doc-norm
table is one explode + groupBy over the postings — at real scale it is a
build-time artifact (pass ``norms=`` to reuse), the same shape as
``doc_stats``. Top-k uses the deterministic (score DESC, doc_id ASC) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fulltextsearch_spark.config import DEFAULT_CONFIG, EngineConfig
from fulltextsearch_spark.operators.index_build import IndexTables
from fulltextsearch_spark.operators.query import query_terms

__all__ = ["doc_norms", "search_vsm"]


def _idf(df_col, n_docs: int):
    return F.log((F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5) + 1.0)


def _flat_weights(index: IndexTables) -> DataFrame:
    """(term, df, doc_id, w) — tf-idf weight per posting."""
    flat = index.postings.select("term", "df", F.explode("postings").alias("p")).select(
        "term",
        "df",
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.tf").alias("tf"),
        F.col("p.dl").alias("dl"),
    )
    w = (F.col("tf").cast("double") / F.col("dl")) * _idf(F.col("df"), index.n_docs)
    return flat.select("term", "df", "doc_id", w.alias("w"))


def doc_norms(index: IndexTables) -> DataFrame:
    """(doc_id, norm) — L2 norm of each document's tf-idf vector."""
    return (
        _flat_weights(index)
        .groupBy("doc_id")
        .agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    )


def search_vsm(
    index: IndexTables,
    queries: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    norms: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — cosine top-k per query."""
    if norms is None:
        norms = doc_norms(index)

    q_terms = query_terms(queries, cfg.stem)
    dft = index.postings.select("term", "df")
    qw = q_terms.join(dft, "term").select(
        "query_id",
        "term",
        (F.col("qtf").cast("double") * _idf(F.col("df"), index.n_docs)).alias("qw"),
    )
    qnorm = qw.groupBy("query_id").agg(F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("qnorm"))

    dots = (
        _flat_weights(index)
        .join(F.broadcast(qw), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    scored = (
        dots.join(norms, "doc_id")
        .join(F.broadcast(qnorm), "query_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("dot") / (F.col("norm") * F.col("qnorm"))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cfg.k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "doc_id", "score")
    )
