"""Ranking evaluation: nDCG@k, MRR and precision@k over a result run.

The Elasticsearch ``_rank_eval`` API (and trec_eval's core metrics): given a
ranked run ``(query_id, rank, doc_id)`` and graded relevance judgments
``qrels(query_id, doc_id, rel)``, compute per query:

* ``ndcg``  — exponential-gain DCG ``sum((2^rel - 1) / log2(rank + 1))``
  over the top-k, normalized by the ideal DCG of the query's judgments
  (rel DESC, doc_id ASC tiebreak), 0 when the query has no relevant doc;
* ``mrr``   — ``1 / rank`` of the first hit with ``rel > 0`` in the top-k,
  0 when none;
* ``precision`` — fraction of the top-k with ``rel > 0`` (ES divides by k,
  counting unjudged/short pages against the system).

Scale shape: runs are ``|queries| x k`` rows and qrels a few judgments per
query — both tiny relative to any corpus, so every join here is broadcast-
sized and the per-query aggregates are one partial-combined groupBy. The
expensive part of evaluation is producing the run, not scoring it; this
operator composes with any of the engine's search paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rank_eval"]


def _gain(rel_col) -> F.Column:
    return F.pow(F.lit(2.0), rel_col.cast("double")) - F.lit(1.0)


def _discount(rank_col) -> F.Column:
    return F.log2(rank_col.cast("double") + F.lit(1.0))


def rank_eval(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """run(query_id, rank, doc_id) x qrels(query_id, doc_id, rel) ->
    (query_id, ndcg, mrr, precision) — one row per query in the run.

    Unjudged run docs count rel=0. ``rank`` must be 1-based and dense per
    query (the engine's topk contract).
    """
    top = run.filter(F.col("rank") <= k).select("query_id", "rank", "doc_id")
    judged = top.join(qrels, ["query_id", "doc_id"], "left").select(
        "query_id",
        "rank",
        F.coalesce(F.col("rel"), F.lit(0)).cast("double").alias("rel"),
    )
    per_q = judged.groupBy("query_id").agg(
        F.sum(_gain(F.col("rel")) / _discount(F.col("rank"))).alias("_dcg"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("_first_rel"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("_n_rel"),
    )

    # ideal DCG from the judgments alone (rel DESC, doc_id ASC), top-k
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (
        qrels.filter(F.col("rel") > 0)
        .withColumn("_irank", F.row_number().over(w))
        .filter(F.col("_irank") <= k)
        .groupBy("query_id")
        .agg(F.sum(_gain(F.col("rel")) / _discount(F.col("_irank"))).alias("_idcg"))
    )

    return (
        per_q.join(ideal, "query_id", "left")
        .select(
            "query_id",
            F.when(
                F.coalesce(F.col("_idcg"), F.lit(0.0)) > 0.0,
                F.col("_dcg") / F.col("_idcg"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
            F.coalesce(F.lit(1.0) / F.col("_first_rel"), F.lit(0.0)).alias("mrr"),
            (F.col("_n_rel").cast("double") / F.lit(float(k))).alias("precision"),
        )
    )
