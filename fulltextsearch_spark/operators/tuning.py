"""BM25 hyperparameter sweep — grid evaluation in ONE corpus probe.

The tuning loop every deployed engine runs (Elasticsearch's k1/b guidance,
Anserini's regression suites): score a validation query set under a grid of
(k1, b) settings and pick the point with the best nDCG against judgments.
The naive implementation re-runs retrieval G times; here the grid shares
everything that touches data: the postings probe, the explode, and the
per-(query, doc) aggregation happen ONCE, with one score COLUMN per grid
point (BM25's (k1, b) enter only the final per-posting arithmetic, so extra
grid points cost one fused column expression each, not a scan). The G
rankings then melt out of the score array and evaluate through the
engine's own rank_eval.

Scale shape: the one wide op is the shared per-(query, doc) aggregate —
identical to a single search — carrying G doubles per row instead of one;
ranking is a (grid, query)-partitioned WindowGroupLimit; evaluation joins
are qrels-sized. A 100-point grid over 10^12 docs costs one query batch
plus 800 bytes/candidate of aggregation state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fulltextsearch_spark.config import DEFAULT_CONFIG, EngineConfig
from fulltextsearch_spark.functions.scoring import bm25_col
from fulltextsearch_spark.operators.index_build import IndexTables
from fulltextsearch_spark.operators.query import _flat_postings, query_terms
from fulltextsearch_spark.operators.rankeval import rank_eval

__all__ = ["sweep_bm25"]


def sweep_bm25(
    index: IndexTables,
    queries: DataFrame,
    qrels: DataFrame,
    grid: list[tuple[float, float]],
    cfg: EngineConfig = DEFAULT_CONFIG,
    k: int | None = None,
) -> DataFrame:
    """(k1, b, ndcg, mrr, precision) — mean metrics per grid point.

    Means are over the queries present in each point's run (a query whose
    terms all miss the index contributes to no point). Ties across grid
    points are the caller's pick; sort by (ndcg DESC, k1, b) for a
    deterministic winner.
    """
    if not grid:
        raise ValueError("grid must be non-empty")
    kk = k if k is not None else cfg.k
    q_terms = query_terms(queries, stem=cfg.stem)
    flat = _flat_postings(index, q_terms)
    aggs = []
    for i, (k1, b) in enumerate(grid):
        s = bm25_col(
            F.col("tf"), F.col("df"), F.col("dl"),
            index.n_docs, index.avgdl, float(k1), float(b),
        )
        aggs.append(F.sum(s * F.col("qtf").cast("double")).alias(f"_s{i}"))
    scored = flat.groupBy("query_id", "doc_id").agg(*aggs)
    melted = scored.select(
        "query_id",
        "doc_id",
        F.posexplode(F.array(*[F.col(f"_s{i}") for i in range(len(grid))])).alias(
            "gid", "score"
        ),
    )
    w = Window.partitionBy("gid", "query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    run = (
        melted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("gid", "query_id", "rank", "doc_id")
    )
    evals = []
    for i, (k1, b) in enumerate(grid):
        ev = rank_eval(run.where(F.col("gid") == i).drop("gid"), qrels, k=kk)
        evals.append(
            ev.select(
                F.lit(float(k1)).alias("k1"),
                F.lit(float(b)).alias("b"),
                "ndcg",
                "mrr",
                "precision",
            )
        )
    allev = evals[0]
    for e in evals[1:]:
        allev = allev.unionByName(e)
    return allev.groupBy("k1", "b").agg(
        F.round(F.avg("ndcg"), 4).alias("ndcg"),
        F.round(F.avg("mrr"), 4).alias("mrr"),
        F.round(F.avg("precision"), 4).alias("precision"),
    )
