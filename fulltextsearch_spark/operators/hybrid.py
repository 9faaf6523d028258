"""Hybrid retrieval: rank fusion of independent ranked lists.

Modern engines fuse a lexical ranking (BM25) with other signals — a dense
embedding retriever, or a query-independent authority prior (PageRank was
built for exactly this). The reference engine ranks with one scorer at a
time (``/root/reference/src/main.cpp:41-49`` picks bm25 OR tf-idf); fusion
is the natural completion of that surface once both this package's lexical
path (:mod:`.query`/:mod:`.wand`) and its link-graph/ANN paths exist.

Reciprocal-rank fusion (RRF; Cormack, Clarke & Buettcher, SIGIR 2009) is
the standard scoreless combiner: ``score(d) = Σ_lists w_i / (rrf_k +
rank_i(d))``, summed over the lists that ranked ``d``. It needs no score
calibration between lists — only ranks — which is why it is the default
hybrid mode in production engines.

Scale shape: each input is already a per-query top-k list (k rows per
query), so the fusion union + groupBy touches ``lists × k × n_queries``
rows — trivially small next to the retrieval that produced them; the only
wide op is one hash aggregate on ``(query_id, doc_id)``. A query-
independent static prior (PageRank top-k, quality score) is a ≤k-row
broadcast replicated per query.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fulltextsearch_spark.operators.query import topk

__all__ = ["rrf_fuse", "static_prior_per_query"]


def rrf_fuse(
    lists: Sequence[DataFrame],
    rrf_k: int = 60,
    k: int = 10,
    weights: Sequence[float] | None = None,
) -> DataFrame:
    """Fuse ranked lists ``(query_id, rank, doc_id)`` into a top-k.

    Returns ``(query_id, rank, doc_id, score)`` with ``score = Σ w_i /
    (rrf_k + rank_i)`` over the lists containing the doc; ties break on
    ``doc_id`` ascending (deterministic, same policy as the lexical path).
    ``rrf_k = 60`` is the constant from the original paper. Ranks are
    integers, so fused scores are exact sums of identical rationals — an
    oracle replaying the same ranks reproduces them bit-for-bit.
    """
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    if weights is not None and len(weights) != len(lists):
        raise ValueError("weights must match lists 1:1")
    parts = [
        df.select(
            "query_id",
            "doc_id",
            (
                F.lit(float(weights[i]) if weights is not None else 1.0)
                / (F.lit(rrf_k) + F.col("rank").cast("double"))
            ).alias("_c"),
        )
        for i, df in enumerate(lists)
    ]
    fused = (
        reduce(DataFrame.unionByName, parts)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_c").alias("score"))
    )
    return topk(fused, k)


def static_prior_per_query(
    prior: DataFrame,
    query_ids: DataFrame,
    order_col: str,
    k: int = 10,
) -> DataFrame:
    """Turn a query-independent ``(doc_id, <order_col>)`` prior into a per-
    query ranked list ``(query_id, rank, doc_id)`` ready for :func:`rrf_fuse`.

    The prior's global top-k is taken first (``orderBy`` + ``limit`` →
    TakeOrderedAndProject, distributed partial top-k — no single-partition
    window over the full table); the ≤k survivors are ranked ONCE (packed
    array sort + posexplode — no window at all, and no recomputing an
    identical rank per query over the crossJoin output) and the ranked
    triple is broadcast to every query id.
    """
    head = prior.select("doc_id", order_col).orderBy(
        F.desc(order_col), F.asc("doc_id")
    ).limit(k)
    cmp = lambda a, b: (  # noqa: E731
        F.when(a[order_col] > b[order_col], -1)
        .when(a[order_col] < b[order_col], 1)
        .when(a["doc_id"] < b["doc_id"], -1)
        .when(a["doc_id"] > b["doc_id"], 1)
        .otherwise(0)
        .cast("int")
    )
    ranked = (
        head.agg(F.collect_list(F.struct(order_col, "doc_id")).alias("xs"))
        .select(F.posexplode(F.array_sort("xs", cmp)).alias("pos", "x"))
        .select((F.col("pos") + 1).alias("rank"), F.col("x.doc_id").alias("doc_id"))
    )
    return query_ids.select("query_id").distinct().crossJoin(F.broadcast(ranked))
