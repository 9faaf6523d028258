"""Learning-to-rank: closed-form ridge regression over retrieval features.

The pointwise-linear member of the LTR family (the shape Lucene/Solr ship
as the 'linear model' in their LTR contribs, and the classic first stage
of Burges et al.'s feature-based ranking line): score a (query, doc)
candidate by ``w · [bm25, dl/avgdl, 1]`` with ``w`` fit by L2-regularized
least squares against graded relevance labels. With a fixed 2-feature +
intercept design the normal equations are a 3x3 system, so the fit has a
CLOSED FORM — the explicit adjugate/determinant solve — and that is the
whole point of this implementation: training is ONE distributed aggregate
(the nine Gram/moment sums), and the solve is a fixed dag of +,-,*,/ on
those sums, written ONCE and mirrored verbatim in the SQL oracle, so the
learned weights — not just the final ranking — replay across engines.
No iterations, no LAPACK, no driver-side matrix library in the loop.

Scale shape: the feature pass is the engine's standard scored-candidates
plan (broadcast query probe, one per-(query, doc) aggregate); the Gram
aggregate collapses everything to ONE row with map-side partials
(shuffle = 9 doubles x tasks); scoring re-broadcasts the 1-row weight
frame. Ridge lambda > 0 keeps the system nonsingular even under
colinear features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fulltextsearch_spark.config import DEFAULT_CONFIG, EngineConfig
from fulltextsearch_spark.operators.index_build import IndexTables
from fulltextsearch_spark.operators.query import (
    _scored_candidates,
    query_terms,
    topk,
)

__all__ = ["ltr_features", "ridge_weights", "search_ltr"]


def ltr_features(
    index: IndexTables,
    queries: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """(query_id, doc_id, f_bm25, f_dlr, label) for every candidate pair.

    ``f_bm25`` = the exact BM25 accumulation, ``f_dlr`` = dl/avgdl (the
    length prior), ``label`` = number of distinct query terms the doc
    matches — the same deterministic graded relevance the rank-eval entry
    derives via the percolator (a stand-in for click/editorial labels,
    which at scale arrive as an external (query_id, doc_id, grade) table
    and drop in unchanged).
    """
    q_terms = query_terms(queries, stem=cfg.stem)
    scored = _scored_candidates(index, q_terms, cfg, "bm25", with_matches=True)
    return scored.join(index.doc_stats, "doc_id").select(
        "query_id",
        "doc_id",
        F.col("score").alias("f_bm25"),
        (F.col("dl").cast("double") / F.lit(float(index.avgdl))).alias("f_dlr"),
        F.col("n_matched").cast("double").alias("label"),
    )


def ridge_weights(features: DataFrame, l2: float = 0.1) -> DataFrame:
    """One-row (w1, w2, w0, det): ridge solve of label ~ w1*f_bm25 +
    w2*f_dlr + w0 via the explicit 3x3 adjugate.

    The Gram matrix A = X'X + l2*I (intercept penalized too — documented
    choice that keeps A = moments + l2 on the whole diagonal) and moment
    vector b = X'y reduce to nine sums in ONE aggregate; the cofactor
    expressions below are the entire solver. ``det`` is carried out so a
    caller (or test) can assert conditioning.
    """
    if l2 <= 0:
        raise ValueError("l2 must be > 0 (keeps the normal equations nonsingular)")
    x1, x2, y = F.col("f_bm25"), F.col("f_dlr"), F.col("label")
    g = features.agg(
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x1).alias("s1"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(x2).alias("s2"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1 * y).alias("p"),
        F.sum(x2 * y).alias("q"),
        F.sum(y).alias("r"),
    )
    lam = F.lit(float(l2))
    a, b, c = F.col("s11") + lam, F.col("s12"), F.col("s1")
    d, e = F.col("s22") + lam, F.col("s2")
    f = F.col("n") + lam
    c11 = d * f - e * e
    c12 = -(b * f - e * c)
    c13 = b * e - d * c
    c22 = a * f - c * c
    c23 = -(a * e - c * b)
    c33 = a * d - b * b
    det = a * c11 + b * c12 + c * c13
    p, q, r = F.col("p"), F.col("q"), F.col("r")
    return g.select(
        ((c11 * p + c12 * q + c13 * r) / det).alias("w1"),
        ((c12 * p + c22 * q + c23 * r) / det).alias("w2"),
        ((c13 * p + c23 * q + c33 * r) / det).alias("w0"),
        det.alias("det"),
    )


def search_ltr(
    index: IndexTables,
    queries: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    l2: float = 0.1,
    k: int | None = None,
    labels: DataFrame | None = None,
) -> DataFrame:
    """Train on (features, labels) and re-rank: (query_id, rank, doc_id, score).

    With ``labels=None`` the percolator-style ``label`` column of
    :func:`ltr_features` is used (self-supervised demo mode); pass an
    external (query_id, doc_id, label) frame to train on real judgments —
    candidates absent from it get label 0.
    """
    feats = ltr_features(index, queries, cfg)
    if labels is not None:
        ext = labels.select(
            "query_id", "doc_id", F.col("label").cast("double").alias("_ext")
        )
        feats = feats.drop("label").join(ext, ["query_id", "doc_id"], "left").select(
            "query_id",
            "doc_id",
            "f_bm25",
            "f_dlr",
            F.coalesce("_ext", F.lit(0.0)).alias("label"),
        )
    w = ridge_weights(feats, l2)
    scored = feats.crossJoin(F.broadcast(w)).select(
        "query_id",
        "doc_id",
        (
            F.col("w1") * F.col("f_bm25")
            + F.col("w2") * F.col("f_dlr")
            + F.col("w0")
        ).alias("score"),
    )
    return topk(scored, k if k is not None else cfg.k)
