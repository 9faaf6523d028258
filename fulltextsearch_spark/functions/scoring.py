"""BM25 / TF-IDF scoring — Column expressions (JVM codegen) + numpy kernels.

Formulas pinned to the reference:

* IDF = ln((N - df + 0.5)/(df + 0.5) + 1)
  (``/root/reference/src/scoring/scoring_function.hpp:65-69``)
* BM25 = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  (``/root/reference/src/scoring/bm25.cpp:11-16``)
* TF-IDF = (tf/dl) * idf (``/root/reference/src/scoring/tf_idf.cpp:7-15``)

All math is IEEE-754 double in both paths, so Column-expression results and
numpy results are bit-identical to the C++ engine's per-term scores.

The Column-expression path is the default (whole-stage codegen, zero Python);
the numpy kernels back the block-max WAND Arrow UDF where per-block skip
logic genuinely needs imperative code.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "idf_col",
    "bm25_col",
    "tfidf_col",
    "lm_dirichlet_col",
    "lm_jm_col",
    "dfr_inl2_col",
    "idf_np",
    "bm25_np",
    "tfidf_np",
]


def idf_col(df_col: Column, n_docs: float) -> Column:
    """IDF as a Column expression; n_docs is a broadcast scalar."""
    return F.log((F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)) + F.lit(1.0))


def bm25_col(
    tf_col: Column,
    df_col: Column,
    dl_col: Column,
    n_docs: float,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> Column:
    tf = tf_col.cast("double")
    denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dl_col.cast("double") / F.lit(float(avgdl))))
    return idf_col(df_col.cast("double"), n_docs) * (tf * F.lit(k1 + 1.0) / denom)


def tfidf_col(tf_col: Column, df_col: Column, dl_col: Column, n_docs: float) -> Column:
    return (tf_col.cast("double") / dl_col.cast("double")) * idf_col(df_col.cast("double"), n_docs)


def lm_dirichlet_col(
    tf_col: Column,
    cf_col: Column,
    dl_col: Column,
    total_tokens: float,
    mu: float = 2000.0,
) -> Column:
    """Dirichlet-smoothed query-likelihood per-term score (Zhai & Lafferty,
    SIGIR 2001, eq. 6 rank-equivalent form; the Lucene
    ``LMDirichletSimilarity`` semantics):

        max(0, ln(1 + tf / (mu * p(t|C))) + ln(mu / (dl + mu)))

    with the collection language model ``p(t|C) = cf / total_tokens`` (cf =
    the term's collection frequency, total_tokens = corpus token count). The
    per-term clamp at 0 keeps long documents' negative normalizer from
    rewarding a *miss*, matching Lucene's scorer.
    """
    tf = tf_col.cast("double")
    p_c = cf_col.cast("double") / F.lit(float(total_tokens))
    dl = dl_col.cast("double")
    raw = F.log(F.lit(1.0) + tf / (F.lit(float(mu)) * p_c)) + F.log(
        F.lit(float(mu)) / (dl + F.lit(float(mu)))
    )
    return F.greatest(F.lit(0.0), raw)


def lm_jm_col(
    tf_col: Column,
    cf_col: Column,
    dl_col: Column,
    total_tokens: float,
    lam: float = 0.1,
) -> Column:
    """Jelinek-Mercer-smoothed query likelihood per-term score (Lucene
    ``LMJelinekMercerSimilarity``; Zhai & Lafferty, SIGIR 2001):

        ln(1 + ((1 - lambda) * tf/dl) / (lambda * p(t|C)))

    Linear interpolation of the document and collection models —
    ``lambda`` near 0 trusts the document (short queries), near 1 the
    collection (long, verbose queries). Shares the ``cf`` statistic with
    the Dirichlet path; always > 0 on a match, so no clamp is needed.
    """
    tf = tf_col.cast("double")
    p_c = cf_col.cast("double") / F.lit(float(total_tokens))
    return F.log(
        F.lit(1.0)
        + (F.lit(1.0 - lam) * tf / dl_col.cast("double")) / (F.lit(lam) * p_c)
    )


def dfr_inl2_col(
    tf_col: Column,
    df_col: Column,
    dl_col: Column,
    n_docs: float,
    avgdl: float,
    c: float = 1.0,
) -> Column:
    """DFR InL2 per-term score (Amati & van Rijsbergen, TOIS 2002; Lucene
    ``DFRSimilarity(BasicModelIn, AfterEffectL, NormalizationH2)``):

        tfn  = tf * log2(1 + c * avgdl/dl)          (H2 length normalization)
        score = tfn/(tfn + 1) * log2((N + 1)/(df + 0.5))   (I(n) basic model,
                                                            L after-effect)
    """
    tf = tf_col.cast("double")
    tfn = tf * F.log2(F.lit(1.0) + F.lit(float(c) * float(avgdl)) / dl_col.cast("double"))
    return (tfn / (tfn + F.lit(1.0))) * F.log2(
        F.lit(float(n_docs) + 1.0) / (df_col.cast("double") + F.lit(0.5))
    )


# --- numpy kernels (used by the WAND Arrow UDF and the pure-Python oracle) --


def idf_np(df: np.ndarray, n_docs: float) -> np.ndarray:
    return np.log((float(n_docs) - df.astype(np.float64) + 0.5) / (df.astype(np.float64) + 0.5) + 1.0)


def bm25_np(
    tf: np.ndarray,
    idf: np.ndarray,
    dl: np.ndarray,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> np.ndarray:
    tf = tf.astype(np.float64)
    denom = tf + k1 * ((1.0 - b) + b * (dl.astype(np.float64) / float(avgdl)))
    return idf * (tf * (k1 + 1.0) / denom)


def tfidf_np(tf: np.ndarray, idf: np.ndarray, dl: np.ndarray) -> np.ndarray:
    return (tf.astype(np.float64) / dl.astype(np.float64)) * idf
