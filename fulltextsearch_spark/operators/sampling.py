"""Training-mix sampling: temperature weights and deterministic downsampling.

Two standard pre-training data-mixing stages:

* **Temperature mixing weights** (mT5 / XLM-R style): given per-bucket doc
  counts, the sampling proportion of bucket *i* is ``p_i^alpha / sum_j
  p_j^alpha`` with ``p_i`` the bucket's corpus share. ``alpha=1`` keeps the
  natural distribution, ``alpha -> 0`` approaches uniform — the standard
  lever for up-weighting low-resource languages/domains.

* **Deterministic stratified sampling**: keep a doc iff
  ``hash(doc) mod 2^32 < rate * 2^32``, with a per-bucket rate. The hash is
  the first 8 hex digits of ``md5(key)`` — reproducible across runs,
  engines, and partitionings (no RNG state, unlike ``df.sample``), and
  cheap to replay in SQL for auditing exactly which docs a mix kept. This
  is how production corpus mixes stay re-buildable: the sample is a pure
  function of the data.

Scale shape: weights are one map-side-partial groupBy over the bucket key
(bucket cardinality, not corpus, crosses the exchange). The sampler is a
pure Column filter — zero shuffles, runs at scan speed; the per-bucket rate
table is a broadcast dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dsir_weights", "group_split", "mix_weights", "stratified_sample"]

_HASH_SPACE = float(1 << 32)


def mix_weights(docs: DataFrame, key_col: str, alpha: float = 0.3) -> DataFrame:
    """(key, n_docs, p, weight, expected_docs) — temperature-scaled sampling
    proportions per bucket.

    ``p`` is the natural share, ``weight = p^alpha / sum(p^alpha)`` the
    target mix proportion, ``expected_docs = weight * total`` the bucket's
    doc budget under the mix.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    counts = docs.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = counts.agg(
        F.sum("n_docs").alias("_total"),
    )
    powed = counts.crossJoin(F.broadcast(tot)).withColumn(
        "p", F.col("n_docs").cast("double") / F.col("_total").cast("double")
    ).withColumn("_pa", F.pow(F.col("p"), F.lit(float(alpha))))
    z = powed.agg(F.sum("_pa").alias("_z"))
    return (
        powed.crossJoin(F.broadcast(z))
        .withColumn("weight", F.col("_pa") / F.col("_z"))
        .select(
            "key",
            "n_docs",
            "p",
            "weight",
            (F.col("weight") * F.col("_total").cast("double")).alias("expected_docs"),
        )
    )


def sample_hash_col(key_col) -> F.Column:
    """Deterministic uniform-ish BIGINT in [0, 2^32): the first 8 hex digits
    of md5(key) — engine-portable and replayable in SQL."""
    return F.conv(F.substring(F.md5(key_col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def stratified_sample(
    docs: DataFrame,
    rates: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each doc iff ``md5_hash32(id) < rate(bucket) * 2^32``.

    ``rates`` is a ``(key, rate)`` table (rate in [0, 1]) — typically
    ``mix_weights`` output rescaled by the global budget. Returns the input
    rows that survive, plus the ``sample_hash`` column for audit. The
    decision depends only on ``id_col``'s value, so re-running on a
    differently-partitioned copy of the corpus keeps EXACTLY the same docs.
    """
    h = sample_hash_col(F.col(id_col))
    return (
        docs.withColumn("sample_hash", h)
        .join(F.broadcast(rates.select(F.col("key"), "rate")), F.col(key_col) == F.col("key"))
        .filter(F.col("sample_hash").cast("double") < F.col("rate") * F.lit(_HASH_SPACE))
        .drop("key", "rate")
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    alpha: float = 0.5,
    text_col: str = "text",
    stem: bool = False,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
    per-document log importance weight of a TARGET domain over the RAW
    corpus, under hashed-bigram bag-of-words language models.

    Each document is a bag of hashed bigram features (``md5(w1 w2)`` first
    8 hex digits mod ``n_buckets`` — the same engine-portable hash the
    stratified sampler uses, so the oracle replays it exactly). Two
    add-``alpha``-smoothed categorical models are fit — one on ``target``
    (the domain to up-weight), one on the full ``docs`` corpus — and a
    doc's weight is the mean per-feature log-likelihood ratio::

        logw(d) = mean_{f in d} [ log p_target(f) - log p_raw(f) ]

    Resample by keeping the top-N docs by ``logw`` (or Gumbel-top-k with an
    external deterministic key). Returns ``(doc_id, n_feats, logw)`` for
    every doc, ``logw = 0`` for docs with fewer than 2 tokens.

    Scale shape: feature extraction is narrow (tokenize + arrays_zip of
    shifted slices, one stage); both LMs are ``n_buckets``-row aggregates
    (map-side partials, then a BROADCAST of the tiny bucket tables — unlike
    the raw-bigram LM, the hashed model is bounded by construction, which
    is exactly why DSIR hashes); scoring is one broadcast join + per-doc
    hash aggregate. The target table is typically a small curated sample —
    it never joins the corpus, it only fits a 1024-row model.
    """
    from fulltextsearch_spark.functions.tokenizer import tokenize_udf

    tok = tokenize_udf(do_stem=stem)

    def feats(frame: DataFrame) -> DataFrame:
        toks = frame.select("doc_id", tok(F.col(text_col)).alias("toks"))
        n = F.size("toks")
        pairs = toks.where(n >= 2).select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n - 1).alias("w1"),
                    F.slice("toks", 2, n - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        key = F.concat_ws(" ", F.col("bg.w1"), F.col("bg.w2"))
        bucket = (
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
            % F.lit(n_buckets)
        )
        return pairs.select("doc_id", bucket.alias("feat"))

    import math

    def lm(feature_frame: DataFrame, name: str) -> tuple[DataFrame, float]:
        """(bucket log-prob table, log-prob floor for unseen buckets)."""
        counts = feature_frame.groupBy("feat").agg(
            F.count(F.lit(1)).cast("double").alias("_c")
        )
        denom = float(feature_frame.count()) + alpha * n_buckets
        table = counts.select(
            "feat", F.log((F.col("_c") + alpha) / F.lit(denom)).alias(name)
        )
        return table, math.log(alpha / denom)

    doc_feats = feats(docs)
    t_lm, t_floor = lm(feats(target), "lp_t")
    r_lm, r_floor = lm(doc_feats, "lp_r")

    scored = (
        doc_feats.join(F.broadcast(t_lm), "feat", "left")
        .join(F.broadcast(r_lm), "feat", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.avg(
                F.coalesce("lp_t", F.lit(t_floor))
                - F.coalesce("lp_r", F.lit(r_floor))
            ).alias("logw"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.round(F.coalesce("logw", F.lit(0.0)), 6).alias("logw"),
        )
    )


def group_split(
    docs: DataFrame,
    group_col,
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: split by GROUP, not by row.

    The standard evaluation-hygiene rule for web corpora (and the reason
    benchmark decontamination alone is not enough): near-duplicate pages
    live on the same site, so row-level random splits leak test content
    into train through same-domain twins. Hashing the GROUP key (e.g. the
    registered domain from ``urltools.registered_domain``, or a dedup
    cluster id from ``connected_components``) sends every member of a
    group to the SAME split.

    Assignment: ``h = md5(salt || ':' || group)`` first 8 hex digits as a
    32-bit integer; the split is the first name whose cumulative weight
    bound exceeds ``h / 2^32``. A pure function of (salt, group) — stable
    across re-runs, partitionings, and corpus growth (new docs of a known
    domain join its existing split) — and exactly SQL-replayable. Adding a
    split or reweighting reshuffles only the moved probability mass.

    Scale shape: one codegen projection, ZERO shuffles — the hash and the
    threshold CASE fuse into the scan. ``group_col`` may be a column name
    or a Column expression (pass ``registered_domain(F.col("url"))``
    directly to avoid materializing the domain).
    """
    if len(weights) != len(names) or not names:
        raise ValueError("weights and names must be same nonzero length")
    if any(w < 0 for w in weights) or sum(weights) <= 0:
        raise ValueError("weights must be non-negative with a positive sum")
    gc = F.col(group_col) if isinstance(group_col, str) else group_col
    h = sample_hash_col(F.concat(F.lit(salt + ":"), gc.cast("string")))
    total = float(sum(weights))
    expr = None
    cum = 0.0
    for w, name in zip(weights[:-1], names[:-1]):
        cum += w / total
        cond = h.cast("double") < F.lit(cum * _HASH_SPACE)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    split = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return docs.withColumn("split", split)
