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

__all__ = ["mix_weights", "stratified_sample"]

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
