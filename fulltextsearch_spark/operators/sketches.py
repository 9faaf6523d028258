"""Count-min sketch over term frequencies — a mergeable frequency sketch.

The reference sizes its hash table with a HyperLogLog cardinality sketch
(``/root/reference/src/datastructures/hyperloglog.hpp:7-53``); the
count-min sketch (Cormode & Muthukrishnan 2005) is the frequency-side
companion a web-scale engine wants: fixed O(depth x width) memory per
executor, point-estimates with one-sided error (est >= exact, over-count
bounded by 2N/width at 1 - (1/2)^depth confidence), and — the property
that makes it Spark-native — **merge = cell-wise addition**, so partial
sketches combine through an ordinary hash aggregate with map-side
partials, commutatively and deterministically regardless of partitioning.

Determinism and oracle-replayability: the hash family is the repo's
standard exact-M61 machinery — Karp-Rabin base-257 of the term bytes mod
2^61-1 (:func:`~fulltextsearch_spark.functions.hashing.bytes_hashes`),
then ``((a_d * kr + b_d) mod M61) mod width`` per depth row with
:func:`_perm_params`-seeded constants. Every step is exact integer math
both in numpy (31-bit-limb mulmod) and in DuckDB HUGEINT SQL, so the
sketch contents — not just its guarantees — are bit-reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from fulltextsearch_spark.functions.hashing import bytes_hashes, perm61
from fulltextsearch_spark.operators.dedup import _perm_params

__all__ = [
    "cms_build",
    "cms_estimate",
    "hll_build",
    "hll_build_keyed",
    "hll_estimate",
    "hll_estimate_keyed",
]


def _bucket_udf(depth: int, width: int, seed: int):
    a, b = _perm_params(depth, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def buckets(terms: pd.Series) -> pd.Series:
        kr = bytes_hashes([t.encode("utf-8") for t in terms])
        # (depth, n): exact (a_d * kr + b_d) mod M61, then mod width
        rows = [
            (perm61(a[d : d + 1], b[d : d + 1], kr) % np.uint64(width)).astype(
                np.int64
            )
            for d in range(depth)
        ]
        mat = np.stack(rows, axis=1) if len(terms) else np.empty((0, depth))
        return pd.Series(list(mat))

    return buckets


def cms_build(
    term_counts: DataFrame,
    depth: int = 3,
    width: int = 64,
    seed: int = 7,
    term_col: str = "term",
    count_col: str = "cnt",
) -> DataFrame:
    """Sketch a ``(term, cnt)`` frequency table into ``(depth, bucket, total)``.

    One Arrow-batched hash pass over the (already aggregated, vocabulary-
    sized) input, then a single hash aggregate on ``(depth, bucket)`` whose
    key space is the fixed ``depth x width`` grid — the shuffle is O(grid),
    not O(vocabulary), because map-side partial aggregation collapses each
    task's contribution to at most one row per cell before the exchange.
    """
    bk = _bucket_udf(depth, width, seed)
    exploded = term_counts.select(
        F.col(count_col).alias("_c"),
        F.posexplode(bk(F.col(term_col))).alias("depth", "bucket"),
    )
    return (
        exploded.groupBy("depth", "bucket")
        .agg(F.sum("_c").cast("long").alias("total"))
    )


def cms_estimate(
    cms: DataFrame,
    terms: DataFrame,
    depth: int = 3,
    width: int = 64,
    seed: int = 7,
    term_col: str = "term",
) -> DataFrame:
    """Point-estimate each term's count: ``min`` over its depth cells.

    Returns ``(term, cms_est)`` with ``cms_est >= true count`` always
    (one-sided CMS guarantee); a term hashing only to empty cells estimates
    0. The sketch side is ``depth x width`` rows — broadcast — so lookup is
    a map-side join however large the query set is.
    """
    bk = _bucket_udf(depth, width, seed)
    probes = terms.select(
        term_col, F.posexplode(bk(F.col(term_col))).alias("depth", "bucket")
    )
    joined = probes.join(F.broadcast(cms), ["depth", "bucket"], "left")
    return (
        joined.groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("total"), F.lit(0))).cast("long").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog — the cardinality sketch the reference actually ships
# (``/root/reference/src/datastructures/hyperloglog.hpp:7-53``: 64 registers,
# leading-zero counting, harmonic mean), re-expressed so the sketch CONTENTS
# replay exactly in integer SQL.
#
# Hash layout: the M61 Karp-Rabin value is permuted once ((a*h+b) mod M61)
# and truncated to its top 48 bits (h61 // 2^13) so every downstream
# quantity stays exactly representable as a double in BOTH engines:
#   idx  = h48 // 2^(48-p)          (top p bits -> register index)
#   rest = h48 %  2^(48-p)          (< 2^42 at p=6 -> floor(log2) is exact)
#   rho  = (48-p) - floor(log2(rest))   [rest = 0 -> (48-p)+1]
# floor(log2(x)) on an exactly-representable integer is safe in IEEE double
# (the error of log2 is ~1 ulp of the RESULT, orders of magnitude below the
# distance from log2(2^k - 1) to k), so numpy and DuckDB agree bit-for-bit.
#
# Merge = per-register max, so partial sketches combine through an ordinary
# map-side-partial hash aggregate on the fixed m-row key space — the same
# Spark-native mergeability argument as the count-min sketch above.
# ---------------------------------------------------------------------------

_HLL_BITS = 48  # truncated hash width; keeps rest < 2^(48-p) << 2^53


def _rho_udf(p: int, seed: int):
    a, b = _perm_params(1, seed)

    @F.pandas_udf("struct<idx: long, rho: long>")
    def idx_rho(vals: pd.Series) -> pd.DataFrame:
        kr = bytes_hashes([v.encode("utf-8") for v in vals])
        h48 = perm61(a, b, kr) >> np.uint64(61 - _HLL_BITS)
        w = _HLL_BITS - p
        idx = (h48 >> np.uint64(w)).astype(np.int64)
        rest = (h48 & np.uint64((1 << w) - 1)).astype(np.int64)
        rho = np.full(len(vals), w + 1, dtype=np.int64)
        nz = rest > 0
        rho[nz] = w - np.floor(np.log2(rest[nz])).astype(np.int64)
        return pd.DataFrame({"idx": idx, "rho": rho})

    return idx_rho


def hll_build(
    items: DataFrame, p: int = 6, seed: int = 11, value_col: str = "term"
) -> DataFrame:
    """Sketch a value stream into ``m = 2^p`` HLL registers ``(idx, rho)``.

    Duplicates are free by construction (max is idempotent), so the input
    needs no distinct pass. One Arrow-batched hash projection, then a hash
    aggregate whose key space is the fixed register grid: each task's
    map-side partial is at most m rows, so the exchange is O(m x tasks)
    regardless of input volume — the sketch an executor would keep per
    partition and merge at the end, expressed declaratively. Registers that
    no value hashed to are absent (callers fill them as 0 via a range join).
    """
    if not 4 <= p <= 12:
        raise ValueError("require 4 <= p <= 12")
    ir = _rho_udf(p, seed)
    pair = items.select(ir(F.col(value_col).cast("string")).alias("ir"))
    return (
        pair.select(F.col("ir.idx").alias("idx"), F.col("ir.rho").alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").cast("long").alias("rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 6) -> DataFrame:
    """Collapse a register table to the raw HLL cardinality estimate.

    Returns one row ``(m, v_zero, harmonic_scaled, hll_est)``:

    * ``harmonic_scaled`` = sum over ALL m registers of ``2^(w+1 - rho)``
      with rho = 0 for empty registers and ``w = 48 - p`` — an INTEGER
      (< m * 2^(w+1), far under 2^53), equal to ``2^(w+1) * sum(2^-rho)``.
      Summing powers of two this size is exact in any order, so the value
      is deterministic under any partitioning.
    * ``hll_est`` = ``alpha_m * m^2 * 2^(w+1) / harmonic_scaled`` — the
      Flajolet et al. 2007 raw estimator. Every operand is exactly
      representable and the expression is a fixed dag of correctly-rounded
      IEEE ops, so Spark and an SQL oracle produce the identical double;
      rounded to 4 decimals for the gate. The small-range linear-counting
      correction (m * ln(m / v_zero), needing libm ln) is deliberately NOT
      folded in here — callers that want it apply it from ``v_zero``,
      which this row carries for exactly that purpose.
    """
    m = 1 << p
    w = _HLL_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    spark = registers.sparkSession
    grid = spark.range(m).select(F.col("id").alias("idx"))
    full = grid.join(registers, "idx", "left").select(
        F.coalesce("rho", F.lit(0)).alias("rho")
    )
    scale = float(1 << (w + 1))
    return full.agg(
        F.max(F.lit(m)).cast("long").alias("m"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).cast("long").alias("v_zero"),
        F.sum(F.pow(F.lit(2.0), (F.lit(w + 1) - F.col("rho")).cast("double")))
        .cast("long")
        .alias("harmonic_scaled"),
    ).select(
        "m",
        "v_zero",
        "harmonic_scaled",
        F.round(
            F.lit(alpha * m * m * scale) / F.col("harmonic_scaled").cast("double"), 4
        ).alias("hll_est"),
    )


def hll_build_keyed(
    items: DataFrame,
    key_col: str,
    p: int = 6,
    seed: int = 11,
    value_col: str = "term",
) -> DataFrame:
    """(key, idx, rho) — one HLL register set PER KEY (the ES
    ``cardinality`` aggregation under GROUP BY): same hash layout as
    :func:`hll_build`, keyed grid aggregate, at most ``2^p`` rows per key
    however large the group."""
    if not 4 <= p <= 12:
        raise ValueError("require 4 <= p <= 12")
    ir = _rho_udf(p, seed)
    pair = items.select(
        F.col(key_col).alias("key"), ir(F.col(value_col).cast("string")).alias("ir")
    )
    return (
        pair.select("key", F.col("ir.idx").alias("idx"), F.col("ir.rho").alias("rho"))
        .groupBy("key", "idx")
        .agg(F.max("rho").cast("long").alias("rho"))
    )


def hll_estimate_keyed(registers: DataFrame, p: int = 6) -> DataFrame:
    """(key, v_zero, harmonic_scaled, hll_est) per key — the keyed twin of
    :func:`hll_estimate`, computed WITHOUT a grid join: absent registers
    contribute ``2^(w+1)`` each via ``(m - n_present) * 2^(w+1)``, keeping
    every quantity the same exact integers as the single-sketch path."""
    m = 1 << p
    w = _HLL_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = float(1 << (w + 1))
    agg = registers.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("_np"),
        F.sum(F.pow(F.lit(2.0), (F.lit(w + 1) - F.col("rho")).cast("double")))
        .cast("long")
        .alias("_hp"),
    )
    harmonic = (
        F.col("_hp") + (F.lit(m) - F.col("_np")) * F.lit(1 << (w + 1))
    ).cast("long")
    return agg.select(
        "key",
        (F.lit(m) - F.col("_np")).cast("long").alias("v_zero"),
        harmonic.alias("harmonic_scaled"),
        F.round(
            F.lit(alpha * m * m * scale) / harmonic.cast("double"), 4
        ).alias("hll_est"),
    )
