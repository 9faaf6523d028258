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

__all__ = ["cms_build", "cms_estimate"]


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
