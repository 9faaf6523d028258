"""Deduplication suite for large-scale training-data pipelines.

Not in the reference (it is a search engine); these are the standard
web-corpus dedup operators a 100 TB pipeline needs, each built Spark-first:

* :func:`exact_dedup` — hash groupBy; one shuffle on a 16-byte key.
* :func:`minhash_signatures` + :func:`minhash_lsh_pairs` — character-shingle
  MinHash (deterministic multiply-shift permutations over crc32+splitmix64
  base hashes, fully numpy-vectorized per Arrow batch) banded into LSH
  buckets; candidate pairs come from a bucket self-join, verified by
  signature agreement. Giant buckets (boilerplate pages) are skipped with an
  explicit cap — at web scale an all-identical bucket would otherwise emit
  O(n^2) pairs from one task.
* :func:`simhash_signatures` + :func:`simhash_neardup_pairs` — 64-bit
  SimHash over tokens weighted by tf; near-dup candidates via 4x16-bit band
  equality (pigeonhole: hamming <= 3 guarantees a shared band), verified with
  ``bit_count(xor)``.
* :func:`ngram_jaccard_pairs` — exact character-k-shingle Jaccard via a
  shingle inverted index join (the small-scale oracle for the MinHash path).

All heavy work is either JVM columnar (joins/groupBy) or Arrow-batched numpy;
no per-row Python UDFs.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "simhash_neardup_pairs",
    "ngram_jaccard_pairs",
]

_MERSENNE = np.uint64((1 << 61) - 1)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public-domain splitmix64 finalizer)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct 64-bit hashes of the k-char shingles of ``text``."""
    data = text.encode("utf-8", errors="replace")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    crcs = {zlib.crc32(data[i: i + k]) for i in range(len(data) - k + 1)}
    return _splitmix64(np.fromiter(crcs, dtype=np.uint64, count=len(crcs)))


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    return a, b


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(text_hash, dup_count, keep_doc_id) — exact duplicate groups."""
    return docs.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.count(F.lit(1)).cast("long").alias("dup_count"),
        F.min("doc_id").cast("long").alias("keep_doc_id"),
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 128,
    shingle_k: int = 5,
    seed: int = 1,
) -> DataFrame:
    """(doc_id, sig ARRAY<LONG>) — MinHash signature per document.

    Permutations are (a*h + b) mod 2^61-1 over splitmix64(crc32(shingle)) —
    deterministic across executors/restarts (never Python's salted hash()).
    """
    a, b = _perm_params(num_perm, seed)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            h = _shingle_hashes(t if isinstance(t, str) else "", shingle_k)
            # num_perm x n_shingles, min over shingles
            vals = (a[:, None] * (h[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
            out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), _sig(F.col(text_col)).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    threshold: float = 0.8,
    seed: int = 1,
    max_bucket: int = 1000,
) -> DataFrame:
    """(doc_id_a, doc_id_b, est_jaccard) near-duplicate pairs, a < b.

    bands x rows = num_perm; a pair colliding in any band becomes a
    candidate; est_jaccard = fraction of agreeing signature positions.
    Buckets larger than ``max_bucket`` are dropped (boilerplate guard) — at
    scale those are exact-dup clusters better handled by exact_dedup first.
    """
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    rows = num_perm // bands
    sigs = minhash_signatures(docs, text_col, num_perm, shingle_k, seed).persist()

    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[F.slice("sig", i * rows + 1, rows) for i in range(bands)]
            )
        ).alias("band", "band_sig"),
    ).select(
        "doc_id", "band", F.sha2(F.concat_ws(",", F.col("band_sig").cast("array<string>")), 256).alias("bkey")
    )
    # boilerplate guard: skip giant buckets
    sized = banded.groupBy("band", "bkey").agg(
        F.collect_list("doc_id").alias("ids"), F.count(F.lit(1)).alias("n")
    ).filter((F.col("n") >= 2) & (F.col("n") <= max_bucket))
    pairs = (
        sized.select(F.explode("ids").alias("a"), F.col("ids"))
        .select("a", F.explode("ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    est = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("double") / F.lit(float(num_perm))
    verified = (
        pairs.join(sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sa")), "a")
        .join(sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sb")), "b")
        .select(
            F.col("a").alias("doc_id_a"),
            F.col("b").alias("doc_id_b"),
            est.alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    return verified


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", seed: int = 2
) -> DataFrame:
    """(doc_id, simhash LONG) — 64-bit SimHash over whitespace tokens x tf."""
    seed_mix = np.uint64(_splitmix64(np.array([seed], dtype=np.uint64))[0])

    @pandas_udf(T.LongType())
    def _sim(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = t.lower().split() if isinstance(t, str) else []
            counts: dict[str, int] = {}
            for tok in toks:
                counts[tok] = counts.get(tok, 0) + 1
            if not counts:
                out[i] = 0
                continue
            hs = np.empty(len(counts), dtype=np.uint64)
            ws = np.empty(len(counts), dtype=np.float64)
            for j, (tok, c) in enumerate(counts.items()):
                hv = memo.get(tok)
                if hv is None:
                    hv = int(
                        _splitmix64(
                            np.array([zlib.crc32(tok.encode()) ^ int(seed_mix)], dtype=np.uint64)
                        )[0]
                    )
                    memo[tok] = hv
                hs[j] = hv
                ws[j] = c
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.float64
            )
            acc = ((bits * 2.0 - 1.0) * ws[:, None]).sum(axis=0)
            sig = np.bitwise_or.reduce(
                (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
            )
            out[i] = np.array([sig], dtype=np.uint64).astype(np.int64)[0]  # 2's-compl.
        return pd.Series(out)

    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), _sim(F.col(text_col)).alias("simhash")
    )


def simhash_neardup_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3, seed: int = 2
) -> DataFrame:
    """(doc_id_a, doc_id_b, hamming) pairs with hamming(simhash) <= 3.

    4 bands of 16 bits: by pigeonhole any pair within hamming 3 shares at
    least one exact band — candidates come from 4 cheap equi-joins, verified
    with bit_count(a XOR b). Exact (no recall loss) for max_hamming <= 3.
    """
    if max_hamming > 3:
        raise ValueError("4x16 banding is only exact for max_hamming <= 3")
    sigs = simhash_signatures(docs, text_col, seed).persist()
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("band", "chunk"),
    )
    a = chunks.select(
        F.col("doc_id").alias("doc_id_a"), F.col("simhash").alias("sig_a"), "band", "chunk"
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_id_b"), F.col("simhash").alias("sig_b"), "band", "chunk"
    )
    cand = (
        a.join(b, ["band", "chunk"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_id_a", "doc_id_b", "hamming")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    shingle_k: int = 5,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(doc_id_a, doc_id_b, jaccard) — exact character-k-shingle Jaccard.

    Exact inverted-index join: candidates share >= 1 shingle. At web scale,
    pass ``max_shingle_df`` to drop boilerplate shingles from candidate
    generation (union sizes stay exact; recall drops only for pairs whose
    *every* shared shingle is boilerplate) — the exact path is the oracle for
    MinHash, so the default keeps full exactness.
    """
    n = F.length(text_col) - F.lit(shingle_k - 1)
    shingles = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                    lambda i: F.col(text_col).substr(i, F.lit(shingle_k)),
                )
            )
        ).alias("shingle"),
    )
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("size"))
    cand_src = shingles
    if max_shingle_df is not None:
        hot = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf")).filter(
            F.col("sdf") > max_shingle_df
        )
        cand_src = shingles.join(F.broadcast(hot), "shingle", "left_anti")
    a = cand_src.select(F.col("doc_id").alias("doc_id_a"), "shingle")
    b = cand_src.select(F.col("doc_id").alias("doc_id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("sa") + F.col("sb") - F.col("inter")
    ).cast("double")
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("size").alias("sa")), "doc_id_a")
        .join(sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("size").alias("sb")), "doc_id_b")
        .select("doc_id_a", "doc_id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
