"""Deduplication suite for large-scale training-data pipelines.

Not in the reference (it is a search engine); these are the standard
web-corpus dedup operators a 100 TB pipeline needs, each built Spark-first:

* :func:`exact_dedup` — hash groupBy; one shuffle on a 16-byte key.
* :func:`minhash_signatures` + :func:`minhash_lsh_pairs` — character-shingle
  MinHash: Karp-Rabin rolling shingle hashes and a true universal permutation
  family ``(a*h+b) mod 2^61-1`` (exact Mersenne arithmetic via
  :mod:`fulltextsearch_spark.functions.hashing` — no uint64 wrap), fully
  numpy-vectorized per Arrow batch, banded into LSH buckets; candidate pairs
  come from a bucket self-join, verified by signature agreement. Giant
  buckets (boilerplate pages) are skipped with an explicit cap — at web
  scale an all-identical bucket would otherwise emit O(n^2) pairs from one
  task. Every hash is SQL-expressible (DuckDB HUGEINT), so the driver
  oracle recomputes signatures/pairs independently.
* :func:`simhash_signatures` + :func:`simhash_neardup_pairs` — SimHash over
  whitespace tokens weighted by tf (token hash = same KR/M61 family, so it
  is also oracle-recomputable); near-dup candidates via 4x16-bit band
  equality (pigeonhole: hamming <= 3 guarantees a shared band), verified with
  ``bit_count(xor)``.
* :func:`ngram_jaccard_pairs` — exact character-k-shingle Jaccard via a
  shingle inverted index join (the small-scale oracle for the MinHash path).

All heavy work is either JVM columnar (joins/groupBy) or Arrow-batched numpy;
no per-row Python UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from fulltextsearch_spark.functions.hashing import (
    M61,
    bytes_hashes,
    perm61,
    rolling_kgram_hashes,
)
from fulltextsearch_spark.operators.util import spread_for_python_kernel

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "lsh_recall_eval",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "simhash_neardup_pairs",
    "ngram_jaccard_pairs",
    "connected_components",
    "dedup_by_components",
    "cross_contamination",
    "cluster_keys",
]

_MERSENNE = M61


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct KR/M61 hashes of the k-byte shingles of ``text``.

    One vectorized rolling-hash pass (k numpy column passes) + np.unique —
    no per-shingle Python loop. Texts shorter than k are zero-padded to one
    shingle.
    """
    data = text.encode("utf-8", errors="replace")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    return np.unique(rolling_kgram_hashes(data, k))


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

    Permutations are exact (a*h + b) mod 2^61-1 over KR/M61 shingle hashes —
    deterministic across executors/restarts (never Python's salted hash())
    and recomputable in plain SQL (DuckDB HUGEINT) for the driver oracle.
    """
    a, b = _perm_params(num_perm, seed)
    # cap the (num_perm x n_shingles) permutation matrix per numpy call at
    # 64k elements (~0.5 MB) so every temporary of the limb-split mulmod
    # stays cache-resident (large uint64 temporaries fall off a steep
    # memory cliff) while amortizing the ~30 numpy ops across a few docs;
    # measured optimum on 300-char docs — both larger and smaller are slower
    chunk_shingles = max(1, 65_536 // num_perm)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        hs = [
            _shingle_hashes(t if isinstance(t, str) else "", shingle_k) for t in texts
        ]
        out: list[list[int]] = []
        i = 0
        while i < len(hs):
            j, total = i, 0
            while j < len(hs) and (j == i or total + hs[j].size <= chunk_shingles):
                total += hs[j].size
                j += 1
            lens = np.fromiter((h.size for h in hs[i:j]), dtype=np.int64, count=j - i)
            allh = np.concatenate(hs[i:j])
            vals = perm61(a[:, None], b[:, None], allh[None, :])
            starts = np.concatenate(([0], np.cumsum(lens[:-1])))
            # segmented min per doc (every doc has >=1 shingle by padding)
            mins = np.minimum.reduceat(vals, starts, axis=1).astype(np.int64)
            out.extend(mins[:, d].tolist() for d in range(j - i))
            i = j
        return pd.Series(out)

    return spread_for_python_kernel(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"), _sig(F.col(text_col)).alias("sig")
    )


def optimal_bands(threshold: float, num_perm: int = 128) -> int:
    """Banding that matches the LSH S-curve to ``threshold`` — the standard
    false-positive/false-negative weight minimization (Leskovec, Rajaraman
    & Ullman, "Mining of Massive Datasets" §3.4; the datasketch library's
    optimal-param search): over divisors b of num_perm with r = num_perm/b,
    minimize  integral_0^t P(s) ds + integral_t^1 (1 - P(s)) ds  where
    P(s) = 1 - (1 - s^r)^b.

    Why it matters at scale: candidate volume is quadratic in bucket
    density, and a banding tuned for a LOWER threshold than requested
    collides a large fraction of merely-moderately-similar pairs. Measured
    on the 400k-doc probe corpus (BENCH/scale_probe_minhash.json): the
    fixed 32x4 banding at threshold 0.3 shuffles ~14 KB/doc in candidate
    machinery; threshold-matched banding at 0.8 keeps the stage linear.
    """
    if not 0 < threshold < 1:
        raise ValueError("threshold must be in (0, 1)")
    xs = [i / 200.0 for i in range(1, 200)]
    best_b, best_err = 1, float("inf")
    for b in range(1, num_perm + 1):
        if num_perm % b:
            continue
        r = num_perm // b
        fp = sum(1.0 - (1.0 - s**r) ** b for s in xs if s < threshold) / 200.0
        fn = sum((1.0 - s**r) ** b for s in xs if s >= threshold) / 200.0
        err = fp + fn
        if err < best_err:
            best_b, best_err = b, err
    return best_b


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 128,
    bands: int | str = 32,
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
    ``bands="auto"`` picks the threshold-matched banding via
    :func:`optimal_bands` — the scale-correct default when the caller is
    not pinning a specific banding (see that function's measured
    candidate-volume rationale).
    """
    if bands == "auto":
        bands = optimal_bands(threshold, num_perm)
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
        "doc_id",
        # 8-byte bucket key with the band index folded in as hash salt: the
        # banded rows are the stage's dominant shuffle (docs x bands), and
        # a 64-char sha2 hex string plus a separate band column was ~75% of
        # their bytes (measured 8x-corpus probe, BENCH/scale_probe_minhash
        # .json). xxhash64 keeps the same (band, band-signature) partition
        # of docs (collisions at 2^-64 per bucket pair would only ADD a
        # candidate, which est_jaccard verification then filters).
        F.xxhash64(
            F.concat_ws(",", F.col("band_sig").cast("array<string>")),
            F.col("band"),
        ).alias("bkey"),
    )
    # boilerplate guard: skip giant buckets
    sized = banded.groupBy("bkey").agg(
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
    """(doc_id, simhash LONG) — SimHash over whitespace tokens x tf.

    Token hash = perm61(a_s, b_s, KR/M61(token)) with (a_s, b_s) drawn from
    ``seed`` — effectively 61 hash bits (bits 61..63 are always 0), exactly
    recomputable in SQL. Fully vectorized per Arrow batch: factorize the
    exploded tokens, hash each *unique* token once, accumulate the signed
    bit-weight sums with one reduceat over (doc, token) tf rows.
    """
    a_s, b_s = _perm_params(1, seed)

    @pandas_udf(T.LongType())
    def _sim(texts: pd.Series) -> pd.Series:
        toks = texts.fillna("").str.lower().str.split()
        lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        out = np.zeros(len(texts), dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return pd.Series(out)
        exploded = toks.explode().dropna()
        codes, uniques = pd.factorize(exploded.to_numpy())
        n_uniq = len(uniques)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        # tf per (doc, token): unique over a combined key (both streams sorted)
        key = doc_idx * np.int64(n_uniq) + codes
        uk, cnt = np.unique(key, return_counts=True)
        d = (uk // n_uniq).astype(np.int64)
        c = (uk % n_uniq).astype(np.int64)
        hs = perm61(a_s[0], b_s[0], bytes_hashes([u.encode("utf-8") for u in uniques]))
        bits_pm = (
            ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.float64
            )
            * 2.0
            - 1.0
        )  # n_uniq x 64 in {-1, +1}
        contrib = cnt.astype(np.float64)[:, None] * bits_pm[c]
        starts = np.concatenate(([0], np.flatnonzero(d[1:] != d[:-1]) + 1))
        acc = np.add.reduceat(contrib, starts, axis=0)  # docs-with-tokens x 64
        sig = (
            ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :])
            .sum(axis=1)
            .astype(np.uint64)
        )
        out[d[starts]] = sig.astype(np.int64)  # 2's-compl. (top bits are 0)
        return pd.Series(out)

    return spread_for_python_kernel(docs).select(
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


def connected_components(
    pairs: DataFrame,
    all_nodes: DataFrame | None = None,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, component) — connected components of the near-dup pair graph;
    ``component`` is the MIN node id reachable from ``node``.

    The step after pair generation in every dedup pipeline: transitive
    closure of "A is a near-dup of B" so each duplicate *cluster* keeps one
    canonical document. Implemented as iterative min-label propagation over
    the symmetrized edge list (two shuffles per round, label table
    lineage-truncated between rounds, convergence-checked). Each round's
    label table is cut from its logical plan with ``localCheckpoint`` —
    without that, Catalyst re-analyzes a plan that DOUBLES per iteration
    (persist caches data but not the plan) and the driver spins for minutes
    planning a 50-row job; on a long-running cluster job, point
    ``spark.sparkContext.setCheckpointDir`` at durable storage and swap in
    ``checkpoint()`` for executor-loss tolerance. Near-dup graphs are
    small-diameter by construction (clusters are near-cliques: members
    share most shingles pairwise), so rounds ≈ 2-4 in practice; at
    10^12-doc scale with adversarial long-chain components the same loop
    upgrades to the alternating large-star/small-star contraction
    (O(log n) rounds) without changing this function's contract.

    ``all_nodes`` (optional, column ``node``) adds isolated documents as
    singleton components (component = themselves).
    """
    half = pairs.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
    edges = (
        half.union(half.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)  # cut the pair-generation lineage once
    )

    nodes = edges.select(F.col("u").alias("node")).distinct()
    if all_nodes is not None:
        nodes = nodes.union(all_nodes.select(F.col("node").cast("long"))).distinct()
    comp = nodes.select("node", F.col("node").alias("comp")).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        nbr_min = (
            edges.join(comp, edges["v"] == comp["node"])
            .select(edges["u"].alias("node"), "comp")
            .groupBy("node")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        nxt = (
            comp.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)  # plan stays O(1) across rounds
        )
        n_changed = (
            nxt.join(comp.withColumnRenamed("comp", "old"), "node")
            .filter(F.col("comp") != F.col("old"))
            .count()
        )
        prev = comp
        comp = nxt
        prev.unpersist()
        if n_changed == 0:
            break
    else:
        # iteration cap hit with labels still moving: the labels are WRONG
        # (a cluster would keep several "canonical" docs downstream with no
        # signal). Fail loudly — callers can raise max_iterations or switch
        # to the large-star/small-star contraction for adversarial chains.
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge after {max_iterations} "
            f"iterations ({n_changed} labels still changing); raise "
            "max_iterations (chain diameter exceeds it) before trusting "
            "component labels"
        )
    edges.unpersist()
    return comp.select("node", "comp")


def dedup_by_components(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
) -> DataFrame:
    """Materialize the dedup decision: keep exactly ONE canonical document
    (the min ``id_col`` of its near-dup cluster) per connected component of
    the pair graph, passing every other column of ``docs`` through.

    This is the step that actually shrinks the corpus after any of the pair
    generators (:func:`minhash_lsh_pairs`, :func:`simhash_neardup_pairs`,
    :func:`ngram_jaccard_pairs`). Docs touched by no pair are their own
    component and survive. One hash join of ``docs`` against the canonical
    id set on ``id_col`` — at 100 TB both sides are partitioned by the same
    key, and the label table produced by :func:`connected_components` is
    orders of magnitude smaller than the corpus (only docs in some pair plus
    one row per survivor need labels, and text never enters the loop).
    """
    comp = connected_components(
        pairs, all_nodes=docs.select(F.col(id_col).cast("long").alias("node")),
        src=src, dst=dst,
    )
    keep = comp.filter(F.col("node") == F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(keep, id_col, "semi")


def lsh_recall_eval(
    docs: DataFrame,
    text_col: str = "text",
    shingle_k: int = 8,
    threshold: float = 0.3,
    num_perm: int = 128,
    bands: int = 32,
    seed: int = 1,
    max_bucket: int = 1000,
) -> DataFrame:
    """-> one row (n_true, n_cand, n_hit, recall, precision): measure the
    MinHash-LSH candidate pipeline against exact shingle-Jaccard ground
    truth at the same threshold — the quality gate a production dedup
    pipeline runs on a sample before trusting the approximate path at
    full scale (where the exact join is unaffordable).

    ``n_true`` counts exact-Jaccard >= threshold pairs, ``n_cand`` the
    LSH pipeline's emitted pairs (banding + estimator filter), ``n_hit``
    their intersection; recall = hit/true, precision = hit/cand (0 when
    the denominator is 0). All three counts are integers, so only the two
    final ratios are FP — and they are single divisions.
    """
    exact = ngram_jaccard_pairs(
        docs, text_col=text_col, shingle_k=shingle_k, threshold=threshold
    ).select("doc_id_a", "doc_id_b")
    cand = minhash_lsh_pairs(
        docs,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
        seed=seed,
        max_bucket=max_bucket,
    ).select("doc_id_a", "doc_id_b")
    n_true = exact.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    n_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_cand"))
    n_hit = exact.join(cand, ["doc_id_a", "doc_id_b"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    return (
        n_true.crossJoin(n_cand)
        .crossJoin(n_hit)
        .select(
            "n_true",
            "n_cand",
            "n_hit",
            F.when(F.col("n_true") > 0, F.col("n_hit") / F.col("n_true"))
            .otherwise(F.lit(0.0))
            .alias("recall"),
            F.when(F.col("n_cand") > 0, F.col("n_hit") / F.col("n_cand"))
            .otherwise(F.lit(0.0))
            .alias("precision"),
        )
    )


def cross_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    threshold: float = 0.8,
    seed: int = 1,
    max_bucket: int = 1000,
    bench_offset: int = 1 << 40,
) -> DataFrame:
    """(corpus_doc_id, bench_doc_id, est_jaccard) — NEAR-duplicate
    train-test contamination between a corpus and a benchmark/eval set.

    Exact n-gram decontamination (operators/decontam.py, the GPT-3 App. C
    rule) misses lightly edited copies — reformatted, re-punctuated, or
    partially rewritten test items inside the crawl. This runs the SAME
    MinHash-LSH machinery as within-corpus dedup over the tagged union of
    both tables (benchmark ids shifted into a disjoint range) and keeps
    only the cross-side collisions — the published near-dup-contamination
    audit (e.g. the fuzzy dedup the GPT-3/PaLM reports describe running
    against their eval sets).

    ``bench_offset`` must exceed every corpus doc_id (caller contract —
    validating it would cost a corpus pass). Scale shape inherits from
    :func:`minhash_lsh_pairs`: banded buckets, giant-bucket guard, no
    all-pairs stage; the benchmark side is tiny, so almost all buckets
    are corpus-only and drop at the cross-side filter.
    """
    tagged = corpus.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col(text_col).alias("text")
    ).unionByName(
        benchmark.select(
            (F.col("doc_id") + F.lit(bench_offset)).cast("long").alias("doc_id"),
            F.col(text_col).alias("text"),
        )
    )
    pairs = minhash_lsh_pairs(
        tagged, "text", num_perm, bands, shingle_k, threshold, seed, max_bucket
    )
    return pairs.where(
        (F.col("doc_id_a") < bench_offset) & (F.col("doc_id_b") >= bench_offset)
    ).select(
        F.col("doc_id_a").alias("corpus_doc_id"),
        (F.col("doc_id_b") - F.lit(bench_offset)).cast("long").alias("bench_doc_id"),
        "est_jaccard",
    )


def cluster_keys(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, key) — a collapse key per document: its near-dup cluster's
    canonical (minimum) doc_id, falling back to the doc's own id for
    singletons.

    The glue between dedup and serving: feed the result to
    ``collapse.collapse_topk`` and search results show ONE hit per
    near-duplicate cluster (the web-search "similar results omitted"
    behavior) WITHOUT destroying the duplicates in the index — unlike
    ``dedup_by_components``, which removes them from the corpus.
    """
    cc = connected_components(pairs)  # (node, comp)
    canon = cc.groupBy("comp").agg(F.min("node").alias("key"))
    keyed = cc.join(F.broadcast(canon), "comp").select(
        F.col("node").alias("doc_id"), "key"
    )
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(keyed, "doc_id", "left")
        .select("doc_id", F.coalesce("key", F.col("doc_id")).alias("key"))
    )
