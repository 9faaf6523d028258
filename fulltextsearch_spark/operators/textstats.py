"""Text analysis operators for training-data pipelines.

* :func:`language_id` — deterministic heuristic: CJK-character ratio first,
  then stop-word-profile votes for en/de/es/fr over lowercased whitespace
  tokens; ties broken by fixed priority, no votes -> 'und'. Pure Column code
  (JVM, codegen) so it is also exactly SQL-expressible for the oracle.
* :func:`token_counts` — whitespace tokens + a BPE-ish pre-tokenizer count
  (GPT-2-style pattern reduced to ASCII classes: letter runs / digit runs /
  punctuation runs, each with optional leading space).
* :func:`winnow_fingerprints` — document fingerprinting by winnowing
  (Schleimer et al., SIGMOD'03): k-gram Karp-Rabin rolling hashes, per-window
  minimum with the paper's rightmost tie-break, numpy-vectorized.
* :func:`quality_features` — cheap per-doc quality signals (lengths,
  stop-word ratio, chars/word).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from fulltextsearch_spark.functions.hashing import rolling_kgram_hashes as _kgram_hashes
from fulltextsearch_spark.functions.tokenizer import STOP_WORDS
from fulltextsearch_spark.operators.util import spread_for_python_kernel

__all__ = [
    "LANG_STOPWORDS",
    "bigram_lm_scores",
    "collocations",
    "corpus_drift",
    "similar_terms",
    "vocab_stats",
    "language_expr",
    "language_votes",
    "language_from_votes",
    "language_id",
    "token_counts",
    "token_entropy",
    "winnow_fingerprints",
    "quality_features",
    "BPE_ISH_PATTERN",
]

# Small, fixed stop-word profiles (distinctive function words only).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": "the and of to in is that it was for with his they this have from".split(),
    "de": "der die das und ist nicht ein eine mit von den dem auch sich".split(),
    "es": "el la los las y es una por con para del se las como más".split(),
    "fr": "le la les et est une des dans pour que qui sur pas vous".split(),
}
_LANG_PRIORITY = ["en", "de", "es", "fr"]  # tie-break order

BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def _ws_tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )


def language_votes(text_col: str = "text") -> dict[str, "F.Column"]:
    """Per-language stop-word occurrence counts (duplicates included) plus
    the CJK character ratio, as named Column expressions.

    Split from :func:`language_from_votes` so composed pipelines can
    materialize these few narrow columns (e.g. across a shuffle) and build
    the winner CASE from plain int columns afterwards — inlining the CASE
    over these expressions duplicates the tokenize subtree ~25x, and the
    filter lambda blocks codegen subexpression elimination, which makes the
    one-expression form quadratically expensive to both compile and run."""
    toks = _ws_tokens(text_col)
    votes = {
        f"v_{lang}": F.size(F.filter(toks, lambda x: x.isin(*words)))
        for lang, words in LANG_STOPWORDS.items()
    }
    n_cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", ""))
    votes["cjk_ratio"] = (
        n_cjk.cast("double") / F.greatest(F.length(text_col), F.lit(1)).cast("double")
    )
    return votes


def language_from_votes(cjk_threshold: float = 0.2):
    """Winner CASE over materialized ``v_<lang>`` / ``cjk_ratio`` columns."""
    votes = {lang: F.col(f"v_{lang}") for lang in _LANG_PRIORITY}
    best = F.greatest(*[votes[lang] for lang in _LANG_PRIORITY])
    cond = F.when(best <= F.lit(0), F.lit("und"))
    for lang in _LANG_PRIORITY:
        cond = cond.when(votes[lang] == best, F.lit(lang))
    return F.when(F.col("cjk_ratio") >= F.lit(cjk_threshold), F.lit("zh")).otherwise(cond)


def language_expr(text_col: str = "text", cjk_threshold: float = 0.2):
    """Language-ID as a single Column expression. Fine for a standalone
    projection; inside wide composed plans prefer the two-stage
    votes-then-CASE form (see :func:`language_votes`)."""
    toks = _ws_tokens(text_col)
    votes = {
        lang: F.size(F.filter(toks, lambda x: x.isin(*words)))
        for lang, words in LANG_STOPWORDS.items()
    }
    n_cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", ""))
    cjk_ratio = n_cjk.cast("double") / F.greatest(F.length(text_col), F.lit(1)).cast("double")
    best = F.greatest(*[votes[lang] for lang in _LANG_PRIORITY])
    cond = F.when(best <= F.lit(0), F.lit("und"))
    for lang in _LANG_PRIORITY:
        cond = cond.when(votes[lang] == best, F.lit(lang))
    return F.when(cjk_ratio >= F.lit(cjk_threshold), F.lit("zh")).otherwise(cond)


def language_id(docs: DataFrame, text_col: str = "text", cjk_threshold: float = 0.2) -> DataFrame:
    """(doc_id, lang) — deterministic heuristic language ID."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        language_expr(text_col, cjk_threshold).alias("lang"),
    )


def token_entropy(
    docs: DataFrame, text_col: str = "text", stem: bool = False
) -> DataFrame:
    """(doc_id, dl, n_types, entropy, ttr) — unigram-distribution stats per
    doc over the engine token stream.

    ``entropy`` is the Shannon entropy of the doc's unigram distribution,
    ``-sum((tf/dl) * log2(tf/dl))`` — a standard quality/repetitiveness
    signal for pre-training curation (boilerplate and keyword-stuffed pages
    score low); ``ttr`` is the type-token ratio ``n_types / dl``. Empty docs
    (dl=0) are kept with entropy 0 and ttr 0, mirroring the index's
    missing-as-0 doc-length semantics.

    Scale shape: tokenize (Arrow) -> one partial-combined groupBy on
    (doc_id, term) -> one tiny groupBy on doc_id. Same exchange pattern as
    the tf table build; at 100 TB this is the standard per-doc-feature
    MapReduce, no broadcast, no skew (keys are doc-scoped).
    """
    from fulltextsearch_spark.functions.tokenizer import tokenize_udf

    tok = tokenize_udf(stem)
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tok(F.col(text_col)).alias("_tokens"),
    ).select("doc_id", F.size("_tokens").alias("dl"), F.col("_tokens"))
    tf = (
        toks.select("doc_id", "dl", F.explode("_tokens").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    p = F.col("tf").cast("double") / F.col("dl").cast("double")
    stats = tf.groupBy("doc_id", "dl").agg(
        F.count(F.lit(1)).alias("n_types"),
        (-F.sum(p * F.log2(p))).alias("entropy"),
    )
    # dl=0 docs never produce tf rows — restore them with zero stats
    empties = (
        toks.filter(F.col("dl") == 0)
        .select(
            "doc_id",
            F.col("dl"),
            F.lit(0).cast("long").alias("n_types"),
            F.lit(0.0).alias("entropy"),
        )
    )
    return stats.unionByName(empties).select(
        "doc_id",
        F.col("dl").cast("long").alias("dl"),
        F.col("n_types").cast("long").alias("n_types"),
        "entropy",
        F.when(F.col("dl") > 0, F.col("n_types").cast("double") / F.col("dl").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("ttr"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens) — token-count features."""
    ws = F.size(F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
    )


# k-gram hashes come from functions.hashing: Karp-Rabin base 257 with EXACT
# mod-2^61-1 arithmetic (the earlier `(h*257 + c) % M` on uint64 silently
# wrapped at 2^64 before the mod) — also SQL-recomputable for oracles.


def winnow(data: bytes, k: int = 8, window: int = 4) -> list[tuple[int, int]]:
    """-> [(position, fingerprint)] selected by robust winnowing."""
    h = _kgram_hashes(data, k)
    if h.size == 0:
        return []
    if h.size <= window:
        pos = int(h.argmin())
        # rightmost minimum
        pos = int(np.flatnonzero(h == h[pos])[-1])
        return [(pos, int(h[pos]))]
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    # rightmost min per window: argmin over reversed window
    rev = sw[:, ::-1]
    picks = (window - 1) - rev.argmin(axis=1) + np.arange(sw.shape[0])
    uniq = np.unique(picks)
    return [(int(p), int(h[p])) for p in uniq]


def winnow_fingerprints(
    docs: DataFrame, text_col: str = "text", k: int = 8, window: int = 4
) -> DataFrame:
    """(doc_id, pos, fingerprint) — exploded winnowing fingerprints."""
    out_type = T.ArrayType(
        T.StructType(
            [T.StructField("pos", T.LongType()), T.StructField("fingerprint", T.LongType())]
        )
    )

    @pandas_udf(out_type)
    def _fp(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [
                    {"pos": p, "fingerprint": np.uint64(f).astype(np.int64).item()}
                    for p, f in winnow(t.encode("utf-8") if isinstance(t, str) else b"", k, window)
                ]
                for t in texts
            ]
        )

    return spread_for_python_kernel(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode(_fp(F.col(text_col))).alias("_f")
    ).select("doc_id", F.col("_f.pos").alias("pos"), F.col("_f.fingerprint").alias("fingerprint"))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_words, stop_ratio, chars_per_word, punct_ratio)."""
    words = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))
    stop_arr = F.array(*[F.lit(w) for w in sorted(STOP_WORDS)])
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(n_stop.cast("double") / F.greatest(n_words, F.lit(1)), 4).alias("stop_ratio"),
        F.round(
            F.length(text_col).cast("double") / F.greatest(n_words, F.lit(1)), 4
        ).alias("chars_per_word"),
        F.round(
            n_punct.cast("double") / F.greatest(F.length(text_col), F.lit(1)), 4
        ).alias("punct_ratio"),
    )


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
    stem: bool = False,
) -> DataFrame:
    """Top-k PMI collocations (adjacent-bigram mining) over the corpus.

    The classic corpus-analytics pass (Church & Hanks 1990) a training-data
    pipeline runs to find multi-word expressions and boilerplate phrases:
    ``PMI(w1, w2) = ln( p(w1 w2) / (p(w1) p(w2)) )`` over adjacent bigrams
    of the engine's own token stream (stop-filtered, optionally stemmed),
    with a ``min_count`` support floor to suppress the low-frequency PMI
    explosion. Returns ``(w1, w2, n, pmi)``, top-k by (pmi DESC, w1, w2).

    Plan shape: bigrams stay ARRAY-side (``zip_with`` over two slices — no
    positional self-join); one hash aggregate each for bigram and unigram
    counts; the unigram join keys are vocabulary-scale. The final top-k is
    ``orderBy + limit`` -> TakeOrderedAndProject (distributed partial
    top-k). All count arithmetic stays in exact doubles (< 2^53), so an
    oracle replaying the same formula reproduces pmi bit-for-bit.
    """
    from fulltextsearch_spark.functions.tokenizer import tokenize_udf

    tok = tokenize_udf(stem)
    toks = docs.select(tok(F.col(text_col)).alias("tokens")).filter(
        F.size("tokens") >= 2
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "zip_with(slice(tokens, 1, size(tokens)-1), "
                "slice(tokens, 2, size(tokens)-1), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    uni = docs.select(tok(F.col(text_col)).alias("tokens")).select(
        F.explode("tokens").alias("w")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cu = uni.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("c"))
    # both scalar totals in ONE tokenize pass (nb = sum of per-doc
    # max(len-1, 0), nu = sum of lens) — three passes total for the
    # operator (totals, bigram agg, unigram agg), not four
    tot = (
        docs.select(F.size(tok(F.col(text_col))).alias("s"))
        .agg(
            F.sum(F.greatest(F.col("s") - 1, F.lit(0))).alias("nb"),
            F.sum("s").alias("nu"),
        )
        .collect()[0]
    )
    nb, nu = int(tot["nb"] or 0), int(tot["nu"] or 0)
    scored = (
        c12.filter(F.col("n") >= min_count)
        .join(cu.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(cu.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
        .select(
            "w1",
            "w2",
            "n",
            F.log(
                (F.col("n").cast("double") * float(nu) * float(nu))
                / (float(nb) * F.col("c1") * F.col("c2"))
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(k)


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    stem: bool = False,
) -> DataFrame:
    """CCNet-style language-model quality scoring: per-document
    cross-entropy under an add-alpha-smoothed bigram LM trained on the
    corpus itself (Wenzek et al., "CCNet", LREC 2020 — there a KenLM 5-gram;
    the bigram form keeps the estimator exactly SQL-expressible).

    ``P(w2|w1) = (C(w1 w2) + alpha) / (C(w1 ·) + alpha * V)`` where
    ``C(w1 ·)`` counts w1 as a bigram left-context and ``V`` is the unigram
    vocabulary size. Per doc: ``H = -mean(log2 P)`` over its bigrams and
    ``ppl = 2^H``; docs with fewer than 2 tokens score 0 with n_bigrams=0.

    Scale shape: bigram extraction is narrow (tokenize UDF + arrays_zip +
    explode in one stage); the two count tables are hash aggregates with
    map-side partials (same shuffle shape as the tf table); scoring joins
    the doc bigram stream against the LM on the (w1, w2) key — a shuffle
    sort-merge join, the honest plan when the bigram table itself is
    corpus-scale and cannot broadcast. One final per-doc hash aggregate.
    """
    from fulltextsearch_spark.functions.tokenizer import tokenize_udf

    toks = docs.select(
        "doc_id", tokenize_udf(do_stem=stem)(F.col(text_col)).alias("toks")
    )
    n = F.size("toks")
    big = (
        toks.where(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n - 1).alias("w1"),
                    F.slice("toks", 2, n - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    ctx = big.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("c1"))
    bgc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("double").alias("c2"))
    # V over the full unigram stream (incl. each doc's final token).
    voc = (
        toks.select(F.explode("toks").alias("term"))
        .agg(F.countDistinct("term").cast("double").alias("v"))
    )
    p = (F.col("c2") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("v"))
    scored = (
        big.join(bgc, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(voc))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            (-F.avg(F.log2(p))).alias("cross_entropy"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(F.coalesce("cross_entropy", F.lit(0.0)), 4).alias("cross_entropy"),
            F.round(F.pow(F.lit(2.0), F.coalesce("cross_entropy", F.lit(0.0))), 4).alias("ppl"),
        )
    )


def vocab_stats(docs: DataFrame, text_col: str = "text", stem: bool = False) -> DataFrame:
    """Corpus vocabulary profile: token/type totals, hapax/dis legomena
    counts, head-term mass share, and the fitted Zipf exponent.

    One row: ``(n_tokens, n_types, hapax, dis, top_share, zipf_slope)``.
    ``zipf_slope`` is the OLS slope of ln(freq) on ln(rank) (rank by freq
    desc, term asc — Zipf's law predicts ≈ -1 for natural text; training
    corpora that drift far from it are boilerplate- or spam-heavy). The
    slope is ``covar_pop/var_pop`` over per-term (ln rank, ln freq) pairs —
    exactly the SQL definition, so the oracle is closed-form.

    Scale shape: one tf aggregate (the index build's A1 shuffle — shared
    across both lineage branches via exchange reuse: everything stays in
    ONE lazy plan, no driver collect). The Zipf rank is NOT a global
    single-partition sort — it is decomposed as ``offset(freq) +
    row_number within the freq class``. The offset table over the
    DISTINCT-FREQUENCY histogram (O(sqrt(n_tokens)) rows by Zipf) is
    itself two-level so no unpartitioned window ever runs: freqs band by
    ``floor(log2(freq))`` (≤64 bands for any long), cross-band offsets
    come from a broadcast triangular self-join of the ≤64-row band-total
    table, and the within-band running sum is a window PARTITIONED by
    band. The within-class window partitions by ``freq``; the one skewed
    class (hapax, freq=1) is the upgrade point: if it outgrows a
    partition, band it by a term-hash prefix and add banded offsets the
    same way.
    """
    from fulltextsearch_spark.functions.tokenizer import tokenized_docs

    tf = tokenized_docs(docs, text_col=text_col, do_stem=stem)
    freq = tf.groupBy("term").agg(F.sum("tf").alias("freq"))
    from pyspark.sql import Window

    hist = freq.groupBy("freq").agg(F.count(F.lit(1)).alias("n_in_class"))
    # Rank is by freq DESC, so bands cumulate from the HIGHEST band down:
    # offset(band) = sum of counts in all HIGHER bands, via a broadcast
    # triangular join of the <=64-row band-total table (lazy, windowless).
    hist = hist.withColumn("band", F.floor(F.log2(F.col("freq").cast("double"))))
    band_tot = hist.groupBy("band").agg(F.sum("n_in_class").alias("n"))
    band_off = (
        band_tot.alias("b")
        .join(
            F.broadcast(band_tot.alias("hi")),
            F.col("hi.band") > F.col("b.band"),
            "left",
        )
        .groupBy(F.col("b.band").alias("band"))
        .agg(F.coalesce(F.sum("hi.n"), F.lit(0)).alias("band_offset"))
    )
    wh = (
        Window.partitionBy("band")
        .orderBy(F.desc("freq"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = hist.join(F.broadcast(band_off), "band").select(
        "freq",
        (
            F.col("band_offset")
            + F.coalesce(F.sum("n_in_class").over(wh), F.lit(0))
        ).alias("offset"),
    )
    wt = Window.partitionBy("freq").orderBy(F.asc("term"))
    ranked = freq.join(F.broadcast(offs), "freq").withColumn(
        "rank", F.col("offset") + F.row_number().over(wt)
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    return ranked.agg(
        F.sum("freq").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).cast("long").alias("hapax"),
        F.sum(F.when(F.col("freq") == 2, 1).otherwise(0)).cast("long").alias("dis"),
        F.round(F.max(F.col("freq")).cast("double") / F.sum("freq"), 6).alias("top_share"),
        F.round(F.covar_pop(x, y) / F.var_pop(x), 4).alias("zipf_slope"),
    )


def similar_terms(
    docs: DataFrame,
    probes: DataFrame,
    k: int = 5,
    min_count: int = 3,
    text_col: str = "text",
    stem: bool = False,
) -> DataFrame:
    """Distributional term similarity: top-k nearest terms per probe by
    cosine over PPMI context vectors (the count-based word-embedding of
    Church & Hanks 1990 / Levy & Goldberg 2014, "related searches" /
    synonym-mining without a trained model).

    Context = adjacent neighbors (window 1, symmetric: each bigram (a, b)
    contributes context b to a AND a to b) over the engine token stream;
    ``PPMI(w, c) = max(0, ln(n(w,c) * N / (n(w) * n(c))))`` with an exact
    integer count core, ``min_count`` flooring the pair support. Similarity
    of probe p and term w is ``sum_c ppmi(p,c)*ppmi(w,c) / (||p|| ||w||)``;
    output ``(probe, term, sim)`` top-k by (sim DESC, term ASC), the probe
    itself excluded.

    Scale shape: pair/unigram counts are the collocations aggregates; the
    PPMI table is vocabulary-pair-scale but ``min_count``-floored (Zipf
    truncates it hard). The probe vectors are a broadcast (probes are a
    query-sized set), so the dot products are ONE map-side join on the
    context key followed by a (probe, term) aggregate — the full PPMI
    matrix is never self-joined; candidate terms are exactly those sharing
    >= 1 context with a probe.
    """
    from fulltextsearch_spark.functions.tokenizer import tokenize_udf

    tok = tokenize_udf(stem)
    toks = docs.select(tok(F.col(text_col)).alias("tokens")).filter(
        F.size("tokens") >= 2
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "zip_with(slice(tokens, 1, size(tokens)-1), "
                "slice(tokens, 2, size(tokens)-1), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    pairs = (
        bg.select(F.col("w1").alias("w"), F.col("w2").alias("c"))
        .unionAll(bg.select(F.col("w2").alias("w"), F.col("w1").alias("c")))
        .groupBy("w", "c")
        .agg(F.count(F.lit(1)).cast("double").alias("nwc"))
        .where(F.col("nwc") >= min_count)
    )
    marg = pairs.groupBy("w").agg(F.sum("nwc").alias("nw"))
    cmarg = pairs.groupBy("c").agg(F.sum("nwc").alias("nc"))
    total = pairs.agg(F.sum("nwc").alias("nn"))
    ppmi = (
        pairs.join(marg, "w")
        .join(cmarg, "c")
        .crossJoin(F.broadcast(total))
        .select(
            "w",
            "c",
            F.greatest(
                F.log(F.col("nwc") * F.col("nn") / (F.col("nw") * F.col("nc"))),
                F.lit(0.0),
            ).alias("x"),
        )
        .where(F.col("x") > 0)
    )
    norms = ppmi.groupBy("w").agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm"))
    pvec = (
        ppmi.join(F.broadcast(probes.select(F.col("term").alias("w"))), "w")
        .select(F.col("w").alias("probe"), "c", F.col("x").alias("px"))
    )
    dots = (
        ppmi.join(F.broadcast(pvec), "c")
        .where(F.col("w") != F.col("probe"))
        .groupBy("probe", "w")
        .agg(F.sum(F.col("x") * F.col("px")).alias("dot"))
    )
    # probe norms derive from the (already query-sized) probe vectors —
    # never broadcast the vocabulary-scale norms table
    pnorms = pvec.groupBy("probe").agg(
        F.sqrt(F.sum(F.col("px") * F.col("px"))).alias("pnrm")
    )
    scored = (
        dots.join(norms, "w")
        .join(F.broadcast(pnorms), "probe")
        .select(
            "probe",
            F.col("w").alias("term"),
            (F.col("dot") / (F.col("nrm") * F.col("pnrm"))).alias("sim"),
        )
    )
    from pyspark.sql import Window

    win = Window.partitionBy("probe").orderBy(F.desc("sim"), F.asc("term"))
    return (
        scored.withColumn("_r", F.row_number().over(win))
        .filter(F.col("_r") <= k)
        .select("probe", "term", "sim", F.col("_r").cast("long").alias("rank"))
    )


def corpus_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    min_count: int = 5,
    k: int = 10,
    text_col: str = "text",
    stem: bool = False,
) -> DataFrame:
    """Distribution drift between two corpus snapshots — the telemetry a
    continuously crawling pipeline runs per increment ("did today's crawl
    shift?"), the same Jensen-Shannon monitoring the data-quality
    literature applies to feature drift, here over the engine's own
    unigram stream.

    Returns tidy rows ``(kind, rank, term, value)``:

    * ``('jsd', 0, NULL, JSD)`` — Jensen-Shannon divergence (natural log)
      between the two unigram distributions over the union vocabulary;
      0 = identical, ln 2 = disjoint. Terms absent on one side contribute
      their finite half-KL part only (0·log0 = 0), so no smoothing is
      needed for the divergence itself.
    * ``('riser', r, term, log_ratio)`` / ``('faller', r, term,
      log_ratio)`` — the k strongest movers by the smoothed log-ratio
      ``ln(((cb+0.5)/Nb) / ((ca+0.5)/Na))`` among terms with
      ``ca + cb >= min_count`` (the +0.5 keeps newborn/vanished terms
      finite and rankable). Ties break term-ASC.

    Scale shape: one tf aggregate per side, a full-outer union-vocabulary
    join keyed by term, one scalar aggregate for the divergence, and two
    ``orderBy().limit(k)`` mover selections (TakeOrderedAndProject —
    distributed partial top-k, no global sort, no single-partition
    window).
    """
    from fulltextsearch_spark.functions.tokenizer import tokenize_udf

    tok = tokenize_udf(do_stem=stem)

    def counts(d):
        return (
            d.select(F.explode(tok(F.col(text_col))).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("double").alias("c"))
        )

    ca = counts(docs_a).withColumnRenamed("c", "ca")
    cb = counts(docs_b).withColumnRenamed("c", "cb")
    both = ca.join(cb, "term", "full").select(
        "term",
        F.coalesce("ca", F.lit(0.0)).alias("ca"),
        F.coalesce("cb", F.lit(0.0)).alias("cb"),
    )
    tot = both.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb")).collect()[0]
    na, nb = float(tot["na"]), float(tot["nb"])
    if na == 0 or nb == 0:
        raise ValueError("both snapshots need at least one token")
    p = F.col("ca") / F.lit(na)
    q = F.col("cb") / F.lit(nb)
    m = (p + q) / F.lit(2.0)
    half_kl = lambda x: F.when(x > 0, x * F.log(x / m)).otherwise(F.lit(0.0))  # noqa: E731
    jsd_row = both.agg(
        (F.lit(0.5) * F.sum(half_kl(p)) + F.lit(0.5) * F.sum(half_kl(q))).alias("jsd")
    )
    spark = docs_a.sparkSession
    jsd = jsd_row.select(
        F.lit("jsd").alias("kind"),
        F.lit(0).cast("long").alias("rank"),
        F.lit(None).cast("string").alias("term"),
        F.round("jsd", 6).alias("value"),
    )
    movers = both.where(F.col("ca") + F.col("cb") >= min_count).select(
        "term",
        F.log(
            ((F.col("cb") + F.lit(0.5)) / F.lit(nb))
            / ((F.col("ca") + F.lit(0.5)) / F.lit(na))
        ).alias("lr"),
    )

    def top(df, asc: bool, kind: str):
        ordered = df.orderBy(
            F.asc("lr") if asc else F.desc("lr"), F.asc("term")
        ).limit(k)
        w_rows = ordered.collect()
        return spark.createDataFrame(
            [(kind, i + 1, r["term"], round(r["lr"], 6)) for i, r in enumerate(w_rows)],
            "kind STRING, rank LONG, term STRING, value DOUBLE",
        )

    return jsd.unionByName(top(movers, False, "riser")).unionByName(
        top(movers, True, "faller")
    )
