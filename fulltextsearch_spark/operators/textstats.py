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
    "collocations",
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
