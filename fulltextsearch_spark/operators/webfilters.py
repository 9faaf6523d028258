"""Published web-corpus filter rules for training-data curation.

Re-expressions of the two standard rule sets every large-scale text
pipeline applies before training, as pure Column math (JVM codegen, no
Python in the hot path, and exactly SQL-mirrorable for oracles):

* :func:`gopher_quality` — the Gopher quality heuristics (Rae et al. 2021,
  "Scaling Language Models: Methods, Analysis & Insights from Training
  Gopher", appendix A1.1): word-count bounds, mean-word-length bounds,
  symbol-to-word ratio, bullet-/ellipsis-line ratios, alphabetic-word
  ratio, required-stop-word presence.
* :func:`c4_line_filters` — the C4 cleaning heuristics (Raffel et al.
  2020, "Exploring the Limits of Transfer Learning with a Unified
  Text-to-Text Transformer", section 2.2): keep lines ending in terminal
  punctuation with >=3 words, drop pages with <5 sentences, drop pages
  containing "lorem ipsum" or a curly brace.
* :func:`paragraph_dedup_stats` — paragraph-level exact dedup in the
  spirit of Lee et al. 2022 ("Deduplicating Training Data Makes Language
  Models Better"), reduced to exact match on normalized paragraphs: a
  paragraph instance is a duplicate unless it is the globally first
  occurrence of its normalized text (ordered by doc_id, then position).

Scale notes (100 TB): the two rule operators are embarrassingly parallel
projections — zero shuffles, whole-stage codegen, filters and the text
column pushed to the parquet scan. ``paragraph_dedup_stats`` shuffles
twice on bounded keys: once on the normalized-paragraph hash (high
cardinality, Zipf-bounded per key by construction — identical paragraphs
collapse into one window partition whose size is the duplication count,
the quantity being measured) and once back on doc_id for the per-doc
rollup; only (doc_id, para_idx, hash) cross the exchange, never the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "GOPHER_REQUIRED_STOPS",
    "gopher_quality",
    "c4_line_filters",
    "paragraph_dedup_stats",
]

# Rae et al. 2021, A1.1: "contains at least two of the following English
# words: the, be, to, of, and, that, have, with".
GOPHER_REQUIRED_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _words(text_col: str):
    return F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))


def _lines(text_col: str):
    # NB: `F.transform(arr, F.trim)` would bind transform's (element, index)
    # pair to trim(col, trimChars) and silently no-op — the lambda must be
    # explicit and single-argument.
    return F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_required_stops: int = 2,
) -> DataFrame:
    """(doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_ratio,
    ellipsis_line_ratio, alpha_word_ratio, n_required_stops, passes).

    Threshold defaults are the paper's published values; ``passes`` is the
    conjunction of all rules as a 0/1 long so the gate is hash-stable
    across engines.
    """
    words = _words(text_col)
    lines = _lines(text_col)
    n_words = F.size(words)
    n_lines = F.size(lines)
    sum_len = F.aggregate(
        F.transform(words, F.length), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    mean_word_len = sum_len.cast("double") / F.greatest(n_words, F.lit(1))
    # '#', '...' and the one-char ellipsis are the symbols the rule names.
    n_symbols = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"#|\.\.\.|…"), F.lit(0)))
    symbol_ratio = n_symbols.cast("double") / F.greatest(n_words, F.lit(1))
    n_bullet = F.size(F.filter(lines, lambda ln: ln.rlike(r"^[-*•]")))
    n_ellipsis = F.size(F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)$")))
    bullet_ratio = n_bullet.cast("double") / F.greatest(n_lines, F.lit(1))
    ellipsis_ratio = n_ellipsis.cast("double") / F.greatest(n_lines, F.lit(1))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = n_alpha.cast("double") / F.greatest(n_words, F.lit(1))
    n_req = sum(
        F.when(F.array_contains(words, w), 1).otherwise(0) for w in GOPHER_REQUIRED_STOPS
    )
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_ratio <= max_bullet_ratio)
        & (ellipsis_ratio <= max_ellipsis_ratio)
        & (alpha_ratio >= min_alpha_ratio)
        & (n_req >= min_required_stops)
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(bullet_ratio, 4).alias("bullet_line_ratio"),
        F.round(ellipsis_ratio, 4).alias("ellipsis_line_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_word_ratio"),
        n_req.cast("long").alias("n_required_stops"),
        passes.cast("long").alias("passes"),
    )


def c4_line_filters(
    docs: DataFrame,
    text_col: str = "text",
    min_line_words: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """(doc_id, n_lines, n_kept_lines, n_sentences, has_lorem, has_brace,
    passes) — the C4 page/line heuristics as per-doc stats.

    A line is kept when it ends in terminal punctuation (``.!?"'``) and has
    at least ``min_line_words`` whitespace words; the page passes when at
    least one line survives, it has >= ``min_sentences`` sentence-final
    marks, and contains neither "lorem ipsum" nor ``{``.
    """
    lines = _lines(text_col)
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(r"""[.!?"']$""")
        & (F.size(F.filter(F.split(ln, r"\s+"), lambda x: x != F.lit(""))) >= min_line_words),
    )
    n_sentences = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]"), F.lit(0)))
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    passes = (
        (F.size(kept) >= 1) & (n_sentences >= min_sentences) & ~has_lorem & ~has_brace
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sentences.cast("long").alias("n_sentences"),
        has_lorem.cast("long").alias("has_lorem"),
        has_brace.cast("long").alias("has_brace"),
        passes.cast("long").alias("passes"),
    )


def paragraph_dedup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_paras, n_dup_paras, dup_ratio) — exact paragraph dedup.

    Paragraphs are newline-separated, trimmed, non-empty; normalization is
    lowercasing. An instance is a duplicate unless it is the first global
    occurrence of its normalized text in (doc_id, para_idx) order — the
    keep-first policy of Lee et al. 2022 at paragraph granularity. Docs
    whose text has no paragraphs report (0, 0, 0.0) rather than dropping
    out.
    """
    paras = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode_outer(_lines(text_col)).alias("para_idx", "para"),
    )
    w = Window.partitionBy(F.lower(F.col("para"))).orderBy("doc_id", "para_idx")
    flagged = paras.withColumn(
        "is_dup",
        F.when(
            F.col("para").isNull(), F.lit(None).cast("int")
        ).otherwise((F.row_number().over(w) > 1).cast("int")),
    )
    return flagged.groupBy("doc_id").agg(
        F.count("para").cast("long").alias("n_paras"),
        F.coalesce(F.sum("is_dup"), F.lit(0)).cast("long").alias("n_dup_paras"),
        F.round(
            F.coalesce(F.sum("is_dup"), F.lit(0)).cast("double")
            / F.greatest(F.count("para"), F.lit(1)),
            4,
        ).alias("dup_ratio"),
    )
