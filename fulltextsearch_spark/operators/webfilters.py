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
    "gopher_repetition",
    "boilerplate_lines",
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


def _gopher_quality_cols(
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
) -> dict:
    """Named output Columns of :func:`gopher_quality` (shared with
    :func:`~fulltextsearch_spark.operators.curation.curate_web`, which
    composes only the ``passes`` gate into a wider projection)."""
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
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(mean_word_len, 4),
        "symbol_ratio": F.round(symbol_ratio, 4),
        "bullet_line_ratio": F.round(bullet_ratio, 4),
        "ellipsis_line_ratio": F.round(ellipsis_ratio, 4),
        "alpha_word_ratio": F.round(alpha_ratio, 4),
        "n_required_stops": n_req.cast("long"),
        "passes": passes.cast("long"),
    }


def gopher_quality(docs: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    """(doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_ratio,
    ellipsis_line_ratio, alpha_word_ratio, n_required_stops, passes).

    Threshold defaults are the paper's published values; ``passes`` is the
    conjunction of all rules as a 0/1 long so the gate is hash-stable
    across engines.
    """
    cols = _gopher_quality_cols(text_col, **thresholds)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        *[c.alias(name) for name, c in cols.items()],
    )


def _sorted_adjacent_dup_chars(arr):
    """Chars in every non-first occurrence of a repeated element of ``arr``.

    Fold over the sorted array comparing neighbours — per-row Column math,
    no explode, no shuffle. Equivalent to SUM((cnt-1) * length(elem)) over
    the element multiset.
    """
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("dupch"),
    )
    return F.aggregate(
        F.array_sort(arr),
        zero,
        lambda acc, x: F.struct(
            x.alias("prev"),
            (
                acc["dupch"]
                + F.when(acc["prev"].eqNullSafe(x), F.length(x)).otherwise(F.lit(0))
            ).alias("dupch"),
        ),
        lambda acc: acc["dupch"],
    )


def _ngram_rep_stats(ws, n: int):
    """(top_chars, dup_chars) for word ``n``-grams of the word array ``ws``.

    ``top_chars``  = count x char-length of the most frequent n-gram (the
    space-joined string), 0 when nothing repeats; count x length does NOT
    collapse overlapping occurrences, matching the standard public
    reimplementations of the rule. Ties on count pick the lexicographically
    smallest n-gram (the fold keeps the first run of the sorted array on a
    strict ``>``), which an oracle mirrors as MIN(gram) among max-count
    groups. ``dup_chars`` = chars in every occurrence beyond the first of
    each repeated n-gram.

    One fold over the sorted per-row array: embarrassingly parallel, whole
    row pipeline stays a projection.
    """
    ngrams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("top_c"),
        F.lit(None).cast("string").alias("top_g"),
        F.lit(0).cast("long").alias("dupch"),
    )

    def step(acc, x):
        same = acc["prev"].eqNullSafe(x)
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        better = run > acc["top_c"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["top_c"]).alias("top_c"),
            F.when(better, x).otherwise(acc["top_g"]).alias("top_g"),
            (acc["dupch"] + F.when(same, F.length(x)).otherwise(F.lit(0))).alias("dupch"),
        )

    acc = F.aggregate(F.array_sort(ngrams), zero, step)
    top_chars = (
        F.when(acc["top_c"] > 1, acc["top_c"] * F.length(acc["top_g"]))
        .otherwise(F.lit(0))
        .cast("long")
    )
    return top_chars, acc["dupch"].cast("long")


# Rae et al. 2021 Table A1 thresholds, keyed by output column.
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def _gopher_repetition_cols(text_col: str = "text") -> dict:
    """Named output Columns of :func:`gopher_repetition` (shared with
    ``curate_web``)."""
    ws = _words(text_col)
    lines = _lines(text_col)
    n_lines = F.size(lines)
    line_chars = F.aggregate(
        F.transform(lines, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    n_dup_lines = n_lines - F.size(F.array_distinct(lines))
    dup_line_chars = _sorted_adjacent_dup_chars(lines)
    total_chars = F.length(F.concat_ws(" ", ws))

    dup_line_frac = n_dup_lines.cast("double") / F.greatest(n_lines, F.lit(1))
    dup_line_char_frac = dup_line_chars.cast("double") / F.greatest(line_chars, F.lit(1))

    fracs: dict[str, object] = {
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
    }
    for n in (2, 3, 4):
        top_chars, _ = _ngram_rep_stats(ws, n)
        fracs[f"top_{n}gram_char_frac"] = top_chars.cast("double") / F.greatest(
            total_chars, F.lit(1)
        )
    for n in range(5, 11):
        _, dup_chars = _ngram_rep_stats(ws, n)
        fracs[f"dup_{n}gram_char_frac"] = dup_chars.cast("double") / F.greatest(
            total_chars, F.lit(1)
        )

    passes = None
    for name, thr in GOPHER_REPETITION_THRESHOLDS.items():
        cond = fracs[name] <= thr
        passes = cond if passes is None else (passes & cond)

    cols: dict = {"n_lines": n_lines.cast("long")}
    for name, expr in fracs.items():
        cols[name] = F.round(expr, 4)
    cols["passes"] = passes.cast("long")
    return cols


def gopher_repetition(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher repetition-removal rules (Rae et al. 2021, appendix A1.1,
    Table A1) as per-doc stats + pass gate — the within-document complement
    of :func:`gopher_quality`.

    Per document: fraction of duplicate lines and of characters inside
    duplicate lines; fraction of characters inside the most frequent word
    {2,3,4}-gram; fraction of characters inside duplicated word
    {5..10}-grams (all occurrences beyond the first of each repeated
    n-gram). Denominators: line fractions use the summed length of trimmed
    non-empty lines; n-gram fractions use the length of the space-joined
    word string (content chars, single spaces). Character fractions count
    ``count x length`` without collapsing overlapping occurrences, as in
    the standard public reimplementations.

    Scale notes (100 TB): every column is a fold/projection over per-row
    arrays — zero shuffles, no Python, filters and ``text`` pushed to the
    scan. All nine n-gram folds run in the one projection.

    ``passes`` conjoins Table A1's thresholds
    (:data:`GOPHER_REPETITION_THRESHOLDS`).
    """
    cols = _gopher_repetition_cols(text_col)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        *[c.alias(name) for name, c in cols.items()],
    )


def _c4_cols(
    text_col: str = "text",
    min_line_words: int = 3,
    min_sentences: int = 5,
) -> dict:
    """Named output Columns of :func:`c4_line_filters` (shared with
    ``curate_web``)."""
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
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept_lines": F.size(kept).cast("long"),
        "n_sentences": n_sentences.cast("long"),
        "has_lorem": has_lorem.cast("long"),
        "has_brace": has_brace.cast("long"),
        "passes": passes.cast("long"),
    }


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
    cols = _c4_cols(text_col, min_line_words, min_sentences)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        *[c.alias(name) for name, c in cols.items()],
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
    # materialize the hash of the normalized paragraph BEFORE the window so
    # only (doc_id, para_idx, 16-byte hash) cross the exchange, never the
    # paragraph text (md5(NULL) is NULL, preserving the no-paragraph rows);
    # partitioning on the lower(para) expression directly would force the
    # full text through the shuffle
    hashed = paras.select(
        "doc_id", "para_idx", F.md5(F.lower(F.col("para"))).alias("_ph")
    )
    w = Window.partitionBy("_ph").orderBy("doc_id", "para_idx")
    flagged = hashed.withColumn(
        "is_dup",
        F.when(
            F.col("_ph").isNull(), F.lit(None).cast("int")
        ).otherwise((F.row_number().over(w) > 1).cast("int")),
    )
    return flagged.groupBy("doc_id").agg(
        F.count("_ph").cast("long").alias("n_paras"),
        F.coalesce(F.sum("is_dup"), F.lit(0)).cast("long").alias("n_dup_paras"),
        F.round(
            F.coalesce(F.sum("is_dup"), F.lit(0)).cast("double")
            / F.greatest(F.count("_ph"), F.lit(1)),
            4,
        ).alias("dup_ratio"),
    )


def boilerplate_lines(
    docs: DataFrame,
    min_df: int = 3,
    text_col: str = "text",
    max_boilerplate: int = 1_000_000,
) -> DataFrame:
    """Cross-corpus boilerplate-line removal (the CCNet §3.1 / Dolma
    "common line" rule): a line whose normalized form (lower + trim)
    appears in at least ``min_df`` DISTINCT documents is boilerplate —
    cookie banners, nav text, "enable javascript" — and every instance is
    removed from every document.

    Returns ``(doc_id, text, n_lines, n_removed)`` with ``text`` rebuilt
    from the surviving lines joined by newlines (empty-after-trim lines
    are neither counted nor removable; they survive reassembly trimmed
    away with the split/join round trip, matching the SQL replay).

    Scale shape: the ONLY wide operation is the line-hash document-
    frequency aggregate — (16-byte hash, doc_id) pairs, never line text,
    cross that exchange. The boilerplate set itself is tiny by
    construction (lines repeated across >= min_df docs are the head of
    the line-frequency Zipf), so it returns to every task as ONE
    broadcast array row and the removal is a per-row array filter with
    zero further shuffles — document text never leaves its input
    partition. ``max_boilerplate`` guards the broadcast: exceeding it
    raises rather than silently shipping an unexpectedly huge set (the
    bloom-filter variant is the documented upgrade if a corpus ever
    legitimately crosses it).
    """
    norm = lambda c: F.md5(F.lower(F.trim(c)))  # noqa: E731
    ln = F.explode(_lines(text_col))
    pairs = docs.select(F.col("doc_id").cast("long").alias("doc_id"), ln.alias("l"))
    dfreq = (
        pairs.select("doc_id", norm(F.col("l")).alias("h"))
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    boil = dfreq.where(F.col("df") >= min_df).select("h")
    n_boil = boil.count()
    if n_boil > max_boilerplate:
        raise ValueError(
            f"boilerplate set has {n_boil} lines (> max_boilerplate="
            f"{max_boilerplate}); raise the cap or switch to the bloom path"
        )
    boil_row = boil.agg(
        F.coalesce(F.collect_set("h"), F.array()).alias("boil")
    )
    lines_col = _lines(text_col)
    out = docs.crossJoin(F.broadcast(boil_row)).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.filter(
            lines_col,
            lambda x: ~F.array_contains(F.col("boil"), F.md5(F.lower(x))),
        ).alias("_keep"),
        F.size(lines_col).alias("_n"),
    )
    return out.select(
        "doc_id",
        F.array_join("_keep", "\n").alias("text"),
        F.col("_n").cast("long").alias("n_lines"),
        (F.col("_n") - F.size("_keep")).cast("long").alias("n_removed"),
    )
