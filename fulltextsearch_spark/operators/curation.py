"""Corpus curation: the composed training-data pipeline as ONE operator.

New work relative to the reference (it only searches; a 100 TB pretraining
pipeline also has to *select* documents before indexing/training): exact-
dedup canonicalization -> language filter -> quality filter, expressed as a
single declarative plan so Catalyst fuses everything around one shuffle.

Plan shape (verified via .explain):
* the ONLY wide operation is the window over a MATERIALIZED ``md5(text)``
  column that picks the canonical copy of each exact-duplicate group — one
  hash shuffle of (doc_id, text_hash, features) scale (text is projected
  away map-side, never crossing the exchange), the same single shuffle a
  groupBy-dedup costs;
* language ID, word counts, stop-word ratio and chars/word are pure Column
  expressions (:func:`fulltextsearch_spark.operators.textstats.
  language_expr`) computed map-side inside whole-stage codegen — no Python
  workers, no extra pass over the corpus, no join back;
* filters run before the final projection, so at 100 TB the post-shuffle
  output is the *surviving* subset only.

Near-dup curation composes the same way at scale: feed
``dedup.minhash_lsh_pairs`` survivors through this operator's quality gate
(they are separate shuffles by construction — signatures need an Arrow
kernel pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fulltextsearch_spark.operators.textstats import (
    LANG_STOPWORDS,
    _ws_tokens,
    language_from_votes,
    language_votes,
)

__all__ = ["curate_corpus", "curate_web"]


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_words: int = 30,
    min_stop_ratio: float = 0.03,
    max_chars_per_word: float = 15.0,
) -> DataFrame:
    """Curated subset of ``docs``: canonical exact-dedup copy, wanted
    language, and passing cheap quality gates.

    Returns (doc_id, lang, n_words, stop_ratio, chars_per_word) for every
    surviving document. Gates follow the standard web-corpus heuristics:
    too-short documents, documents with an unnaturally low stop-word ratio
    (boilerplate/word salad), and absurd characters-per-word (markup blobs)
    are dropped.
    """
    ws = _ws_tokens(text_col)
    stop_words = LANG_STOPWORDS["en"]
    n_words = F.size(ws)
    n_stop = F.size(F.filter(ws, lambda x: x.isin(*stop_words)))
    stop_ratio = n_stop.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    cpw = F.length(text_col).cast("double") / F.greatest(n_words, F.lit(1)).cast("double")

    # lang votes materialize as four ints + a double here, BEFORE the
    # md5 shuffle; the winner CASE runs over those plain columns after it.
    # Inlining the CASE directly would duplicate the tokenize subtree ~25x
    # in one projection — a compile- and run-time blowup, since the filter
    # lambda keeps codegen subexpression elimination out. The dedup hash is
    # likewise MATERIALIZED here (16 bytes) and the window partitions on the
    # column, not the expression — partitioning on md5(text) directly would
    # force the full text column through the exchange; this way Catalyst
    # prunes text map-side and the shuffle moves (doc_id, hash, feature)
    # rows only.
    feats = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("_text_hash"),
        n_words.cast("long").alias("n_words"),
        stop_ratio.alias("_stop_ratio"),
        cpw.alias("_cpw"),
        *[expr.alias(name) for name, expr in language_votes(text_col).items()],
    )
    w = Window.partitionBy("_text_hash")
    feats = feats.withColumn("_canonical", F.col("doc_id") == F.min("doc_id").over(w))

    return (
        feats.withColumn("lang", language_from_votes())
        .filter(
            F.col("_canonical")
            & F.col("lang").isin(*langs)
            & (F.col("n_words") >= F.lit(min_words))
            & (F.col("_stop_ratio") >= F.lit(min_stop_ratio))
            & (F.col("_cpw") <= F.lit(max_chars_per_word))
        )
        .select(
            "doc_id",
            "lang",
            "n_words",
            F.round("_stop_ratio", 4).alias("stop_ratio"),
            F.round("_cpw", 4).alias("chars_per_word"),
        )
    )


def curate_web(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    max_per_domain: int = 3,
    gopher_kwargs: dict | None = None,
    c4_kwargs: dict | None = None,
) -> DataFrame:
    """The full web-page curation pipeline as ONE plan: URL dedup →
    per-domain cap → Gopher quality → Gopher repetition → C4 page gate.

    Returns a verdict row per input document — (doc_id, url_keep,
    domain_rank, domain_keep, gopher_pass, repetition_pass, c4_pass,
    keep) — rather than the filtered subset, so every stage's decision is
    observable (and hash-comparable) downstream; ``keep`` is the
    conjunction. Stage semantics match the standalone operators exactly
    (the pass gates ARE the standalone operators' Column trees, via the
    shared ``_*_cols`` factories in ``webfilters``/``urltools``).

    Pipeline-order details: the domain cap ranks only URL-canonical rows
    (a running sum of ``url_keep`` per domain in doc_id order — real
    pipelines cap domains AFTER collapsing refetches, and a duplicate URL
    must not consume cap budget); the text gates are order-independent
    projections.

    Plan shape (100 TB): ALL text-derived gates and both curation keys
    (normalized-URL md5, registered domain) materialize in one map-side
    projection — the text column never crosses an exchange. The only wide
    operations are the two short-key windows (url-hash, then domain), each
    moving (doc_id, two 0/1 flags, key)-scale rows.
    """
    from fulltextsearch_spark.operators.urltools import (  # noqa: PLC0415
        normalize_url,
        registered_domain,
    )
    from fulltextsearch_spark.operators.webfilters import (  # noqa: PLC0415
        _c4_cols,
        _gopher_quality_cols,
        _gopher_repetition_cols,
    )

    feats = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(normalize_url(url_col)).alias("_uh"),
        registered_domain(url_col).alias("_domain"),
        _gopher_quality_cols(text_col, **(gopher_kwargs or {}))["passes"].alias(
            "gopher_pass"
        ),
        _gopher_repetition_cols(text_col)["passes"].alias("repetition_pass"),
        _c4_cols(text_col, **(c4_kwargs or {}))["passes"].alias("c4_pass"),
    )
    wu = Window.partitionBy("_uh").orderBy("doc_id")
    feats = feats.withColumn("url_keep", (F.row_number().over(wu) == 1).cast("long"))
    wd = (
        Window.partitionBy("_domain")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    feats = feats.withColumn(
        "domain_rank", (F.sum("url_keep").over(wd) * F.col("url_keep")).cast("long")
    )
    domain_keep = (F.col("url_keep") == 1) & (F.col("domain_rank") <= max_per_domain)
    return feats.select(
        "doc_id",
        "url_keep",
        "domain_rank",
        domain_keep.cast("long").alias("domain_keep"),
        "gopher_pass",
        "repetition_pass",
        "c4_pass",
        (
            domain_keep
            & (F.col("gopher_pass") == 1)
            & (F.col("repetition_pass") == 1)
            & (F.col("c4_pass") == 1)
        )
        .cast("long")
        .alias("keep"),
    )
