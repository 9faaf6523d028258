"""Exact-substring (span-level) dedup for training-data pipelines.

Re-expresses the ExactSubstr criterion of Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better"): a span of >= L consecutive
tokens that occurs elsewhere in the corpus is a duplicate and gets removed.
The paper builds one giant suffix array; the scalable distributed
equivalent is duplicated-L-gram COVERAGE, exact for the per-position rule
"token position p is inside some length-L window that occurs >= 2 times in
the corpus":

* every length-L token window of a duplicated span of length M >= L is
  itself duplicated, so the span is exactly the union of its covered
  windows — maximal duplicated substrings come out as merged intervals;
* conversely every reported position sits inside a genuinely duplicated
  L-window, so coverage never over-removes relative to the per-position
  rule (adjacent windows duplicated against DIFFERENT partners merge into
  one interval — that is the rule's union semantics, same as the paper's
  per-byte removal mask).

Tokens come from the engine's unstemmed tokenizer (stop-filtered — span
coordinates count SURVIVING tokens, exactly like the positional index), so
the whole computation is deterministic and replayable in SQL for the
driver oracle.

Scale design (10^12 docs):

* the gram table is one row per token position (corpus-sized — this class
  of dedup is a corpus-sort no matter the engine; the paper's suffix array
  is a single-node sort of the same magnitude). It never carries text:
  8-byte xxhash64 keys only;
* two wide ops total: a groupBy on the hash to find duplicated grams (with
  map-side partial aggregation) and a join of the gram table back to the
  (usually tiny) duplicated-gram set — broadcast when it fits, AQE
  otherwise. A 64-bit collision can only ADD a removed span, the safe
  direction (same argument as decontam.py);
* interval merging is a per-doc window over HIT positions only — skinny
  (doc_id, start) rows, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fulltextsearch_spark.functions.tokenizer import tokenize_udf

__all__ = ["gram_positions", "duplicate_spans", "strip_duplicate_spans"]


def gram_positions(
    df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id_col, start, gh): EVERY length-``n`` token window with its
    0-based surviving-token start position and 8-byte gram hash. Documents
    with fewer than ``n`` tokens yield no rows."""
    toked = df.select(
        F.col(id_col), tokenize_udf(do_stem=False)(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toked.select(F.col(id_col), F.posexplode(grams).alias("start", "_g")).select(
        id_col, F.col("start").cast("long").alias("start"), F.xxhash64("_g").alias("gh")
    )


def duplicate_spans(
    docs: DataFrame,
    min_len: int = 50,
    keep_first: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_dups: bool = True,
) -> DataFrame:
    """-> (id_col, span_start, span_end, n_grams): maximal duplicated spans.

    A position is covered when some ``min_len``-token window through it
    occurs >= 2 times in the corpus (window multiset counts every
    occurrence, including several within one document). Overlapping and
    adjacent covered windows merge into maximal ``[span_start, span_end)``
    intervals (surviving-token coordinates); ``n_grams`` is the number of
    duplicated windows merged into the span.

    ``keep_first=True`` exempts each duplicated gram's FIRST occurrence
    (min (doc, start)) from coverage — the paper's keep-one-copy policy at
    window granularity: the earliest copy of a duplicated span stays, later
    copies are flagged. ``keep_first=False`` flags every occurrence (the
    audit view).
    """
    grams = gram_positions(docs, min_len, id_col=id_col, text_col=text_col)
    dups = grams.groupBy("gh").agg(
        F.count("*").alias("_cnt"),
        F.min(F.struct(id_col, "start")).alias("_first"),
    ).filter(F.col("_cnt") >= 2)
    if broadcast_dups:
        dups = F.broadcast(dups)
    hits = grams.join(dups, "gh")
    if keep_first:
        hits = hits.filter(
            (F.col(id_col) != F.col(f"_first.{id_col}"))
            | (F.col("start") != F.col("_first.start"))
        )
    hits = hits.select(id_col, "start")

    w = Window.partitionBy(id_col).orderBy("start")
    # gaps-and-islands: window length is constant, so coverage breaks
    # exactly when the next start exceeds previous start + min_len.
    flagged = hits.withColumn(
        "_new",
        (
            F.col("start") > F.coalesce(F.lag("start").over(w), F.lit(-(10**18))) + min_len
        ).cast("long"),
    ).withColumn("_island", F.sum("_new").over(w))
    return (
        flagged.groupBy(id_col, "_island")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + min_len).alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select(
            id_col,
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            F.col("n_grams").cast("long").alias("n_grams"),
        )
    )


def strip_duplicate_spans(
    docs: DataFrame,
    min_len: int = 50,
    keep_first: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id_col, kept_tokens, n_removed): each doc's surviving-token
    stream with duplicated spans removed (the paper's removal step, in the
    engine's token coordinates — the tokenizer is stop-filtering, so
    reconstructing the ORIGINAL byte text is out of scope by design; LLM
    pipelines consume the token stream).
    """
    spans = duplicate_spans(
        docs, min_len=min_len, keep_first=keep_first, id_col=id_col, text_col=text_col
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toked = docs.select(
        F.col(id_col), tokenize_udf(do_stem=False)(F.col(text_col)).alias("_toks")
    )
    joined = toked.join(per_doc, id_col, "left")
    kept = F.when(F.col("_spans").isNull(), F.col("_toks")).otherwise(
        F.filter(
            F.transform(
                F.col("_toks"),
                lambda t, i: F.when(
                    F.exists(
                        "_spans",
                        lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
                    ),
                    F.lit(None).cast("string"),
                ).otherwise(t),
            ),
            lambda t: t.isNotNull(),
        )
    )
    return joined.select(
        F.col(id_col),
        kept.alias("kept_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("n_removed"),
    )
