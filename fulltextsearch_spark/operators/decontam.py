"""Benchmark decontamination for training-data pipelines.

Flags (and removes) training documents that share word n-grams with a
benchmark / evaluation set — the published train-test-overlap rule used by
the GPT-3 appendix-C / PaLM / Llama data pipelines (exact 13-gram overlap
against the eval suites; Brown et al. 2020, "Language Models are Few-Shot
Learners", App. C). `n` and the hit threshold are parameters because every
published pipeline tunes them.

Both sides run through the engine's own unstemmed tokenizer
(:func:`~fulltextsearch_spark.functions.tokenizer.tokenize_udf`, byte-exact
with the reference's delimiter whitelist + stop-word list,
/root/reference/src/algorithms/search/tokenization/stemmingtokenizer.cpp:25-61
semantics minus the stem step), so "n-gram" means n consecutive surviving
tokens — deterministic and exactly replayable in SQL for the driver oracle.

Scale design (10^12 docs / 100 TB):

* The benchmark side is SMALL by construction (eval suites are MBs, not
  TBs). Its distinct n-grams are reduced to 8-byte xxhash64 keys and
  broadcast — the corpus side is filtered map-side by the broadcast hash
  join, so the only rows that ever reach an exchange are the (doc_id, hash)
  pairs that actually HIT the benchmark (a ~0% selectivity filter on clean
  corpora). Document text never crosses a shuffle.
* The corpus-side n-gram explode is pure map work: tokens -> sliding
  windows -> per-doc-distinct hashes, all inside one stage; nothing is
  materialized per gram beyond the Arrow batch.
* ``broadcast=False`` flips to a shuffle hash join on the 8-byte key for
  the (unusual) case of a benchmark too large to broadcast; AQE handles
  skew (a stop-phrase-like gram repeated across many docs).
* Hash collisions can only ADD a false hit (over-removal), never hide one
  on the string-match definition; at 64 bits the expected extra removals
  are ~0 even at 10^12 docs, and over-removal is the safe direction for
  decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fulltextsearch_spark.functions.tokenizer import tokenize_udf

__all__ = ["doc_ngrams", "contamination_flags", "decontaminate"]


def doc_ngrams(
    df: DataFrame, n: int = 13, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id_col, gram): the DISTINCT word ``n``-grams of each document.

    Tokens come from the engine tokenizer (unstemmed, stop-filtered); a
    gram is ``n`` consecutive tokens joined by a single space (tokens can
    never contain a space, so the join is unambiguous). Documents with
    fewer than ``n`` tokens yield no rows. ``F.sequence`` counts DOWN when
    stop < start, so the short-doc case must be guarded explicitly. The
    UDF output is projected into its own column first: Catalyst refuses a
    Python UDF referenced inside a higher-order-function lambda, and the
    physical plan extracts the UDF into an ArrowEvalPython stage anyway.
    """
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
    return toked.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram")
    )


def contamination_flags(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """-> (id_col, n_hits, contaminated) for EVERY document in ``docs``.

    ``n_hits`` = how many distinct ``n``-grams of the document also occur
    anywhere in ``bench`` (a frame with ``text_col``); ``contaminated`` =
    ``n_hits >= min_hits``. Clean docs appear with ``n_hits = 0`` so the
    output is a total function of the corpus (callers audit removal rates
    from it directly).
    """
    bench_grams = (
        doc_ngrams(
            bench.select(F.monotonically_increasing_id().alias("_bid"), text_col),
            n,
            id_col="_bid",
            text_col=text_col,
        )
        .select(F.xxhash64("gram").alias("_gh"))
        .distinct()
    )
    if broadcast:
        bench_grams = F.broadcast(bench_grams)
    hits = (
        doc_ngrams(docs, n, id_col=id_col, text_col=text_col)
        .select(id_col, F.xxhash64("gram").alias("_gh"))
        .join(bench_grams, "_gh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias("contaminated"),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """``docs`` minus the contaminated rows (all original columns kept)."""
    flags = contamination_flags(
        docs, bench, n=n, min_hits=min_hits, id_col=id_col,
        text_col=text_col, broadcast=broadcast,
    )
    keep = flags.filter(~F.col("contaminated")).select(id_col)
    return docs.join(keep, id_col, "left_semi")
