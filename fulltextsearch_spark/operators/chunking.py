"""Document chunking: fixed-size overlapping token windows.

The standard training-data / retrieval preparation step the reference's
per-document pipeline stops short of: split every document's token stream
into windows of ``chunk_size`` tokens advancing by ``chunk_size - overlap``,
so each chunk shares ``overlap`` tokens with its predecessor and every token
index is covered by at least one chunk. Chunk boundaries are a pure function
of the token stream (starts are the multiples of the step below the token
count), so the output is deterministic, partitioning-independent, and
exactly SQL-replayable.

Scale shape: tokenize + sequence + posexplode + slice is one narrow
projection — ZERO shuffles, no state, no skew surface. At 100 TB the plan
is a single map stage whose output is ~(1 + overlap/step)x the token
volume; chunk rows inherit the input partitioning, so a downstream
embedding or indexing pass starts co-partitioned by doc.

Tokenization is the engine's unstemmed analyzer (reference
simpletokenizer.cpp semantics: 67-char delimiter whitelist split, ASCII
lower, 128-word stop list) so chunk text is drawn from the same token
stream every other operator sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fulltextsearch_spark.functions.tokenizer import tokenize_udf

__all__ = ["chunk_documents"]


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 32,
    overlap: int = 8,
    min_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each doc's token stream into overlapping fixed-size windows.

    Returns ``(doc_id, chunk_id, start_tok, n_tokens, chunk_text)`` — one
    row per window, ``chunk_id = start_tok / step`` (0-based), windows
    starting at every multiple of ``step = chunk_size - overlap`` strictly
    below the doc's token count. The final window may be shorter than
    ``chunk_size``; windows with fewer than ``min_tokens`` tokens are
    dropped (a 0-token doc therefore emits nothing at the default).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("require 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokenize_udf(do_stem=False)(F.col(text_col)).alias("toks"),
    )
    # starts: 0, step, 2*step, ... <= n-1 (empty doc -> the lone start 0
    # yields an empty slice, removed by the min_tokens filter below)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(step)
    )
    exploded = toks.select(
        "doc_id", "toks", F.explode(starts).alias("start_tok")
    )
    window = F.slice(F.col("toks"), F.col("start_tok") + 1, chunk_size)
    return (
        exploded.select(
            "doc_id",
            (F.col("start_tok") / step).cast("long").alias("chunk_id"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.size(window).cast("long").alias("n_tokens"),
            F.concat_ws(" ", window).alias("chunk_text"),
        )
        .where(F.col("n_tokens") >= F.lit(min_tokens))
    )
