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

__all__ = [
    "chunk_documents",
    "materialize_sequences",
    "pack_sequences",
    "search_maxp",
    "write_training_shards",
]


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


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 256,
    bucket_span: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style sequence packing: concatenate every document's token stream
    in ``doc_id`` order and split it into fixed ``seq_len`` training windows,
    documents spanning window boundaries (Brown et al. 2020 §2.3 / the
    standard "concat-and-chunk" pretraining layout — no padding waste, in
    contrast to per-doc truncation).

    Returns the pack MAP — one row per (sequence, document) overlap:
    ``(seq_id, doc_id, doc_start, seq_pos, n_toks)``: tokens
    ``[doc_start, doc_start + n_toks)`` of ``doc_id`` land in sequence
    ``seq_id`` at offset ``seq_pos``. Every sequence except the last holds
    exactly ``seq_len`` tokens; 0-token docs appear in no sequence. All
    columns are integers, so the layout replays exactly in SQL.

    Scale shape: the global token offset per doc is NOT a corpus-wide
    single-partition window — it is decomposed two-level exactly like the
    ingest id assignment (sources/ingest.py): per-bucket token totals
    (bucket = doc_id // bucket_span, order-preserving) cumulate in one
    bucket-count-sized window, then the intra-bucket cumulative sum windows
    partition by bucket. With bucket_span ~ sqrt(corpus) both levels stay
    far from the driver and no partition sees more than span rows. The rest
    is a narrow projection + bounded explode (a doc overlaps
    ceil(n/seq_len)+1 sequences at most).
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    from fulltextsearch_spark.functions.tokenizer import tokenize_udf

    counts = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(tokenize_udf(do_stem=False)(F.col(text_col))).cast("long").alias("n"),
    )
    return _pack_map(counts, seq_len, bucket_span)


def _pack_map(counts: DataFrame, seq_len: int, bucket_span: int) -> DataFrame:
    """Pack map from a (doc_id, n) token-count frame — the shared core, so
    :func:`materialize_sequences` can reuse ONE tokenize pass for both the
    counts and the token arrays."""
    from pyspark.sql import Window

    n_toks = counts.where(F.col("n") > 0)
    n_toks = n_toks.withColumn("bucket", F.expr(f"doc_id div {bucket_span}"))
    # level 1: cumulative total BEFORE each bucket. Not a global-ORDER-BY
    # window (that is a single-partition WindowExec — the one anti-pattern
    # this module exists to avoid): buckets band by a second-level span,
    # band offsets come from a broadcast triangular self-join of the tiny
    # band-total table (10^12 docs -> ~230 bands), and the within-band
    # running sum is a window PARTITIONED by band (<= band_span rows per
    # partition) — same shape as the vocab_stats rank cumulation
    # (textstats.py).
    band_span = 65536
    b_tot = (
        n_toks.groupBy("bucket")
        .agg(F.sum("n").alias("b_tot"))
        .withColumn("band", F.expr(f"bucket div {band_span}"))
    )
    band_tot = b_tot.groupBy("band").agg(F.sum("b_tot").alias("n"))
    band_off = (
        band_tot.alias("b")
        .join(
            F.broadcast(band_tot.alias("lo")),
            F.col("lo.band") < F.col("b.band"),
            "left",
        )
        .groupBy(F.col("b.band").alias("band"))
        .agg(F.coalesce(F.sum("lo.n"), F.lit(0)).alias("band_off"))
    )
    wb = (
        Window.partitionBy("band")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b_off = b_tot.join(F.broadcast(band_off), "band").select(
        "bucket",
        (F.col("band_off") + F.coalesce(F.sum("b_tot").over(wb), F.lit(0))).alias(
            "b_off"
        ),
    )
    # level 2: intra-bucket running sum before each doc
    wd = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = n_toks.join(F.broadcast(b_off), "bucket").select(
        "doc_id",
        "n",
        (F.col("b_off") + F.coalesce(F.sum("n").over(wd), F.lit(0))).alias("off"),
    )
    # integer div (not double /) — token offsets can exceed 2^53 at corpus scale
    first = F.expr(f"off div {seq_len}")
    last = F.expr(f"(off + n - 1) div {seq_len}")
    spans = offs.select(
        "doc_id", "n", "off", F.explode(F.sequence(first, last)).alias("seq_id")
    )
    lo = F.greatest(F.col("seq_id") * seq_len, F.col("off"))
    hi = F.least((F.col("seq_id") + 1) * seq_len, F.col("off") + F.col("n"))
    return spans.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        "doc_id",
        (lo - F.col("off")).cast("long").alias("doc_start"),
        (lo - F.col("seq_id") * seq_len).cast("long").alias("seq_pos"),
        (hi - lo).cast("long").alias("n_toks"),
    )


def materialize_sequences(
    docs: DataFrame,
    seq_len: int = 256,
    bucket_span: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(seq_id, n_toks, tokens ARRAY<STRING>) — the actual training
    sequences the :func:`pack_sequences` map describes.

    Joins the pack map back to the tokenized docs, slices each doc's
    contribution, and assembles per-sequence token arrays in seq_pos order.
    Per-sequence state is bounded by ``seq_len`` tokens, so the final
    aggregate's rows are fixed-size however large the corpus; the join is
    doc-keyed and the only new shuffle is the seq_id-keyed assembly.
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    from fulltextsearch_spark.functions.tokenizer import tokenize_udf

    # ONE tokenize pass: counts for the pack map derive from the same
    # (doc_id, toks) frame the slices read
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokenize_udf(do_stem=False)(F.col(text_col)).alias("toks"),
    )
    pm = _pack_map(
        toks.select("doc_id", F.size("toks").cast("long").alias("n")),
        seq_len,
        bucket_span,
    )
    part = pm.join(toks, "doc_id").select(
        "seq_id",
        "seq_pos",
        F.slice(F.col("toks"), F.col("doc_start") + 1, F.col("n_toks")).alias("piece"),
    )
    return (
        part.groupBy("seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("seq_pos", "piece"))),
                    lambda s: s["piece"],
                )
            ).alias("tokens")
        )
        .select(
            "seq_id", F.size("tokens").cast("long").alias("n_toks"), "tokens"
        )
    )


def write_training_shards(
    sequences: DataFrame,
    out_dir: str,
    seqs_per_shard: int = 1024,
) -> dict:
    """Persist materialized sequences as deterministic fixed-size shards —
    the export stage a pretraining data pipeline ends with.

    Shard assignment is ``seq_id div seqs_per_shard`` (a pure function of
    the layout, NOT of partitioning or write order, so re-runs produce
    byte-stable shard membership), written as parquet partitioned by
    ``shard``. Returns a manifest dict ``{n_seqs, n_shards, n_tokens,
    seqs_per_shard}`` and writes it to ``{out_dir}/_manifest.json`` — the
    counts a training job validates before consuming.
    """
    import json

    if seqs_per_shard < 1:
        raise ValueError("seqs_per_shard must be >= 1")
    # Persist so the shard write and the manifest aggregate read ONE
    # evaluation of `sequences` — a nondeterministic upstream re-eval could
    # otherwise make the manifest counts disagree with the written shards.
    sequences = sequences.persist()
    try:
        shards = sequences.select(
            F.expr(f"seq_id div {seqs_per_shard}").alias("shard"),
            "seq_id",
            "n_toks",
            "tokens",
        )
        shards.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
        agg = sequences.agg(
            F.count(F.lit(1)).alias("n_seqs"), F.sum("n_toks").alias("n_tokens")
        ).collect()[0]
    finally:
        sequences.unpersist()
    manifest = {
        "n_seqs": int(agg["n_seqs"]),
        "n_shards": -(-int(agg["n_seqs"]) // seqs_per_shard) if agg["n_seqs"] else 0,
        "n_tokens": int(agg["n_tokens"] or 0),
        "seqs_per_shard": seqs_per_shard,
    }
    _write_manifest(out_dir, json.dumps(manifest))
    return manifest


def _write_manifest(out_dir: str, payload: str) -> None:
    """Write ``{out_dir}/_manifest.json`` on the same store the shard data
    went to: non-local URI schemes (s3a://, hdfs://, gs://) resolve through
    ``pyarrow.fs.FileSystem.from_uri`` rather than the driver's local disk —
    a local ``open()`` on an object-store path would crash or silently
    misplace the manifest next to nothing."""
    name = "_manifest.json"
    if "://" in out_dir and not out_dir.startswith("file://"):
        from pyarrow import fs as pafs  # noqa: PLC0415

        # s3a:// is the Hadoop spelling of s3://; pyarrow only knows s3://.
        uri = out_dir.replace("s3a://", "s3://", 1)
        filesystem, inner = pafs.FileSystem.from_uri(uri)
        with filesystem.open_output_stream(inner.rstrip("/") + "/" + name) as f:
            f.write(payload.encode())
        return
    import os

    local = out_dir.removeprefix("file://")
    with open(os.path.join(local, name), "w") as f:
        f.write(payload)


def search_maxp(
    docs: DataFrame,
    queries: DataFrame,
    chunk_size: int = 32,
    overlap: int = 8,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Passage-level retrieval with MaxP document aggregation (the sparse
    ancestor of Dai & Callan's BERT-MaxP, SIGIR 2019; passage evidence for
    long documents goes back to Callan, SIGIR 1994): score fixed-size
    overlapping passages as their own BM25 corpus, then rank documents by
    their BEST passage.

    Long documents dilute whole-doc BM25 (one strong on-topic section
    drowns in the length normalization); MaxP restores locality. Passage
    corpus statistics are passage-native: N = passage count, avgdl = mean
    passage length, df = passages containing the term — the standard
    passage-index semantics (NOT the max-id+1 contract of the document
    index, which has no meaning for derived passages).

    Returns ``(query_id, rank, doc_id, score, best_chunk)`` with ``score``
    the best passage's BM25 and ``best_chunk`` that passage's chunk_id
    (lowest wins ties — deterministic). Scale shape: chunking is the
    zero-shuffle projection of :func:`chunk_documents`; tf/df are the
    usual hash aggregates over (passage, term); query probe broadcasts;
    the MaxP rollup is one more hash aggregate, and the per-query top-k a
    WindowGroupLimit window.
    """
    from pyspark.sql import Window

    from fulltextsearch_spark.functions.scoring import bm25_col
    from fulltextsearch_spark.functions.tokenizer import tokenize_udf
    from fulltextsearch_spark.operators.query import query_terms

    chunks = chunk_documents(docs, chunk_size=chunk_size, overlap=overlap)
    stats = chunks.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tot")
    ).collect()[0]
    n_chunks = int(stats["n"])
    if n_chunks == 0:
        raise ValueError("corpus produced no passages")
    avgdl = float(stats["tot"]) / n_chunks
    tok = tokenize_udf(do_stem=False)
    ctf = (
        chunks.select(
            "doc_id", "chunk_id", "n_tokens",
            F.explode(tok(F.col("chunk_text"))).alias("term"),
        )
        .groupBy("doc_id", "chunk_id", "n_tokens", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    cdf = ctf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    q_terms = query_terms(queries, stem=False)
    scored = (
        ctf.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(cdf.join(F.broadcast(q_terms.select("term").distinct()), "term")), "term")
        .select(
            "query_id",
            "doc_id",
            "chunk_id",
            (
                bm25_col(
                    F.col("tf"), F.col("df"), F.col("n_tokens"),
                    n_chunks, avgdl, k1, b,
                )
                * F.col("qtf").cast("double")
            ).alias("_s"),
        )
        .groupBy("query_id", "doc_id", "chunk_id")
        .agg(F.sum("_s").alias("cscore"))
    )
    best = scored.groupBy("query_id", "doc_id").agg(
        F.max(F.struct(F.col("cscore"), (-F.col("chunk_id")).alias("_nc"))).alias("_b")
    ).select(
        "query_id",
        "doc_id",
        F.col("_b.cscore").alias("score"),
        (-F.col("_b._nc")).cast("long").alias("best_chunk"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            "score",
            "best_chunk",
        )
    )
