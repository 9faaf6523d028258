"""Incremental index maintenance with Structured Streaming.

The reference is strictly batch (two full passes,
``/root/reference/src/algorithms/inverted/inverted_index_engine.cpp:15-35``);
re-indexing means rebuilding. This module adds the streaming ingestion path a
living web corpus needs:

* :class:`IncrementalIndexer` — a ``readStream`` file source over the
  landing directory; each micro-batch assigns dense doc_ids continuing the
  existing id space (offset = persisted max id + 1, deterministic within the
  batch via the same range-partitioned sort as the batch ingest), tokenizes
  with the engine tokenizer, and appends to ``{root}/delta_tokenized`` plus a
  ``doc_map`` (doc_id <-> url) — exactly-once via the streaming checkpoint +
  idempotent per-batch output paths.
* :func:`refresh_index` — **affected-terms merge**, not a rebuild: terms
  touched by the delta get their postings re-aggregated from the full
  tokenized corpus; untouched terms carry over (their doc_id lists are
  append-only facts). Corpus stats (N = max_id+1, avgdl) recompute — BM25
  scores legitimately shift for *all* docs when N/avgdl move, which a posting
  carry-over handles for free because dl lives in the posting and idf/avgdl
  are applied at query time. A new index version directory is written and a
  ``CURRENT`` pointer flips atomically; readers never see a half-written
  index.

At 100 TB the delta-vs-base asymmetry is the whole point: a day of crawl is
~0.1% of the corpus, so the merge re-aggregates ~the Zipf-weighted term slice
it touched instead of 10^12 docs.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fulltextsearch_spark.config import DEFAULT_CONFIG, EngineConfig
from fulltextsearch_spark.functions.tokenizer import term_counts_udf
from fulltextsearch_spark.operators.compressed_index import (
    CompressedIndex,
    compress_doc_tf,
    compress_tokenized,
    load_compressed_index,
    save_compressed_index,
)
from fulltextsearch_spark.sources.ingest import assign_dense_doc_ids

__all__ = ["IncrementalIndexer", "refresh_index", "load_current_index"]


def _current_version(root: str) -> int:
    try:
        with open(os.path.join(root, "CURRENT")) as f:
            return int(f.read().strip())
    except OSError:
        return -1


def _set_current(root: str, version: int) -> None:
    tmp = os.path.join(root, "CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(root, "CURRENT"))


def load_current_index(spark: SparkSession, root: str) -> CompressedIndex:
    v = _current_version(root)
    if v < 0:
        raise FileNotFoundError(f"no CURRENT index under {root}")
    return load_compressed_index(spark, os.path.join(root, f"index_v{v:05d}"))


class IncrementalIndexer:
    """foreachBatch sink: dense-id assignment + tokenize + delta append."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        cfg: EngineConfig = DEFAULT_CONFIG,
        order_col: str = "url",
        text_col: str = "text",
    ):
        self.spark = spark
        self.root = root
        self.cfg = cfg
        self.order_col = order_col
        self.text_col = text_col
        os.makedirs(root, exist_ok=True)

    def _watermark_path(self) -> str:
        return os.path.join(self.root, "_watermark.json")

    def _read_watermark(self) -> dict | None:
        try:
            with open(self._watermark_path()) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def _write_watermark(self, wm: dict) -> None:
        tmp = self._watermark_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(wm, f)
        os.replace(tmp, self._watermark_path())  # atomic

    def _next_offset(self) -> int:
        """High-watermark for dense doc_id continuation.

        The persisted watermark manifest is the fast path — rescanning all
        base+delta parquet for max(doc_id) every micro-batch was O(corpus)
        per batch. The full scan remains only as a one-time migration
        fallback for roots created before the manifest existed.
        """
        wm = self._read_watermark()
        if wm is not None:
            return int(wm["next_offset"])
        delta = os.path.join(self.root, "delta_tokenized")
        base = os.path.join(self.root, "base_tokenized")
        mx = -1
        for path in (base, delta):
            if os.path.isdir(path) and any(
                f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
            ):
                row = self.spark.read.parquet(path).agg(F.max("doc_id")).collect()[0]
                if row[0] is not None:
                    mx = max(mx, int(row[0]))
        return mx + 1

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(self.root, "delta_tokenized", f"batch={batch_id:010d}")
        map_out = os.path.join(self.root, "doc_map", f"batch={batch_id:010d}")
        wm = self._read_watermark() or {"next_offset": self._next_offset(), "batches": {}}
        # replay idempotence: the batch is durable only once BOTH outputs
        # exist AND the watermark recorded it (the manifest is written last,
        # so a crash between the two parquet writes can never mark the batch
        # done with the doc_map missing).
        if (
            str(batch_id) in wm["batches"]
            and os.path.exists(os.path.join(out, "_SUCCESS"))
            and os.path.exists(os.path.join(map_out, "_SUCCESS"))
        ):
            return
        t0 = time.perf_counter()
        offset = int(wm["next_offset"])
        # project before the id-assignment shuffle: never move `html` binaries
        slim = batch_df.select(self.order_col, self.text_col)
        with_ids = assign_dense_doc_ids(slim, order_col=self.order_col).withColumn(
            "doc_id", F.col("doc_id") + F.lit(offset)
        )
        tc = term_counts_udf(self.cfg.stem)
        tokenized = with_ids.select(
            "doc_id", tc(F.col(self.text_col)).alias("_tc"), F.col(self.order_col)
        ).select("doc_id", "_tc.dl", "_tc.terms", "_tc.tfs", self.order_col)
        tokenized.persist()
        n = tokenized.count()
        tokenized.drop(self.order_col).write.mode("overwrite").parquet(out)
        tokenized.select("doc_id", self.order_col).write.mode("overwrite").parquet(map_out)
        tokenized.unpersist()
        wm["batches"][str(batch_id)] = {"offset": offset, "rows": n}
        wm["next_offset"] = offset + n
        self._write_watermark(wm)
        secs = time.perf_counter() - t0
        with open(os.path.join(self.root, "_stream_lineage.jsonl"), "a") as f:
            f.write(
                json.dumps(
                    {
                        "batch_id": batch_id,
                        "rows": n,
                        "offset": offset,
                        "seconds": round(secs, 3),
                        "docs_per_sec": round(n / secs, 1) if secs > 0 else None,
                    }
                )
                + "\n"
            )

    def start(self, input_dir: str, schema, max_files_per_trigger: int | None = None):
        """Start the stream (availableNow drains the directory then stops)."""
        reader = self.spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(input_dir)
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", os.path.join(self.root, "_stream_checkpoint"))
            .trigger(availableNow=True)
            .start()
        )


def _tokenized_union(spark: SparkSession, root: str) -> DataFrame:
    parts = []
    for sub in ("base_tokenized", "delta_tokenized"):
        path = os.path.join(root, sub)
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
        ):
            parts.append(
                spark.read.parquet(path).select("doc_id", "dl", "terms", "tfs")
            )
    if not parts:
        raise FileNotFoundError(f"no tokenized data under {root}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def refresh_index(
    spark: SparkSession, root: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> dict:
    """Merge the delta into a new index version; flip CURRENT atomically.

    Affected-terms strategy: only terms appearing in the delta re-aggregate
    (from base+delta, so their postings stay globally doc_id-sorted);
    unaffected term rows are carried over from the previous version as-is.
    """
    t0 = time.perf_counter()
    full = _tokenized_union(spark, root)
    doc_stats = full.select("doc_id", "dl")
    stats = doc_stats.agg(
        (F.max("doc_id") + F.lit(1)).alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n_docs = int(stats["n"])
    avgdl = float(stats["total"]) / n_docs if n_docs else 0.0

    def _explode(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            "dl",
            F.explode(F.arrays_zip(F.col("terms"), F.col("tfs"))).alias("_z"),
        ).select(
            "doc_id",
            F.col("_z.terms").alias("term"),
            F.col("_z.tfs").cast("long").alias("tf"),
            "dl",
        )

    delta_path = os.path.join(root, "delta_tokenized")
    prev_version = _current_version(root)
    have_delta = os.path.isdir(delta_path) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(delta_path) for f in fs
    )

    carry_safe = True
    if prev_version >= 0:
        prev_probe = load_compressed_index(
            spark, os.path.join(root, f"index_v{prev_version:05d}")
        )
        # carried rows keep block-max bounds computed under the PREVIOUS
        # (k1, b); with different parameters those bounds can under-estimate
        # and make WAND pruning unsafe (search_wand's cfg assert only sees
        # the NEW index's stamp). A parameter change forces a full rebuild.
        carry_safe = prev_probe.k1 == cfg.k1 and prev_probe.b == cfg.b

    if prev_version < 0 or not have_delta or not carry_safe:
        # first materialization, nothing new, or (k1, b) changed: full build
        affected_count = -1
        compressed = compress_tokenized(full, avgdl, cfg)
    else:
        delta_terms = (
            spark.read.parquet(delta_path)
            .select(F.explode("terms").alias("term"))
            .distinct()
        )
        affected_count = delta_terms.count()
        affected_tf = _explode(full).join(F.broadcast(delta_terms), "term")
        rebuilt = compress_doc_tf(affected_tf, avgdl, cfg)
        prev = prev_probe
        carried = prev.postings.join(F.broadcast(delta_terms), "term", "left_anti")
        # Carried block_max_tfpart was computed with the OLD avgdl. tfpart is
        # monotone in avgdl with ratio bounded by avgdl_new/avgdl_old (the
        # dl-term in the denominator scales by avgdl_old/avgdl_new and the
        # constant part only dampens), so scaling stale bounds by
        # max(1, avgdl_new/avgdl_old) keeps block-max pruning SAFE (bounds
        # may loosen, never under-estimate); exact scores are recomputed from
        # tf/dl at query time so ranks are unaffected.
        factor = max(1.0, avgdl / prev.avgdl) if prev.avgdl > 0 else 1.0
        carried = carried.withColumn(
            "block_max_tfpart",
            F.transform("block_max_tfpart", lambda x: x * F.lit(factor)),
        )
        compressed = carried.unionByName(rebuilt)

    new_version = prev_version + 1
    idx = CompressedIndex(
        postings=compressed,
        doc_stats=doc_stats,
        n_docs=n_docs,
        avgdl=avgdl,
        block_size=cfg.block_size,
        k1=cfg.k1,
        b=cfg.b,
    )
    save_compressed_index(idx, os.path.join(root, f"index_v{new_version:05d}"))
    _set_current(root, new_version)
    return {
        "version": new_version,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "affected_terms": affected_count,
        "seconds": round(time.perf_counter() - t0, 3),
    }
