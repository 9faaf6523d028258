"""Segment merge: Lucene-style compaction of compressed index segments.

The streaming path (:mod:`fulltextsearch_spark.streaming.incremental`) folds
every delta into ONE index version per refresh. The complementary strategy —
what Lucene/Elasticsearch do, and what a 10^12-doc deployment would actually
run — is to keep each ingest batch as its own immutable *segment* index and
compact segments in the background. This module is that compaction:

* each segment's compressed posting rows re-enter the partial-combine reduce
  as metadata-only partials (:func:`compressed_rows_as_partials` — zero
  decode on the map side; ``tfs_enc``/``dls_enc`` byte-concatenate and only
  doc deltas re-block when segments arrive doc-ascending, the dense-id case);
* corpus stats (N, avgdl) recompute exactly from the unioned skinny
  ``doc_stats`` tables, and every block-max bound is recomputed under the new
  avgdl — the merged index is value-identical to a batch build over the union
  corpus (pinned by tests/test_segments.py);
* merge IO is O(sum of segment index bytes): the corpus text is never read.

Scale shape: one shuffle keyed by term (the same partial-combine exchange the
batch build uses — shuffle bytes ~= compressed index size), head terms cut
into doc-range shards by ``cfg.shard_postings`` exactly as in the build.

The reference engine has no segments — its in-RAM index rebuilds from scratch
(``/root/reference/src/algorithms/inverted/inverted_index_engine.cpp:15-35``);
this operator is part of the beyond-reference persistence story (SURVEY §2.8).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from fulltextsearch_spark.config import DEFAULT_CONFIG, EngineConfig
from fulltextsearch_spark.operators.compressed_index import (
    CompressedIndex,
    _merge_partials,
    compressed_rows_as_partials,
    load_compressed_index,
    save_compressed_index,
)

__all__ = ["merge_segments", "merge_saved_indexes"]


def _reduce_union(dfs):
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def merge_segments(
    segments: Sequence[CompressedIndex],
    cfg: EngineConfig | None = None,
    validate: bool = True,
) -> CompressedIndex:
    """Merge segment indexes over DISJOINT doc-id sets into one index.

    Every segment must share (k1, b, block_size) and be varint-coded (the
    carry reinterprets enc streams as varint partials; re-save a pfor
    segment with ``codec="varint"`` first). Segments typically come from
    per-batch ingest with a continuing dense-id offset (the incremental
    indexer's contract), so their doc ranges are disjoint by construction;
    ``validate=True`` additionally asserts global doc-id disjointness with
    one aggregate over the skinny unioned ``doc_stats`` (count vs distinct).

    Doc-interleaved segments are still merged correctly — the reduce's
    sort fallback re-orders per unit — but duplicate doc ids would produce
    duplicate postings, hence the validation.
    """
    if not segments:
        raise ValueError("merge_segments needs at least one segment")
    head = segments[0]
    for s in segments[1:]:
        if (s.k1, s.b, s.block_size) != (head.k1, head.b, head.block_size):
            raise ValueError(
                "segments disagree on (k1, b, block_size): "
                f"{(s.k1, s.b, s.block_size)} vs {(head.k1, head.b, head.block_size)}"
            )
    for s in segments:
        if s.codec != "varint":
            raise ValueError(
                f"segment codec {s.codec!r} cannot be reinterpreted as varint "
                "partials; load and re-save it with codec='varint' first"
            )
    if cfg is None:
        cfg = EngineConfig(
            k1=head.k1,
            b=head.b,
            block_size=head.block_size,
            shard_postings=DEFAULT_CONFIG.shard_postings,
        )
    elif (cfg.k1, cfg.b, cfg.block_size) != (head.k1, head.b, head.block_size):
        raise ValueError("cfg (k1, b, block_size) must match the segments")

    if len(segments) == 1:
        return head

    doc_stats = _reduce_union([s.doc_stats for s in segments])
    agg = [F.count(F.lit(1)).alias("n_rows"), (F.max("doc_id") + 1).alias("n"),
           F.sum("dl").alias("total")]
    if validate:
        agg.append(F.count_distinct("doc_id").alias("n_distinct"))
    stats = doc_stats.agg(*agg).collect()[0]
    if validate and int(stats["n_rows"]) != int(stats["n_distinct"]):
        raise ValueError(
            "segments share doc ids (doc_stats rows "
            f"{int(stats['n_rows'])} vs {int(stats['n_distinct'])} distinct); "
            "segments must cover disjoint doc-id sets"
        )
    n_docs = int(stats["n"] or 0)
    avgdl = float(stats["total"]) / n_docs if n_docs else 0.0

    partials = _reduce_union(
        [compressed_rows_as_partials(s.postings, s.block_size) for s in segments]
    )
    merged = _merge_partials(partials, avgdl if avgdl > 0 else 1.0, cfg)
    return CompressedIndex(
        postings=merged,
        doc_stats=doc_stats,
        n_docs=n_docs,
        avgdl=avgdl,
        block_size=cfg.block_size,
        k1=cfg.k1,
        b=cfg.b,
    )


def merge_saved_indexes(
    spark: SparkSession,
    roots: Sequence[str],
    out_root: str | None = None,
    cfg: EngineConfig | None = None,
    validate: bool = True,
) -> CompressedIndex:
    """Load saved segment indexes, merge, and (optionally) save the result.

    ``out_root`` must not be one of ``roots`` — the merge streams from the
    source segments' parquet, so writing over an input would read-after-free.
    """
    if out_root is not None and any(
        os.path.abspath(out_root) == os.path.abspath(r) for r in roots
    ):
        raise ValueError("out_root must differ from every input root")
    merged = merge_segments(
        [load_compressed_index(spark, r) for r in roots], cfg, validate
    )
    if out_root is not None:
        save_compressed_index(merged, out_root)
        return load_compressed_index(spark, out_root)
    return merged
