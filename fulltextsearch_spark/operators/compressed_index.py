"""Physical compressed index: delta+varint posting blocks as Spark tables.

This is the on-disk / in-flight index format required by the north_star at
10^12-doc scale (the reference stores raw ``vector<(uint32,uint32)>`` pairs
and dumps them verbatim, ``/root/reference/src/data-structures/
hash_index.hpp:137-173`` — fine in one address space, untenable distributed).

One row per term (or per (term, doc-range shard) when
``cfg.shard_postings`` caps row size — see :func:`compress_doc_tf`)::

    term STRING, df BIGINT, count BIGINT,
    doc_ids_enc BINARY,   -- block-restarting delta + LEB128 varint
    tfs_enc BINARY, dls_enc BINARY,
    block_first_doc ARRAY<BIGINT>,   -- skip pointers (first docID per block)
    block_off_doc/tf/dl ARRAY<BIGINT>,  -- byte offsets: blocks decode alone
    block_max_tf ARRAY<BIGINT>,
    block_max_tfpart ARRAY<DOUBLE>,  -- max BM25 tf-part per block (block-max)
    block_max_tfdl ARRAY<DOUBLE>     -- max tf/dl per block (TF-IDF block-max)

Encoding runs in one Arrow-batched ``pandas_udf`` over the logical postings
arrays (numpy kernels from :mod:`fulltextsearch_spark.operators.compression`;
no per-row Python). Every block carries enough metadata for skip +
block-max pruning in the MaxScore/WAND query path
(:mod:`fulltextsearch_spark.operators.wand`).

Scale notes: rows are per *term*, so the table partitions/buckets by term
hash; a head term's row is large but bounded by the salted build upstream and
by varint compression (~2-3 bytes/posting vs 24 raw). The format is
streaming-friendly: blocks decode independently via byte offsets.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from fulltextsearch_spark.config import DEFAULT_CONFIG, EngineConfig
from fulltextsearch_spark.operators.compression import (
    varint_decode,
    varint_encode,
    varint_nbytes,
)
from fulltextsearch_spark.operators.index_build import IndexTables, build_index

__all__ = [
    "CompressedIndex",
    "COMPRESSED_POSTINGS_FIELDS",
    "compress_postings",
    "compress_doc_tf",
    "compress_tokenized",
    "decompress_postings",
    "build_compressed_index",
    "build_compressed_index_raw",
    "build_compressed_index_files",
    "save_compressed_index",
    "load_compressed_index",
]


COMPRESSED_POSTINGS_FIELDS = T.StructType(
    [
        T.StructField("count", T.LongType()),
        T.StructField("doc_ids_enc", T.BinaryType()),
        T.StructField("tfs_enc", T.BinaryType()),
        T.StructField("dls_enc", T.BinaryType()),
        T.StructField("block_first_doc", T.ArrayType(T.LongType())),
        T.StructField("block_off_doc", T.ArrayType(T.LongType())),
        T.StructField("block_off_tf", T.ArrayType(T.LongType())),
        T.StructField("block_off_dl", T.ArrayType(T.LongType())),
        T.StructField("block_max_tf", T.ArrayType(T.LongType())),
        T.StructField("block_max_tfpart", T.ArrayType(T.DoubleType())),
        T.StructField("block_max_tfdl", T.ArrayType(T.DoubleType())),
    ]
)


@dataclass
class CompressedIndex:
    """Physical index: compressed postings + doc stats + corpus scalars.

    ``k1``/``b`` are the BM25 parameters the block-max bounds were computed
    with at build time; the query path asserts its config matches (standard
    for impact-ordered indexes — a different (k1, b) needs a re-encode of the
    block metadata, not of the postings themselves).
    """

    postings: DataFrame  # the compressed schema above, one row per term
    doc_stats: DataFrame
    n_docs: int
    avgdl: float
    block_size: int
    k1: float
    b: float
    codec: str = "varint"  # stream codec of the enc columns ("varint"/"pfor"/"ef")


def _offsets_from_nbytes(nbytes: np.ndarray, block_starts: np.ndarray) -> np.ndarray:
    cum = np.concatenate(([0], np.cumsum(nbytes)))
    return cum[block_starts]


def _encode_one(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int,
    k1: float,
    b: float,
    avgdl: float,
    tfs_enc: bytes | None = None,
    dls_enc: bytes | None = None,
) -> dict:
    """Encode one term's sorted postings into the compressed row dict.

    ``tfs_enc``/``dls_enc`` let the streaming merge pass through already-
    encoded streams (varint streams concatenate as-is, so when partials
    arrive in doc order their joined tf/dl bytes ARE the output — only the
    doc deltas need re-encoding for block restarts).
    """
    n = doc_ids.size
    block_starts = np.arange(0, n, block_size)
    # block-restarting deltas: first value of each block stored absolute, so
    # any block decodes without its predecessors (skip support).
    deltas = np.empty(n, dtype=np.int64)
    deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    deltas[block_starts] = doc_ids[block_starts]

    tf_f = tfs.astype(np.float64)
    dl_f = dls.astype(np.float64)
    tfpart = tf_f * (k1 + 1.0) / (tf_f + k1 * (1.0 - b + b * (dl_f / float(avgdl))))
    # reference dl can be 0 only for docs with no tokens, which never appear
    # in postings; guard anyway for tf/dl.
    tfdl = np.divide(tf_f, dl_f, out=np.zeros_like(tf_f), where=dl_f > 0)

    nb_d = varint_nbytes(deltas)
    nb_t = varint_nbytes(tfs)
    nb_l = varint_nbytes(dls)
    return {
        "count": int(n),
        "doc_ids_enc": varint_encode(deltas, nb_d),
        "tfs_enc": tfs_enc if tfs_enc is not None else varint_encode(tfs, nb_t),
        "dls_enc": dls_enc if dls_enc is not None else varint_encode(dls, nb_l),
        "block_first_doc": doc_ids[block_starts].tolist(),
        "block_off_doc": _offsets_from_nbytes(nb_d, block_starts).tolist(),
        "block_off_tf": _offsets_from_nbytes(nb_t, block_starts).tolist(),
        "block_off_dl": _offsets_from_nbytes(nb_l, block_starts).tolist(),
        "block_max_tf": np.maximum.reduceat(tfs, block_starts).tolist(),
        "block_max_tfpart": np.maximum.reduceat(tfpart, block_starts).tolist(),
        "block_max_tfdl": np.maximum.reduceat(tfdl, block_starts).tolist(),
    }


_PARTIAL_FIELDS = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("seg_lens", T.ArrayType(T.LongType())),  # postings per segment
        T.StructField("doc_bytes", T.BinaryType()),  # delta+varint, absolute at each segment start
        T.StructField("tf_bytes", T.BinaryType()),  # varint
        T.StructField("dl_bytes", T.BinaryType()),  # varint
    ]
)


# pack once per ~2M buffered postings, not per 10k-row Arrow batch: an Arrow
# batch of exploded rows covers only ~50 docs, so per-batch packing would
# yield avg run length ~2 and nearly one partial per posting (measured: no
# shuffle reduction at all). Packed segments then ACCUMULATE across buffers so
# each map task emits ONE partial row per term it saw — partial-row count is
# vocab x tasks, independent of task size (per-partial-row overhead on the
# reduce side was the dominant merge cost when rows were per-buffer). Task
# memory: the sort buffer (~64 MB of int64 columns) + the task's own
# compressed output (bytes), both bounded.
_BUFFER_ROWS = 1 << 21

# reduce-side vectorized-encode sub-chunk: postings per _encode_chunk_vec
# call (measured sweet spot; see _merge_partials._encode_chunk docstring)
_MERGE_CHUNK_POSTINGS = 1 << 16


class _PartialAccumulator:
    """Accumulates packed per-term segments across a task's buffers.

    ``add_buffer`` does only vectorized work (sort, run boundaries, one
    varint encode per stream) and stores the pack; Python-level per-term
    work is deferred to :meth:`emit`. The common one-buffer-per-task case
    (row-group-sized tasks) emits ZERO-COPY: the per-term binary cells are
    adjacent slices of the encode buffer, so the output BinaryArrays are
    built from (offsets, buffer) pairs directly — no per-run byte slicing,
    no joins, no Python term boxing beyond the Arrow take.
    """

    def __init__(self):
        self.packs: list = []

    def add_buffer(self, uniq, codes, docs, tfs, dls, presorted: bool = False):
        """One buffered pack: sort by (term, doc) unless ``presorted``
        (term_counts_flat(order="term") already is), varint-encode each
        stream once, store run boundaries + encode buffers.

        ``uniq``/``codes`` are a pyarrow dictionary-encode of the per-posting
        term strings (C speed — boxing 14M Python strings per 400k docs was
        the entire cost of a pandas-object pack, measured ~5 us/posting);
        everything else is numpy on int64.
        """
        if presorted:
            # The caller sorted by (term-rank, batch-row-index); that is
            # (term, doc) order only when doc_ids are monotone in row order
            # (true for the manifest builds' arange ids, NOT for arbitrary
            # user frames or bucket-steered ids). Guard with one vectorized
            # check — scrambled ids would still merge correctly via the
            # reduce-side sort fallback, but with bloated negative-delta
            # varints and the slow per-unit path, so fall back here instead.
            if codes.size > 1:
                same = codes[1:] == codes[:-1]
                presorted = not bool(np.any(same & (docs[1:] <= docs[:-1])))
        if not presorted:
            order = np.lexsort((docs, codes))
            codes, docs, tfs, dls = codes[order], docs[order], tfs[order], dls[order]
        starts = np.concatenate(([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1))
        ends = np.concatenate((starts[1:], [codes.size]))
        deltas = np.empty_like(docs)
        deltas[1:] = docs[1:] - docs[:-1]
        deltas[starts] = docs[starts]
        # one vectorized encode per stream; per-term slices via byte offsets
        nb_d, nb_t, nb_l = varint_nbytes(deltas), varint_nbytes(tfs), varint_nbytes(dls)
        off_d = np.concatenate(([0], np.cumsum(nb_d)))
        off_t = np.concatenate(([0], np.cumsum(nb_t)))
        off_l = np.concatenate(([0], np.cumsum(nb_l)))
        enc_d = varint_encode(deltas, nb_d)
        enc_t = varint_encode(tfs, nb_t)
        enc_l = varint_encode(dls, nb_l)
        self.packs.append(
            (uniq, codes, starts, ends, docs[starts], enc_d, enc_t, enc_l,
             off_d, off_t, off_l)
        )

    @staticmethod
    def _pack_batch(pack):
        """One pack -> one RecordBatch, zero-copy: per-term binary cells are
        adjacent slices of the encode buffer, so the BinaryArrays are built
        from (offsets, buffer) pairs directly."""
        import pyarrow as pa  # noqa: PLC0415

        uniq, codes, starts, ends, first_docs, enc_d, enc_t, enc_l, off_d, off_t, off_l = pack
        n_runs = starts.size
        term_arr = uniq.take(pa.array(codes[starts]))
        bounds = np.append(starts, codes.size)

        def _bin(off, enc):
            # int32 BinaryArray offsets wrap silently past 2 GiB — packs are
            # row-group-sized today so this is a tripwire, not a live path
            if off[bounds][-1] > np.iinfo(np.int32).max:
                raise OverflowError(
                    "_pack_batch: encoded pack exceeds 2 GiB; shrink the pack "
                    "(rows per pack) or switch this cell to pa.large_binary()"
                )
            offs = np.ascontiguousarray(off[bounds], dtype=np.int32)
            return pa.Array.from_buffers(
                pa.binary(), n_runs, [None, pa.py_buffer(offs), pa.py_buffer(enc)]
            )

        seg_lens = pa.ListArray.from_arrays(
            np.arange(n_runs + 1, dtype=np.int32),
            pa.array(ends - starts, type=pa.int64()),
        )
        return pa.RecordBatch.from_arrays(
            [
                term_arr.cast(pa.string()),
                pa.array(first_docs, type=pa.int64()),
                seg_lens,
                _bin(off_d, enc_d),
                _bin(off_t, enc_t),
                _bin(off_l, enc_l),
            ],
            names=["term", "first_doc", "seg_lens", "doc_bytes", "tf_bytes", "dl_bytes"],
        )

    def emit_batches(self) -> list:
        """Zero-copy path for row-group-sized buffers: one RecordBatch PER
        PACK (so per-term rows = vocab x row-groups rather than vocab x
        tasks — a ~rg/task factor, not the per-50-doc-buffer blowup the
        dict merge exists to prevent). The term-sharded merge already
        combines multiple partial rows per term by (term, first_doc)."""
        packs, self.packs = self.packs, []
        return [self._pack_batch(p) for p in packs]

    def emit(self):
        """One RecordBatch with a single row per term seen by this task."""
        import pyarrow as pa  # noqa: PLC0415

        packs, self.packs = self.packs, []
        if not packs:
            return None
        if len(packs) == 1:
            return self._pack_batch(packs[0])
        acc: dict = {}
        for uniq, codes, starts, ends, first_docs, enc_d, enc_t, enc_l, off_d, off_t, off_l in packs:
            run_terms = uniq.take(
                __import__("pyarrow").array(codes[starts])
            ).to_pylist()
            for i, (s, e) in enumerate(zip(starts, ends)):
                ent = acc.get(run_terms[i])
                if ent is None:
                    ent = acc[run_terms[i]] = [int(first_docs[i]), [], [], [], []]
                ent[1].append(int(e - s))
                ent[2].append(bytes(enc_d[off_d[s] : off_d[e]]))
                ent[3].append(bytes(enc_t[off_t[s] : off_t[e]]))
                ent[4].append(bytes(enc_l[off_l[s] : off_l[e]]))
        terms = list(acc.keys())
        ents = [acc[t] for t in terms]
        return pa.RecordBatch.from_arrays(
            [
                pa.array(terms, type=pa.string()),
                pa.array([e[0] for e in ents], type=pa.int64()),
                pa.array([e[1] for e in ents], type=pa.list_(pa.int64())),
                pa.array([b"".join(e[2]) for e in ents], type=pa.binary()),
                pa.array([b"".join(e[3]) for e in ents], type=pa.binary()),
                pa.array([b"".join(e[4]) for e in ents], type=pa.binary()),
            ],
            names=["term", "first_doc", "seg_lens", "doc_bytes", "tf_bytes", "dl_bytes"],
        )


def _partial_rows(doc_tf: DataFrame) -> DataFrame:
    """Map-side combine: pack exploded (doc_id, term, tf, dl) rows into
    delta+varint byte partials BEFORE the term shuffle.

    One output row per (term, map task): the shuffle then moves
    ~vocab x partitions compact binary rows (~4 bytes/posting) instead of one
    35+-byte row per (doc, term) — measured ~7x fewer shuffle bytes and
    orders-of-magnitude fewer shuffle rows on the web corpus, which is what
    makes the build scale with cores instead of with shuffle disk bandwidth.
    These partials keyed by source partition ARE the salted partial runs of
    the north rule's skew-handling merge: a head term's work is spread over
    every map task, and the reduce side only concatenates byte streams.
    """

    def _map(batches):
        import pyarrow as pa  # noqa: PLC0415
        import pyarrow.compute as pc  # noqa: PLC0415

        packer = _PartialAccumulator()

        def pack(tbls):
            tbl = pa.concat_tables(tbls).combine_chunks()
            dict_arr = pc.dictionary_encode(tbl.column("term").chunk(0))
            packer.add_buffer(
                dict_arr.dictionary,
                dict_arr.indices.to_numpy().astype(np.int64),
                tbl.column("doc_id").to_numpy().astype(np.int64),
                tbl.column("tf").to_numpy().astype(np.int64),
                tbl.column("dl").to_numpy().astype(np.int64),
            )

        buf: list = []
        buffered = 0
        for rb in batches:
            if rb.num_rows == 0:
                continue
            buf.append(pa.Table.from_batches([rb]))
            buffered += rb.num_rows
            if buffered >= _BUFFER_ROWS:
                pack(buf)
                buf, buffered = [], 0
        if buf:
            pack(buf)
        out = packer.emit()
        if out is not None:
            yield out

    return doc_tf.mapInArrow(_map, schema=_PARTIAL_FIELDS)


def _partial_rows_tokenized(with_tc: DataFrame) -> DataFrame:
    """Map-side combine straight from the tokenized (doc_id, dl, terms, tfs)
    frame — no JVM ``explode`` and no per-posting duplication of doc_id/dl in
    the Arrow stream. ``list_flatten`` exposes the per-posting term and
    tf values zero-copy; doc_id/dl are broadcast with one ``np.repeat``.
    """

    def _map(batches):
        import pyarrow as pa  # noqa: PLC0415
        import pyarrow.compute as pc  # noqa: PLC0415

        packer = _PartialAccumulator()

        def pack(tbls):
            tbl = pa.concat_tables(tbls).combine_chunks()
            terms_la = tbl.column("terms").chunk(0)
            tfs_la = tbl.column("tfs").chunk(0)
            counts = pc.list_value_length(terms_la).to_numpy().astype(np.int64)
            dict_arr = pc.dictionary_encode(pc.list_flatten(terms_la))
            packer.add_buffer(
                dict_arr.dictionary,
                dict_arr.indices.to_numpy().astype(np.int64),
                np.repeat(tbl.column("doc_id").to_numpy().astype(np.int64), counts),
                pc.list_flatten(tfs_la).to_numpy().astype(np.int64),
                np.repeat(tbl.column("dl").to_numpy().astype(np.int64), counts),
            )

        buf: list = []
        buffered = 0  # postings, not rows
        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb])
            buf.append(tbl)
            buffered += int(
                pc.sum(pc.list_value_length(tbl.column("terms"))).as_py() or 0
            )
            if buffered >= _BUFFER_ROWS:
                pack(buf)
                buf, buffered = [], 0
        if buf:
            pack(buf)
        out = packer.emit()
        if out is not None:
            yield out

    return with_tc.select("doc_id", "dl", "terms", "tfs").mapInArrow(
        _map, schema=_PARTIAL_FIELDS
    )


def _open_parquet(path: str):
    """Open a parquet file for footer/row-group reads on ANY pyarrow.fs-
    supported store: local paths and ``file://`` URIs go straight to
    :class:`pyarrow.parquet.ParquetFile`; other URI schemes (s3://, hdfs://,
    gs://) resolve through ``pyarrow.fs.FileSystem.from_uri`` — they must
    NOT be mangled into local paths (a stripped-scheme s3 key is not a
    filesystem path)."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    if "://" in path and not path.startswith("file://"):
        from pyarrow import fs as pafs  # noqa: PLC0415

        filesystem, inner = pafs.FileSystem.from_uri(path)
        return pq.ParquetFile(filesystem.open_input_file(inner))
    local = path.removeprefix("file://")
    if not local.startswith("/"):
        local = "/" + local.lstrip("/")
    return pq.ParquetFile(local)


# Sentinel "term" for per-task (doc_id, dl) streams in the fused build.
# Cannot collide with a real term: tokens consist only of the 67 whitelist
# chars, and \x00 is a delimiter byte.
_DOCSTATS_TERM = "\x00docstats"
# Scalar sibling of the docstats sentinel: one row per task carrying the
# task's pre-aggregated (max doc_id in first_doc, [n_docs, sum_dl] in
# seg_lens) so n_docs/avgdl reduce with a pure-JVM agg over the cached
# partials — no Python decode stage on the build's critical path (it was
# ~12% of a 2-core build).
_DOCAGG_TERM = "\x00docagg"


def _docstats_sentinel(doc_parts: list[np.ndarray], dl_parts: list[np.ndarray]):
    """TWO sentinel partial rows: this task's (doc_id, dl) streams plus the
    scalar pre-aggregate row (see ``_DOCAGG_TERM``)."""
    import pyarrow as pa  # noqa: PLC0415

    docs_all = np.concatenate(doc_parts)
    dls_all = np.concatenate(dl_parts)
    o = np.argsort(docs_all, kind="stable")
    docs_all, dls_all = docs_all[o], dls_all[o]
    deltas = np.empty_like(docs_all)
    deltas[0] = docs_all[0]
    deltas[1:] = np.diff(docs_all)
    return pa.RecordBatch.from_arrays(
        [
            pa.array([_DOCSTATS_TERM, _DOCAGG_TERM], type=pa.string()),
            pa.array([int(docs_all[0]), int(docs_all[-1])], type=pa.int64()),
            pa.array(
                [[int(docs_all.size)], [int(docs_all.size), int(dls_all.sum())]],
                type=pa.list_(pa.int64()),
            ),
            pa.array([varint_encode(deltas), b""], type=pa.binary()),
            pa.array([b"", b""], type=pa.binary()),
            pa.array([varint_encode(dls_all), b""], type=pa.binary()),
        ],
        names=["term", "first_doc", "seg_lens", "doc_bytes", "tf_bytes", "dl_bytes"],
    )


def _partial_rows_fused(
    docs: DataFrame,
    text_col: str,
    stem: bool,
    bucket_offsets: dict[int, int] | None = None,
) -> DataFrame:
    """text -> tokenize -> delta+varint partials in ONE Arrow pass.

    Fuses :func:`~fulltextsearch_spark.operators.index_build._tokenized` and
    :func:`_partial_rows_tokenized`: the tokenized token arrays are never
    materialized, cached, or re-serialized over Arrow IPC — the
    ``term_counts_flat`` outputs (term ranks + counts) feed the partial
    packer directly in the same Python worker (the IPC read-back of the
    cached tokenized table was ~30% of the pack stage, measured via the UDF
    profiler). Each task additionally emits ONE sentinel row
    (``_DOCSTATS_TERM``) carrying its delta+varint (doc_id, dl) streams so
    corpus stats and ``doc_stats`` come from the same single pass.

    With ``bucket_offsets`` the input is the *arranged* frame of
    :func:`~fulltextsearch_spark.sources.ingest.arranged_with_offsets`
    (``_b`` bucket column, rows sorted (``_b``, order key)) and dense doc_ids
    are assigned INSIDE this pass (offset + per-bucket running counter,
    identical ids to ``assign_dense_doc_ids`` by construction) — the text
    then crosses the Python boundary exactly once for the whole build and
    never returns to the JVM.
    """

    def _map(batches):
        import pyarrow as pa  # noqa: PLC0415

        from fulltextsearch_spark.functions.tokenizer import term_counts_flat  # noqa: PLC0415

        packer = _PartialAccumulator()
        doc_parts: list[np.ndarray] = []
        dl_parts: list[np.ndarray] = []
        used: dict[int, int] = {}
        for rb in batches:
            if rb.num_rows == 0:
                continue
            if bucket_offsets is None:
                doc_ids = rb.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            else:
                buckets = rb.column("_b").to_numpy(zero_copy_only=False).astype(np.int64)
                doc_ids = np.empty(buckets.size, dtype=np.int64)
                # rows arrive sorted by bucket within the partition; running
                # counters keep ids correct across Arrow batches
                for b in np.unique(buckets):
                    m = buckets == b
                    start = bucket_offsets[int(b)] + used.get(int(b), 0)
                    n_b = int(m.sum())
                    doc_ids[m] = np.arange(start, start + n_b, dtype=np.int64)
                    used[int(b)] = used.get(int(b), 0) + n_b
            dl, sorted_terms, ud, uc, cnt = term_counts_flat(
                rb.column("text"), stem, order="term"
            )
            doc_parts.append(doc_ids)
            dl_parts.append(dl)
            if uc.size:
                packer.add_buffer(
                    sorted_terms, uc, doc_ids[ud], cnt, dl[ud], presorted=True
                )
        yield from packer.emit_batches()
        if doc_parts:
            yield _docstats_sentinel(doc_parts, dl_parts)

    if bucket_offsets is None:
        slim = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"), F.col(text_col).alias("text")
        )
    else:
        slim = docs.select(F.col("_b"), F.col(text_col).alias("text"))
    return slim.mapInArrow(_map, schema=_PARTIAL_FIELDS)


def _decode_doc_stats(sentinels: DataFrame) -> DataFrame:
    """Sentinel partial rows -> (doc_id, dl) frame."""

    def _map(batches):
        import pyarrow as pa  # noqa: PLC0415

        for rb in batches:
            for i in range(rb.num_rows):
                n = int(rb.column("seg_lens")[i][0].as_py())
                deltas = varint_decode(
                    rb.column("doc_bytes")[i].as_py(), n
                ).astype(np.int64)
                dls = varint_decode(rb.column("dl_bytes")[i].as_py(), n).astype(np.int64)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.cumsum(deltas)), pa.array(dls)],
                    names=["doc_id", "dl"],
                )

    return sentinels.mapInArrow(_map, "doc_id long, dl long")


def compress_doc_tf(
    doc_tf: DataFrame,
    avgdl: float,
    cfg: EngineConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, term, tf, dl) rows -> compressed per-term rows, directly.

    THE scalable build path, classic MapReduce-indexer shape:

    1. map-side combine (:func:`_partial_rows`): each input partition packs
       its per-term postings into delta+varint byte partials — all heavy
       encode CPU happens here, embarrassingly parallel, pre-shuffle;
    2. shuffle the compact partials by term (bytes moved ≈ compressed index
       size, not exploded-row size) and sort (term, first_doc) with Spark's
       external shuffle sort;
    3. streaming reduce: per term, concatenate the partial byte streams
       (varint streams concatenate as-is; docID absolutes are restored with
       one segmented-cumsum fixup), then emit the block-restarting encoded
       row with block-max metadata via ``_encode_one``.

    No ``collect_list``/``sort_array`` materializing multi-hundred-MB JVM
    arrays per head term; reduce memory is bounded by one term's numpy
    buffers. At 10^12 docs a head term's postings exceed one task:
    ``cfg.shard_postings`` caps the per-row buffer by emitting multiple
    self-contained doc-range rows per head term (each with its own
    blocks/offsets/block-max); readers treat every row as an independent
    posting slice and derive the term's df as the sum of row counts
    (pinned by tests/test_skew.py::test_sharded_head_term*).
    """
    return _merge_partials(_partial_rows(doc_tf), avgdl, cfg, num_partitions)


def compress_tokenized(
    with_tc: DataFrame,
    avgdl: float,
    cfg: EngineConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
) -> DataFrame:
    """Tokenized (doc_id, dl, terms, tfs) frame -> compressed per-term rows.

    Same pipeline as :func:`compress_doc_tf` but the map-side combine reads
    the token arrays directly (:func:`_partial_rows_tokenized`) — no JVM
    explode and ~3x less Arrow traffic per posting. Preferred whenever the
    tokenized frame is at hand (build, checkpointed chunks, streaming merge).
    """
    return _merge_partials(_partial_rows_tokenized(with_tc), avgdl, cfg, num_partitions)


def _merge_partials(
    partials: DataFrame,
    avgdl: float,
    cfg: EngineConfig,
    num_partitions: int | None = None,
) -> DataFrame:
    block_size, k1, b = cfg.block_size, cfg.k1, cfg.b
    spark = partials.sparkSession
    n_parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    out_schema = T.StructType(
        [T.StructField("term", T.StringType()), T.StructField("df", T.LongType())]
        + list(COMPRESSED_POSTINGS_FIELDS.fields)
    )

    shard_after = cfg.shard_postings  # None -> one row per term
    out_cols = [f.name for f in out_schema.fields]

    def _encode_chunk(pdf) -> list[dict]:
        """Vectorized encode in term-aligned sub-chunks of bounded postings.

        The cap keeps every scratch array ~0.5 MB: small enough that the
        allocator reuses warm heap pages instead of mmap-ing fresh ones.
        Whole-batch encoding (arrays 10-300 MB) measured 2-8x SLOWER than
        even the per-term loop on this class of VM — first-touch page
        faults on every fresh large allocation dwarf the saved numpy call
        overhead. 64k postings is the measured sweet spot (old per-term
        loop 8.5-14.6s on a 44M-posting merge; 64k-chunked vector kernel
        4.6-7.7s; 1M-chunked 26-35s). A unit larger than the cap (head
        term up to ``shard_after``) still encodes in one piece — same
        bound the per-term path had.
        """
        counts = np.fromiter(
            (sum(s) for s in pdf["seg_lens"].to_numpy()),
            dtype=np.int64,
            count=len(pdf),
        )
        cum = np.cumsum(counts)
        terms_a = pdf["term"].to_numpy()
        tb_ends = np.concatenate(
            (np.flatnonzero(terms_a[1:] != terms_a[:-1]) + 1, [len(pdf)])
        )
        out: list[dict] = []
        start = 0
        while start < len(pdf):
            base = cum[start - 1] if start else 0
            j = int(np.searchsorted(cum[tb_ends - 1], base + _MERGE_CHUNK_POSTINGS))
            end = int(tb_ends[min(j, len(tb_ends) - 1)])
            out.extend(
                _encode_chunk_vec(
                    pdf.iloc[start:end], shard_after, block_size, k1, b, avgdl
                )
            )
            start = end
        return out

    def _merge_stream(batches):
        import pandas as pd  # noqa: PLC0415

        carry = None  # rows of the final (possibly incomplete) term
        rows: list[dict] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            terms = pdf["term"].to_numpy()
            not_last = np.flatnonzero(terms != terms[-1])
            cut = int(not_last[-1]) + 1 if not_last.size else 0
            if cut == 0:
                # whole batch is one term — hold it. Bound: a term has at
                # most one partial row per map TASK from the dict-merge
                # emit, or one per row-group pack from emit_batches — so
                # the carry holds at most tasks x packs-per-task rows of
                # ONE term's compact byte partials, not posting rows.
                carry = pdf
                continue
            rows.extend(_encode_chunk(pdf.iloc[:cut]))
            carry = pdf.iloc[cut:]
            if len(rows) >= 1024:
                out, rows = rows, []
                yield pd.DataFrame(out)[out_cols]
        if carry is not None and len(carry):
            rows.extend(_encode_chunk(carry))
        if rows:
            yield pd.DataFrame(rows)[out_cols]

    arranged = partials.repartition(n_parts, F.col("term")).sortWithinPartitions(
        "term", "first_doc"
    )
    return arranged.mapInPandas(_merge_stream, schema=out_schema)


def _encode_chunk_vec(
    pdf,
    shard_after: int | None,
    block_size: int,
    k1: float,
    b: float,
    avgdl: float,
) -> list[dict]:
    """All rows of COMPLETE units -> output row dicts, batch-vectorized.

    The per-term streaming flush this replaces spent ~0.9 ms of numpy
    call overhead per term (10k-term corpus: 9s single-core merge, only
    a third of it byte work). Here every decode, delta/varint encode,
    and block-max reduction runs ONCE over the whole pandas batch;
    per-unit rows are byte/array slices (unit = term, or (term,
    doc-range shard) when ``shard_after`` cuts a head term — cut points
    replicate the streaming rule: emit once the running posting count
    since the last cut reaches the threshold, at partial-row
    granularity). Units whose concatenated partials are not already
    doc-ascending (never the case under dense id assignment) fall back
    to the per-unit sort+re-encode path.
    """
    nrows = len(pdf)
    if nrows == 0:
        return []
    terms = pdf["term"].to_numpy()
    segs_list = pdf["seg_lens"].to_numpy()
    db = pdf["doc_bytes"].to_numpy()
    tb = pdf["tf_bytes"].to_numpy()
    lb = pdf["dl_bytes"].to_numpy()
    seg_all = (
        np.concatenate([np.asarray(s, dtype=np.int64) for s in segs_list])
        if nrows
        else np.empty(0, dtype=np.int64)
    )
    row_nsegs = np.fromiter((len(s) for s in segs_list), dtype=np.int64, count=nrows)
    seg_row_ends = np.cumsum(row_nsegs)
    seg_cum = np.concatenate(([0], np.cumsum(seg_all)))
    row_ppos = np.concatenate(([0], seg_cum[seg_row_ends]))  # postings before each row
    row_counts = np.diff(row_ppos)
    total = int(row_ppos[-1])
    if total == 0:
        return []

    change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
    t_starts = np.concatenate(([0], change))
    t_ends = np.concatenate((change, [nrows]))
    if shard_after is None:
        u_starts_rows, u_ends_rows = t_starts, t_ends
    else:
        us: list[int] = []
        ue: list[int] = []
        for s, e in zip(t_starts, t_ends):
            if row_ppos[e] - row_ppos[s] < shard_after:
                us.append(int(s))
                ue.append(int(e))
                continue
            pending = 0
            start = int(s)
            for i in range(int(s), int(e)):
                pending += int(row_counts[i])
                if pending >= shard_after:
                    us.append(start)
                    ue.append(i + 1)
                    start = i + 1
                    pending = 0
            if start < e:
                us.append(start)
                ue.append(int(e))
        u_starts_rows = np.asarray(us, dtype=np.int64)
        u_ends_rows = np.asarray(ue, dtype=np.int64)

    u_pstart = row_ppos[u_starts_rows]
    u_pend = row_ppos[u_ends_rows]
    u_counts = u_pend - u_pstart

    db_all = b"".join(db)
    tb_all = b"".join(tb)
    lb_all = b"".join(lb)
    dec = varint_decode(db_all, total).astype(np.int64)
    tfs = varint_decode(tb_all, total).astype(np.int64)
    dls = varint_decode(lb_all, total).astype(np.int64)
    seg_starts = seg_cum[:-1][seg_all > 0] if np.any(seg_all == 0) else seg_cum[:-1]
    seg_lens_nz = seg_all[seg_all > 0] if np.any(seg_all == 0) else seg_all
    c = np.cumsum(dec)
    # each segment stores its first docID absolute, the rest as deltas:
    # docs[i] = c[i] - (cumsum before the segment) within each segment
    offs = c[seg_starts] - dec[seg_starts]
    docs = c - np.repeat(offs, seg_lens_nz)

    # per-row INPUT byte ranges (tf/dl streams pass through byte-exact)
    tb_lens = np.fromiter((len(x) for x in tb), dtype=np.int64, count=nrows)
    lb_lens = np.fromiter((len(x) for x in lb), dtype=np.int64, count=nrows)
    tb_off = np.concatenate(([0], np.cumsum(tb_lens)))
    lb_off = np.concatenate(([0], np.cumsum(lb_lens)))

    # global block starts: unit start + k*block_size
    nblocks_u = (u_counts + block_size - 1) // block_size
    tot_blocks = int(nblocks_u.sum())
    bl_cum = np.concatenate(([0], np.cumsum(nblocks_u)))
    bidx = np.arange(tot_blocks, dtype=np.int64) - np.repeat(bl_cum[:-1], nblocks_u)
    block_starts = np.repeat(u_pstart, nblocks_u) + bidx * block_size

    # block-restarting deltas: first value of each block stored absolute
    deltas = np.empty(total, dtype=np.int64)
    deltas[1:] = docs[1:] - docs[:-1]
    deltas[block_starts] = docs[block_starts]

    # units whose docs are not strictly ascending need the sort fallback
    bad_units: set[int] = set()
    viol = np.flatnonzero(docs[1:] <= docs[:-1]) + 1
    if viol.size:
        # a violation at position p belongs to the unit covering p; it is
        # real unless p is that unit's own start (units restart absolute)
        unit_of = np.searchsorted(u_pend, viol, side="right")
        real = viol != u_pstart[unit_of]
        for q in np.unique(unit_of[real]):
            bad_units.add(int(q))

    nb_d = varint_nbytes(deltas)
    enc_all = varint_encode(deltas, nb_d)
    cum_d = np.concatenate(([0], np.cumsum(nb_d)))
    cum_t = np.concatenate(([0], np.cumsum(varint_nbytes(tfs))))
    cum_l = np.concatenate(([0], np.cumsum(varint_nbytes(dls))))

    tf_f = tfs.astype(np.float64)
    dl_f = dls.astype(np.float64)
    tfpart = tf_f * (k1 + 1.0) / (tf_f + k1 * (1.0 - b + b * (dl_f / float(avgdl))))
    tfdl = np.divide(tf_f, dl_f, out=np.zeros_like(tf_f), where=dl_f > 0)
    bmax_tf = np.maximum.reduceat(tfs, block_starts)
    bmax_tfpart = np.maximum.reduceat(tfpart, block_starts)
    bmax_tfdl = np.maximum.reduceat(tfdl, block_starts)
    bfirst = docs[block_starts]
    boff_d = cum_d[block_starts]
    boff_t = cum_t[block_starts]
    boff_l = cum_l[block_starts]

    rows_out: list[dict] = []
    for u in range(len(u_counts)):
        b0, b1 = int(bl_cum[u]), int(bl_cum[u + 1])
        rs, re_ = int(u_starts_rows[u]), int(u_ends_rows[u])
        ps, pe = int(u_pstart[u]), int(u_pend[u])
        if u in bad_units:
            o = np.argsort(docs[ps:pe], kind="stable")
            row = _encode_one(
                docs[ps:pe][o], tfs[ps:pe][o], dls[ps:pe][o],
                block_size, k1, b, avgdl,
            )
        else:
            row = {
                "count": pe - ps,
                "doc_ids_enc": enc_all[cum_d[ps]:cum_d[pe]],
                "tfs_enc": tb_all[tb_off[rs]:tb_off[re_]],
                "dls_enc": lb_all[lb_off[rs]:lb_off[re_]],
                "block_first_doc": bfirst[b0:b1].tolist(),
                "block_off_doc": (boff_d[b0:b1] - cum_d[ps]).tolist(),
                "block_off_tf": (boff_t[b0:b1] - cum_t[ps]).tolist(),
                "block_off_dl": (boff_l[b0:b1] - cum_l[ps]).tolist(),
                "block_max_tf": bmax_tf[b0:b1].tolist(),
                "block_max_tfpart": bmax_tfpart[b0:b1].tolist(),
                "block_max_tfdl": bmax_tfdl[b0:b1].tolist(),
            }
        row["term"] = terms[rs]
        row["df"] = pe - ps
        rows_out.append(row)
    return rows_out


def compressed_rows_as_partials(postings: DataFrame, block_size: int) -> DataFrame:
    """Reinterpret compressed index rows as partial-combine rows, METADATA-ONLY.

    A compressed row's streams are already in the partial format
    (:data:`_PARTIAL_FIELDS`): ``doc_ids_enc`` stores an absolute value at
    every block start and deltas elsewhere — exactly a multi-segment partial
    with one segment per block — and ``tfs_enc``/``dls_enc`` are plain varint
    streams that concatenate as-is. No byte is decoded or copied here; the
    reduce side (``_merge_partials``) re-blocks affected terms once, bounded
    by those terms' compressed bytes. Shared by the streaming refresh
    (carry-forward of affected terms) and the segment-merge compaction path
    (:mod:`fulltextsearch_spark.operators.segments`).
    """
    nb = F.size("block_first_doc")
    seg_lens = F.concat(
        F.array_repeat(F.lit(block_size).cast("long"), nb - F.lit(1)),
        F.array((F.col("count") - (nb - F.lit(1)) * F.lit(block_size)).cast("long")),
    )
    return postings.select(
        "term",
        F.element_at("block_first_doc", 1).cast("long").alias("first_doc"),
        seg_lens.alias("seg_lens"),
        F.col("doc_ids_enc").alias("doc_bytes"),
        F.col("tfs_enc").alias("tf_bytes"),
        F.col("dls_enc").alias("dl_bytes"),
    )


def compress_postings(index: IndexTables, cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Logical postings arrays -> compressed block format (Arrow-batched)."""
    block_size, k1, b, avgdl = cfg.block_size, cfg.k1, cfg.b, index.avgdl

    @pandas_udf(COMPRESSED_POSTINGS_FIELDS)
    def _encode(doc_ids: pd.Series, tfs: pd.Series, dls: pd.Series) -> pd.DataFrame:
        rows = [
            _encode_one(
                np.asarray(d, dtype=np.int64),
                np.asarray(t, dtype=np.int64),
                np.asarray(l, dtype=np.int64),
                block_size,
                k1,
                b,
                avgdl,
            )
            for d, t, l in zip(doc_ids, tfs, dls)
        ]
        return pd.DataFrame(rows)

    return index.postings.select(
        "term",
        F.col("df").cast("long").alias("df"),
        _encode(
            F.col("postings.doc_id"), F.col("postings.tf"), F.col("postings.dl")
        ).alias("_c"),
    ).select("term", "df", "_c.*")


def decompress_postings(
    compressed: DataFrame, block_size: int, codec: str = "varint"
) -> DataFrame:
    """Inverse transform, for round-trip tests and the exhaustive oracle path:
    compressed rows -> (term, df, postings ARRAY<STRUCT<doc_id, tf, dl>>)."""
    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("tf", T.LongType()),
                T.StructField("dl", T.LongType()),
            ]
        )
    )

    @pandas_udf(out_type)
    def _decode(count: pd.Series, enc_doc: pd.Series, enc_tf: pd.Series, enc_dl: pd.Series) -> pd.Series:
        out = []
        dec = varint_decode
        if codec == "pfor":
            from fulltextsearch_spark.operators.compression import pfor_decode  # noqa: PLC0415

            dec = pfor_decode
        elif codec == "ef":
            from fulltextsearch_spark.operators.compression import ef_decode  # noqa: PLC0415

            dec = ef_decode
        for n, ed, et, el in zip(count, enc_doc, enc_tf, enc_dl):
            n = int(n)
            deltas = dec(bytes(ed), n).astype(np.int64)
            doc_ids = np.cumsum(deltas)
            starts = np.arange(0, n, block_size)
            if starts.size > 1:
                doc_ids = deltas.copy()
                for s in starts:
                    e = min(s + block_size, n)
                    doc_ids[s:e] = np.cumsum(deltas[s:e])
            tfs = dec(bytes(et), n).astype(np.int64)
            dls = dec(bytes(el), n).astype(np.int64)
            out.append(
                [
                    {"doc_id": int(d), "tf": int(t), "dl": int(l)}
                    for d, t, l in zip(doc_ids, tfs, dls)
                ]
            )
        return pd.Series(out)

    return compressed.select(
        "term",
        "df",
        _decode(
            F.col("count"), F.col("doc_ids_enc"), F.col("tfs_enc"), F.col("dls_enc")
        ).alias("postings"),
    )


def build_compressed_index(
    spark: SparkSession,
    docs: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    text_col: str = "text",
) -> CompressedIndex:
    """Corpus -> compressed physical index in ONE fused map pass + shuffle.

    :func:`_partial_rows_fused` tokenizes and packs delta+varint partials in
    the same Arrow worker pass (no tokenized-table materialization at all);
    the small partials table is what gets persisted — roughly compressed-
    index-sized, vs ~input-text-sized for the tokenized cache it replaces.
    Corpus stats and ``doc_stats`` decode from the per-task sentinel rows.
    """
    return _index_from_partials(_partial_rows_fused(docs, text_col, cfg.stem), cfg)


def build_compressed_index_raw(
    spark: SparkSession,
    raw: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    order_col: str = "url",
    text_col: str = "text",
) -> CompressedIndex:
    """RAW corpus (no doc_id yet) -> compressed index, maximally fused.

    Composes :func:`~fulltextsearch_spark.sources.ingest.arranged_with_offsets`
    with :func:`_partial_rows_fused`: dense id assignment, tokenization, and
    partial packing all run inside ONE ``mapInArrow`` pass over the arranged
    shuffle — the text moves through Python exactly once and only compact
    binary partials come back (the separate ``assign_dense_doc_ids`` pass
    was ~30% of wall-clock build time at 8 cores). Ids are identical to the
    two-pass path by construction (pinned by tests/test_skew.py).

    Note: this path does not materialize a (url, doc_id) map; ingest with
    ``assign_dense_doc_ids`` first when a doc map is needed.
    """
    from fulltextsearch_spark.sources.ingest import arranged_with_offsets  # noqa: PLC0415

    arranged, offsets = arranged_with_offsets(
        raw.select(order_col, text_col), order_col
    )
    return _index_from_partials(
        _partial_rows_fused(arranged, text_col, cfg.stem, bucket_offsets=offsets), cfg
    )


def build_compressed_index_files(
    spark: SparkSession,
    input_path: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    text_col: str = "text",
) -> CompressedIndex:
    """Parquet directory -> compressed index with ZERO ingest shuffle.

    Ids come from :func:`~fulltextsearch_spark.sources.ingest.
    assign_file_order_doc_ids` (sorted-file order — the reference's own
    ingest semantic, parquet2parquet.py:8-56), a narrow expression over scan
    metadata; the fused tokenize+pack map then runs directly on the scan
    partitions. The build's ONLY wide operation is the term shuffle of
    compressed partials. The fastest build path; pick
    :func:`build_compressed_index_raw` when ids must follow a key order.
    """
    import os  # noqa: PLC0415

    from fulltextsearch_spark.sources.ingest import assign_file_order_doc_ids  # noqa: PLC0415

    # size scan partitions to the cluster: with no ingest shuffle the scan
    # partitioning IS the build parallelism, and the 128 MB default packs a
    # small-file corpus into a couple of tasks (observed: 2 tasks on 8
    # cores). Target ~2 tasks/core, clamped to [4 MB, 128 MB].
    total = sum(
        os.path.getsize(f[7:] if f.startswith("file://") else f)
        for f in spark.read.parquet(input_path).inputFiles()
    )
    par = max(spark.sparkContext.defaultParallelism, 1)
    target = min(max(total // (2 * par) + 1, 4 << 20), 128 << 20)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))
    try:
        docs = assign_file_order_doc_ids(spark, input_path, columns=[text_col])
        # stats collect inside materializes the partials cache, so the conf
        # can be restored as soon as this returns
        return _index_from_partials(_partial_rows_fused(docs, text_col, cfg.stem), cfg)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def build_compressed_index_pyfiles(
    spark: SparkSession,
    input_path: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    text_col: str = "text",
    batch_rows: int = 10_000,
    tasks_per_core: int = 4,
) -> CompressedIndex:
    """Parquet directory -> compressed index, workers reading parquet
    DIRECTLY with pyarrow (no JVM decode, no Arrow-IPC text hop).

    :func:`build_compressed_index_files` routes text through the JVM scan:
    parquet -> JVM column decode -> Arrow IPC -> Python worker. For this
    build the text is opaque to every JVM operator (no filter, no join
    touches it), so that decode+serialize hop is pure overhead — measured at
    ~2.3x the map stage at 8 cores (600k docs: 11.2s via the JVM scan vs
    4.7s for the same tokenize+pack kernel over pyarrow file reads).

    Here the driver makes one footer-metadata pass (the same listing the
    scan planner performs) to build a (path, row_group, start_id) manifest —
    doc_ids are identical to :func:`~fulltextsearch_spark.sources.ingest.
    assign_file_order_doc_ids` by construction (sorted-file order, offsets
    from footer row counts; pinned by tests/test_compression.py). The
    manifest round-robins across ``tasks_per_core x parallelism`` tasks
    (row-group granularity — the same split limit the JVM scan has), and
    each task reads its row groups with :mod:`pyarrow.parquet` and runs the
    SAME fused tokenize+pack kernel. The build's only wide operation
    remains the term shuffle of compressed partials.

    Scale notes: pyarrow reads any ``pyarrow.fs``-supported store (local,
    S3, HDFS) so the manifest pattern holds on a cluster; a corpus of few
    giant single-row-group files should be rewritten with sane row groups
    first (also true for the JVM scan, which cannot split inside a row
    group either).
    """
    stem = cfg.stem

    files = sorted(spark.read.parquet(input_path).inputFiles())
    manifest: list[tuple[str, int, int]] = []  # (path_or_uri, row_group, start_id)
    acc = 0
    for f in files:
        meta = _open_parquet(f).metadata
        for rg in range(meta.num_row_groups):
            n = meta.row_group(rg).num_rows
            if n:
                manifest.append((f, rg, acc))
                acc += n

    par = max(spark.sparkContext.defaultParallelism, 1)
    n_tasks = max(1, min(len(manifest), tasks_per_core * par))

    def _map(batches):
        from fulltextsearch_spark.functions.tokenizer import term_counts_flat  # noqa: PLC0415
        from fulltextsearch_spark.operators.compressed_index import _open_parquet  # noqa: PLC0415

        packer = _PartialAccumulator()
        doc_parts: list[np.ndarray] = []
        dl_parts: list[np.ndarray] = []
        for rb in batches:
            for path, rg, start in zip(
                rb.column("path").to_pylist(),
                rb.column("rg").to_pylist(),
                rb.column("start_id").to_pylist(),
            ):
                col = (
                    _open_parquet(path)
                    .read_row_group(rg, columns=[text_col])
                    .column(text_col)
                    .combine_chunks()
                )
                for i in range(0, len(col), batch_rows):
                    chunk = col.slice(i, batch_rows)
                    doc_ids = np.arange(
                        start + i, start + i + len(chunk), dtype=np.int64
                    )
                    dl, sorted_terms, ud, uc, cnt = term_counts_flat(
                        chunk, stem, order="term"
                    )
                    doc_parts.append(doc_ids)
                    dl_parts.append(dl)
                    if uc.size:
                        packer.add_buffer(
                            sorted_terms, uc, doc_ids[ud], cnt, dl[ud],
                            presorted=True,
                        )
        yield from packer.emit_batches()
        if doc_parts:
            yield _docstats_sentinel(doc_parts, dl_parts)

    mdf = spark.createDataFrame(manifest, "path string, rg int, start_id long")
    partials = mdf.repartition(n_tasks).mapInArrow(_map, schema=_PARTIAL_FIELDS)
    return _index_from_partials(partials, cfg)


def _index_from_partials(raw_partials: DataFrame, cfg: EngineConfig) -> CompressedIndex:
    from pyspark.storagelevel import StorageLevel  # noqa: PLC0415

    partials = raw_partials.persist(StorageLevel.MEMORY_AND_DISK)
    doc_stats = _decode_doc_stats(partials.filter(F.col("term") == _DOCSTATS_TERM))
    # scalar agg rows reduce JVM-side (no Python decode stage); partials
    # checkpointed before the agg rows existed fall back to the decode path
    stats_row = (
        partials.filter(F.col("term") == _DOCAGG_TERM)
        .agg(
            (F.max("first_doc") + F.lit(1)).alias("n_docs"),
            F.sum(F.element_at("seg_lens", 2)).alias("total_dl"),
        )
        .collect()[0]
    )
    if stats_row["n_docs"] is None:
        stats_row = doc_stats.agg(
            (F.max("doc_id") + F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_dl"),
        ).collect()[0]
    n_docs = int(stats_row["n_docs"]) if stats_row["n_docs"] is not None else 0
    avgdl = float(stats_row["total_dl"]) / float(n_docs) if n_docs else 0.0

    # persist the ENCODED postings: query batches must join the compressed
    # rows, not re-run the shuffle+encode per query batch
    compressed = _merge_partials(
        partials.filter(~F.col("term").isin(_DOCSTATS_TERM, _DOCAGG_TERM)), avgdl, cfg
    ).persist(StorageLevel.MEMORY_AND_DISK)
    return CompressedIndex(
        postings=compressed,
        doc_stats=doc_stats,
        n_docs=n_docs,
        avgdl=avgdl,
        block_size=cfg.block_size,
        k1=cfg.k1,
        b=cfg.b,
    )


def _reencode_postings(postings: DataFrame, block_size: int, codec: str) -> DataFrame:
    """Re-encode varint posting rows in place — ``codec`` picks PForDelta
    ("pfor", NewPFD bit-packing) or Elias-Fano ("ef", quasi-succinct).

    Blocks are aligned to the same ``block_size``, so ``block_first_doc``
    and the block-max metadata carry over unchanged; only the three enc
    streams and their per-block byte offsets are replaced. Save-time only —
    the distributed build keeps varint because its self-delimiting partial
    streams byte-concat across tasks (see compression.py).
    """
    from pyspark.sql import types as T  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    from fulltextsearch_spark.operators.compression import (  # noqa: PLC0415
        ef_encode,
        pfor_encode,
        varint_decode,
    )

    enc_fn = pfor_encode if codec == "pfor" else ef_encode

    out_type = T.StructType(
        [
            T.StructField("doc_ids_enc", T.BinaryType()),
            T.StructField("tfs_enc", T.BinaryType()),
            T.StructField("dls_enc", T.BinaryType()),
            T.StructField("block_off_doc", T.ArrayType(T.LongType())),
            T.StructField("block_off_tf", T.ArrayType(T.LongType())),
            T.StructField("block_off_dl", T.ArrayType(T.LongType())),
        ]
    )

    @pandas_udf(out_type)
    def _re(count: pd.Series, ed: pd.Series, et: pd.Series, el: pd.Series) -> pd.DataFrame:
        rows = []
        for n, d, t, l in zip(count, ed, et, el):
            n = int(n)
            sd, od = enc_fn(varint_decode(bytes(d), n), block_size)
            st, ot = enc_fn(varint_decode(bytes(t), n), block_size)
            sl, ol = enc_fn(varint_decode(bytes(l), n), block_size)
            rows.append((sd, st, sl, od.tolist(), ot.tolist(), ol.tolist()))
        return pd.DataFrame(
            rows,
            columns=[
                "doc_ids_enc", "tfs_enc", "dls_enc",
                "block_off_doc", "block_off_tf", "block_off_dl",
            ],
        )

    re_col = _re(F.col("count"), F.col("doc_ids_enc"), F.col("tfs_enc"), F.col("dls_enc"))
    keep = [c for c in postings.columns if c not in out_type.fieldNames()]
    return postings.withColumn("_re", re_col).select(
        *keep, "_re.doc_ids_enc", "_re.tfs_enc", "_re.dls_enc",
        "_re.block_off_doc", "_re.block_off_tf", "_re.block_off_dl",
    )


def save_compressed_index(index: CompressedIndex, root: str, codec: str | None = None) -> None:
    """Persist under ``root``: postings clustered by term, stats scalars.

    ``codec`` re-encodes the posting streams at save time (``"pfor"`` for
    bit-packing, ~0.85x varint bytes measured; ``"ef"`` for Elias-Fano,
    whose cost tracks posting density — ~0.5x varint on dense head
    terms); the
    loaded index queries identically — the kernel dispatches per codec.

    Also appends an index-footprint line (bytes on disk per table) to
    ``{root}/_lineage.jsonl`` — the reference's footprint metric
    (``fts_engine.hpp:50-60``) re-expressed as durable storage size.
    """
    from fulltextsearch_spark.operators.util import record_footprint  # noqa: PLC0415

    out_codec = codec or index.codec
    postings = index.postings
    if out_codec != index.codec:
        if index.codec != "varint" or out_codec not in ("pfor", "ef"):
            raise ValueError(f"unsupported re-encode {index.codec!r} -> {out_codec!r}")
        postings = _reencode_postings(postings, index.block_size, out_codec)
    postings.repartition(F.col("term")).sortWithinPartitions("term").write.mode(
        "overwrite"
    ).parquet(f"{root}/postings")
    index.doc_stats.write.mode("overwrite").parquet(f"{root}/doc_stats")
    spark = index.postings.sparkSession
    spark.createDataFrame(
        [(index.n_docs, index.avgdl, index.block_size, index.k1, index.b, out_codec)],
        "n_docs LONG, avgdl DOUBLE, block_size LONG, k1 DOUBLE, b DOUBLE, codec STRING",
    ).write.mode("overwrite").parquet(f"{root}/corpus_stats")
    record_footprint(
        root,
        {
            "postings": f"{root}/postings",
            "doc_stats": f"{root}/doc_stats",
            "corpus_stats": f"{root}/corpus_stats",
        },
    )


def load_compressed_index(spark: SparkSession, root: str) -> CompressedIndex:
    stats_df = spark.read.parquet(f"{root}/corpus_stats")
    stats = stats_df.collect()[0]
    # indexes saved before the codec column existed are varint by definition
    codec = str(stats["codec"]) if "codec" in stats_df.columns else "varint"
    return CompressedIndex(
        postings=spark.read.parquet(f"{root}/postings"),
        doc_stats=spark.read.parquet(f"{root}/doc_stats"),
        n_docs=int(stats["n_docs"]),
        avgdl=float(stats["avgdl"]),
        block_size=int(stats["block_size"]),
        k1=float(stats["k1"]),
        b=float(stats["b"]),
        codec=codec,
    )
