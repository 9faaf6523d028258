"""Posting-list compression: delta + varint, block skip/max metadata.

New work relative to the reference (its index holds raw
``vector<(uint32,uint32)>`` pairs and dumps them verbatim,
``/root/reference/src/data-structures/hash_index.hpp:137-173``); required by
the north_star for 10^12-doc scale: sorted docIDs -> deltas -> LEB128
varints, fixed-size blocks with (first_doc_id, byte offsets, max tf,
max BM25 tf-part) metadata enabling skip + block-max WAND.

Encode and decode are numpy-vectorized (no per-value Python in the hot
path): encode computes per-value byte lengths and scatters shifted 7-bit
groups; decode segments the byte stream on continuation bits and folds each
group with ``np.bitwise_or.reduceat``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = [
    "varint_encode",
    "varint_decode",
    "encode_postings",
    "decode_postings",
    "block_metadata",
    "EncodedPostings",
]

_MAX_BYTES = 10  # 64-bit values need at most 10 LEB128 bytes


def varint_nbytes(values: np.ndarray) -> np.ndarray:
    """LEB128 bytes per value: ceil(bitlength/7), min 1 (vectorized).

    Bit length via log2 on floats is unsafe near 2^53; shift loop (<=10
    iterations) instead.
    """
    v = values.astype(np.uint64, copy=False)
    nbytes = np.ones(v.shape, dtype=np.int64)
    shifted = v >> np.uint64(7)
    while np.any(shifted > 0):
        nbytes[shifted > 0] += 1
        shifted = shifted >> np.uint64(7)
    return nbytes


def varint_encode(values: np.ndarray, nbytes: np.ndarray | None = None) -> bytes:
    """LEB128-encode an array of non-negative int64/uint64 values.

    ``nbytes`` (from :func:`varint_nbytes`) can be passed in when the caller
    already computed it for block offsets — the length scan is ~1/3 of the
    encode cost on short posting lists.
    """
    v = values.astype(np.uint64, copy=False)
    if v.size == 0:
        return b""
    if nbytes is None:
        nbytes = varint_nbytes(v)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    total = int(offsets[-1])
    out = np.empty(total, dtype=np.uint8)
    # scatter the k-th 7-bit group of every value that has one
    max_groups = int(nbytes.max())
    for k in range(max_groups):
        has_k = nbytes > k
        idx = offsets[:-1][has_k] + k
        group = ((v[has_k] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        not_last = nbytes[has_k] > (k + 1)
        out[idx] = group | (not_last.astype(np.uint8) << 7)
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte string back to uint64 values."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (arr & 0x80) == 0
    # group start = position after each last-byte (and position 0)
    starts = np.empty(int(is_last.sum()), dtype=np.int64)
    starts[0] = 0
    if starts.size > 1:
        starts[1:] = np.flatnonzero(is_last)[:-1] + 1
    # position of each byte within its group
    within = np.arange(arr.size, dtype=np.int64) - np.repeat(
        starts, np.diff(np.append(starts, arr.size))
    )
    contrib = (arr & 0x7F).astype(np.uint64) << (within.astype(np.uint64) * np.uint64(7))
    values = np.bitwise_or.reduceat(contrib, starts)
    if count is not None and values.size != count:
        raise ValueError(f"decoded {values.size} values, expected {count}")
    return values


@dataclass
class EncodedPostings:
    """One term's compressed postings (sorted by doc_id ascending)."""

    count: int
    doc_ids_enc: bytes  # delta+varint over sorted doc_ids
    tfs_enc: bytes  # varint tfs, parallel order
    dls_enc: bytes  # varint dls, parallel order
    block_first_doc: np.ndarray  # int64 per block
    block_off_doc: np.ndarray  # byte offset of each block in doc_ids_enc
    block_off_tf: np.ndarray
    block_off_dl: np.ndarray
    block_max_tf: np.ndarray  # int64 per block
    block_max_tfpart: np.ndarray  # float64: max tf*(k1+1)/(tf+k1*(1-b+b*dl/avgdl))


def _block_byte_offsets(values: np.ndarray, block_size: int) -> np.ndarray:
    """Byte offset of each block boundary in the varint encoding of values."""
    v = values.astype(np.uint64, copy=False)
    nbytes = np.ones(v.shape, dtype=np.int64)
    shifted = v >> np.uint64(7)
    while np.any(shifted > 0):
        nbytes[shifted > 0] += 1
        shifted >>= np.uint64(7)
    cum = np.concatenate(([0], np.cumsum(nbytes)))
    return cum[::block_size][: (len(values) + block_size - 1) // block_size].copy()


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = 128,
    k1: float = 1.2,
    b: float = 0.75,
    avgdl: float = 1.0,
) -> EncodedPostings:
    """Compress one term's (sorted) postings; deltas restart at each block
    boundary so blocks decode independently (skip support)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    order_ok = doc_ids[:-1] < doc_ids[1:]
    if doc_ids.size > 1 and not bool(order_ok.all()):
        raise ValueError("doc_ids must be strictly ascending")
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    n = doc_ids.size

    # block-restarting deltas: first value of each block is stored absolute
    deltas = np.empty(n, dtype=np.int64)
    deltas[0:] = doc_ids
    deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    block_starts = np.arange(0, n, block_size)
    deltas[block_starts] = doc_ids[block_starts]

    enc_doc = varint_encode(deltas)
    enc_tf = varint_encode(tfs)
    enc_dl = varint_encode(dls)

    nblocks = len(block_starts)
    block_first = doc_ids[block_starts]
    max_tf = np.maximum.reduceat(tfs, block_starts) if n else np.empty(0, dtype=np.int64)
    # BM25 tf-dependent part (idf multiplies in at query time)
    tf_f = tfs.astype(np.float64)
    tfpart = tf_f * (k1 + 1.0) / (tf_f + k1 * (1.0 - b + b * (dls.astype(np.float64) / float(avgdl))))
    max_tfpart = np.maximum.reduceat(tfpart, block_starts) if n else np.empty(0, dtype=np.float64)

    return EncodedPostings(
        count=n,
        doc_ids_enc=enc_doc,
        tfs_enc=enc_tf,
        dls_enc=enc_dl,
        block_first_doc=block_first,
        block_off_doc=_block_byte_offsets(deltas, block_size),
        block_off_tf=_block_byte_offsets(tfs, block_size),
        block_off_dl=_block_byte_offsets(dls, block_size),
        block_max_tf=max_tf,
        block_max_tfpart=max_tfpart,
    )


def decode_postings(enc: EncodedPostings, block_size: int = 128) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode -> (doc_ids, tfs, dls). Blocks can also be decoded
    individually via the byte-offset arrays (see wand.py)."""
    deltas = varint_decode(enc.doc_ids_enc, enc.count).astype(np.int64)
    doc_ids = np.cumsum(deltas)
    # undo cumsum crossing block boundaries: block starts are absolute
    starts = np.arange(0, enc.count, block_size)
    if starts.size > 1:
        # recompute per block: cumsum within blocks only
        doc_ids = deltas.copy()
        for i, s in enumerate(starts):
            e = min(s + block_size, enc.count)
            doc_ids[s:e] = np.cumsum(deltas[s:e])
    tfs = varint_decode(enc.tfs_enc, enc.count).astype(np.int64)
    dls = varint_decode(enc.dls_enc, enc.count).astype(np.int64)
    return doc_ids, tfs, dls


def decode_block(
    enc: EncodedPostings, block_idx: int, block_size: int = 128
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a single block without touching the rest of the stream."""
    s = block_idx * block_size
    e = min(s + block_size, enc.count)
    n = e - s
    do = enc.block_off_doc
    to = enc.block_off_tf
    dlo = enc.block_off_dl
    end_do = do[block_idx + 1] if block_idx + 1 < len(do) else len(enc.doc_ids_enc)
    end_to = to[block_idx + 1] if block_idx + 1 < len(to) else len(enc.tfs_enc)
    end_dlo = dlo[block_idx + 1] if block_idx + 1 < len(dlo) else len(enc.dls_enc)
    deltas = varint_decode(enc.doc_ids_enc[do[block_idx]: end_do], n).astype(np.int64)
    doc_ids = np.cumsum(deltas)
    tfs = varint_decode(enc.tfs_enc[to[block_idx]: end_to], n).astype(np.int64)
    dls = varint_decode(enc.dls_enc[dlo[block_idx]: end_dlo], n).astype(np.int64)
    return doc_ids, tfs, dls


def block_metadata(enc: EncodedPostings) -> dict:
    return {
        "n_blocks": len(enc.block_first_doc),
        "count": enc.count,
        "bytes": len(enc.doc_ids_enc) + len(enc.tfs_enc) + len(enc.dls_enc),
    }
