"""Trigram extraction with the reference parser's exact byte semantics.

Pinned against ``/root/reference/src/algorithms/trigram/parser/
trigram_parser.cpp:10-52`` and ``models/trigram.hpp:12-47``:

* whitelist = ``[0-9A-Za-z$%&+@]`` ASCII; **every** other byte (incl. >=0x80)
  is a delimiter (``trigram_parser.hpp:10-27``);
* a run of L >= 3 whitelisted bytes emits L-2 sliding 3-byte windows, each
  lowercased bytewise (C locale) with word offset = window start within the
  run, cast to uint8 (``trigram_parser.cpp:17-29``);
* a standalone run of exactly 2 bytes emits one padded "trigram"
  ``(c0, c1, '\\0')`` with offset 0 — but only when a delimiter byte follows;
  a 2-byte run at end-of-input emits nothing (the parser loop exits first,
  ``trigram_parser.cpp:31-44``);
* packing: ``(c0<<24) | (c1<<16) | (c2<<8) | offset`` (``trigram.hpp:20-22``).

The per-document counter keys on the **raw** packed value (offset included,
``trigram_index_engine.cpp:213-233``); the index insert caps the offset at
``kMaxWordOffset-1 = 14`` (``parallel_hash_index.hpp:27-33``), while lookups
probe with the *uncapped* raw value — so query trigrams at offset >= 15 never
match. These quirks are reproduced bit-for-bit (and pinned by tests).

Extraction is numpy-vectorized over the byte array (run detection via
flatnonzero/diff, window gathers via repeat/arange) — no per-byte Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

__all__ = [
    "MAX_WORD_OFFSET",
    "trigram_values",
    "cap_offset",
    "trigram_counts_udf",
    "TRIGRAM_COUNTS_SCHEMA",
]

MAX_WORD_OFFSET = 15  # kMaxWordOffset, trigram.hpp:10; insert caps at 14

_WL = np.zeros(256, dtype=bool)
for _c in b"0123456789$%&+@":
    _WL[_c] = True
for _c in range(ord("A"), ord("Z") + 1):
    _WL[_c] = True
for _c in range(ord("a"), ord("z") + 1):
    _WL[_c] = True

_LOW = np.arange(256, dtype=np.int64)
_LOW[ord("A"): ord("Z") + 1] += 32  # bytewise C-locale tolower


def trigram_values(data: bytes) -> np.ndarray:
    """Packed trigram values (int64 holding the uint32) in emission order."""
    a = np.frombuffer(data, dtype=np.uint8)
    n = a.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    idx = np.flatnonzero(_WL[a])
    if idx.size == 0:
        return np.empty(0, dtype=np.int64)
    # runs of consecutive whitelisted bytes
    breaks = np.flatnonzero(np.diff(idx) > 1) + 1
    starts_in_idx = np.concatenate(([0], breaks))
    run_starts = idx[starts_in_idx]
    run_lens = np.diff(np.concatenate((starts_in_idx, [idx.size])))
    low = _LOW[a]

    # sliding windows within runs of length >= 3
    counts = np.maximum(run_lens - 2, 0)
    total = int(counts.sum())
    if total:
        rep_starts = np.repeat(run_starts, counts)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        p = rep_starts + within
        win_vals = (low[p] << 24) | (low[p + 1] << 16) | (low[p + 2] << 8) | (within & 0xFF)
        win_pos = p
    else:
        win_vals = np.empty(0, dtype=np.int64)
        win_pos = np.empty(0, dtype=np.int64)

    # standalone 2-byte runs followed by a delimiter byte (not end-of-input)
    mask2 = (run_lens == 2) & (run_starts + 2 < n)
    s2 = run_starts[mask2]
    two_vals = (low[s2] << 24) | (low[s2 + 1] << 16)
    # emission order = scan order = order of the emitting byte position
    order = np.argsort(np.concatenate((win_pos, s2)), kind="stable")
    return np.concatenate((win_vals, two_vals))[order]


def cap_offset(raw: np.ndarray) -> np.ndarray:
    """Index key: offset capped at MAX_WORD_OFFSET-1 (insert-side only)."""
    off = raw & 0xFF
    return (raw & ~np.int64(0xFF)) | np.minimum(off, MAX_WORD_OFFSET - 1)


TRIGRAM_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("raws", T.ArrayType(T.LongType())),
        T.StructField("tfs", T.ArrayType(T.LongType())),
        T.StructField("dl", T.LongType()),
    ]
)


def trigram_counts_udf():
    """STRING -> (distinct raw trigram values, counts, total trigram count).

    The per-doc counter keys on the raw value exactly like the reference's
    ``trigram_occurences`` map (``trigram_index_engine.cpp:224-233``).
    """

    @pandas_udf(TRIGRAM_COUNTS_SCHEMA)
    def _counts(texts: pd.Series) -> pd.DataFrame:
        raws_col, tfs_col, dl_col = [], [], []
        for t in texts:
            vals = trigram_values(t.encode("utf-8")) if isinstance(t, str) else np.empty(0, np.int64)
            if vals.size:
                uniq, cnt = np.unique(vals, return_counts=True)
            else:
                uniq = cnt = np.empty(0, dtype=np.int64)
            raws_col.append(uniq.tolist())
            tfs_col.append(cnt.tolist())
            dl_col.append(int(vals.size))
        return pd.DataFrame({"raws": raws_col, "tfs": tfs_col, "dl": dl_col})

    return _counts
