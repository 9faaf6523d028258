"""Pure-Python trigram oracle: direct per-byte transcription of the C++
parser and engine (independent of the vectorized implementation, so the
numpy parser is genuinely cross-checked).

Mirrors /root/reference/src/algorithms/trigram/parser/trigram_parser.cpp:10-52,
models/trigram.hpp:19-22, trigram_index_engine.cpp:205-245 (build), :41-93
(search), index/parallel_hash_index.hpp:27-38 (offset cap on insert, raw
probe on lookup).
"""

from __future__ import annotations

import math

_WL = set(b"0123456789$%&+@")
_WL |= set(range(ord("A"), ord("Z") + 1))
_WL |= set(range(ord("a"), ord("z") + 1))


def _low(c: int) -> int:
    return c + 32 if ord("A") <= c <= ord("Z") else c


def oracle_trigrams(data: bytes) -> list[int]:
    """Packed raw trigram values in parser emission order."""
    out: list[int] = []
    wb = tb = 0
    for i in range(len(data)):
        c = data[i]
        if c < 128 and c in _WL:
            if i - tb >= 2:
                off = (tb - wb) & 0xFF
                out.append(
                    (_low(data[tb]) << 24)
                    | (_low(data[tb + 1]) << 16)
                    | (_low(data[tb + 2]) << 8)
                    | off
                )
                tb += 1
        else:
            if i - wb == 2:
                out.append((_low(data[wb]) << 24) | (_low(data[wb + 1]) << 16))
            tb = i + 1
            wb = i + 1
    return out


def _cap(raw: int) -> int:
    off = raw & 0xFF
    return (raw & ~0xFF) | min(off, 14)


class TrigramOracle:
    def __init__(self, docs: list[tuple[int, str]], compactify: bool = True):
        self.index: dict[int, list[tuple[int, int]]] = {}
        self.dl: dict[int, int] = {}
        total = 0
        for doc_id, text in docs:
            vals = oracle_trigrams(text.encode("utf-8"))
            self.dl[doc_id] = len(vals)
            total += len(vals)
            counts: dict[int, int] = {}
            for v in vals:
                counts[v] = counts.get(v, 0) + 1
            # insert caps the offset; same capped key gets multiple entries
            # for one doc when raw offsets collide after capping
            for raw, cnt in sorted(counts.items()):
                self.index.setdefault(_cap(raw), []).append((doc_id, cnt))
        self.doc_count = len(docs)
        self.avgdl = total / self.doc_count if self.doc_count else 0.0
        # compactify: clamp(uint32(doc_count/(avg+1)), 2, 10); int division
        stop_share = max(2, min(10, int(self.doc_count / (self.avgdl + 1.0))))
        self.stop_threshold = self.doc_count // stop_share
        if compactify:
            self.index = {
                k: v for k, v in self.index.items() if len(v) <= self.stop_threshold
            }
        for v in self.index.values():
            v.sort()

    def _score(self, tf: int, df: int, dl: int, k1: float, b: float, scoring: str) -> float:
        idf = math.log(
            (self.doc_count - float(df) + 0.5) / (float(df) + 0.5) + 1.0
        )
        if scoring == "bm25":
            return idf * (
                float(tf) * (k1 + 1.0)
                / (float(tf) + k1 * (1.0 - b + b * (float(dl) / self.avgdl)))
            )
        return (float(tf) / float(dl)) * idf

    def search(
        self, query: str, k: int = 10, k1: float = 1.2, b: float = 0.75, scoring: str = "bm25"
    ) -> list[tuple[int, int, float]]:
        vals = oracle_trigrams(query.encode("utf-8"))
        n_q = len(vals)
        acc: dict[int, float] = {}
        for v in vals:  # every occurrence, duplicates included
            entries = self.index.get(v)  # UNCAPPED probe (reference quirk)
            if entries is None:
                continue
            df = len(entries)
            for doc_id, tf in entries:
                acc[doc_id] = acc.get(doc_id, 0.0) + self._score(
                    tf, df, self.dl[doc_id], k1, b, scoring
                ) / n_q
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
