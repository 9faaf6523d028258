"""Pure-Python oracle re-implementing the reference engine's semantics.

~100 lines of plain dict/loop code mirroring
``/root/reference/src/algorithms/inverted/inverted_index_engine.cpp``:
tokenize -> tf/df/dl -> N = max_id+1, avgdl = sum(dl)/N -> per-query-token
score accumulation (duplicates included) -> top-k with the deterministic
(score DESC, doc_id ASC) tiebreak. Used to verify the Spark pipeline's
rank-identity end-to-end.
"""

from __future__ import annotations

import math

from fulltextsearch_spark.functions.tokenizer import tokenize

__all__ = ["OracleIndex"]


def _idf(n_docs: int, df: int) -> float:
    return math.log((float(n_docs) - float(df) + 0.5) / (float(df) + 0.5) + 1.0)


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]], stem: bool = True):
        self.stem = stem
        self.postings: dict[str, dict[int, int]] = {}
        self.dl: dict[int, int] = {}
        max_id = -1
        for doc_id, text in docs:
            toks = tokenize(text, stem)
            self.dl[doc_id] = len(toks)
            max_id = max(max_id, doc_id)
            for t in toks:
                self.postings.setdefault(t, {}).setdefault(doc_id, 0)
                self.postings[t][doc_id] += 1
        # reference: N = max(doc_id)+1; avgdl over that denominator with
        # missing ids contributing 0 (inverted_index_engine.cpp:190-204).
        self.n_docs = max_id + 1
        self.avgdl = sum(self.dl.values()) / self.n_docs if self.n_docs else 0.0

    def score_bm25(self, tf: int, df: int, dl: int, k1: float, b: float) -> float:
        return _idf(self.n_docs, df) * (
            (float(tf) * (k1 + 1.0))
            / (float(tf) + k1 * (1.0 - b + b * (float(dl) / self.avgdl)))
        )

    def score_tfidf(self, tf: int, df: int, dl: int) -> float:
        return (float(tf) / float(dl)) * _idf(self.n_docs, df)

    def search(
        self,
        query: str,
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        scoring: str = "bm25",
    ) -> list[tuple[int, int, float]]:
        """-> [(rank, doc_id, score)]; loops over query tokens incl. duplicates."""
        acc: dict[int, float] = {}
        for tok in tokenize(query, self.stem):
            plist = self.postings.get(tok)
            if not plist:
                continue
            df = len(plist)
            for doc_id, tf in plist.items():
                if scoring == "bm25":
                    s = self.score_bm25(tf, df, self.dl[doc_id], k1, b)
                else:
                    s = self.score_tfidf(tf, df, self.dl[doc_id])
                acc[doc_id] = acc.get(doc_id, 0.0) + s
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(i + 1, doc_id, s) for i, (doc_id, s) in enumerate(ranked)]
