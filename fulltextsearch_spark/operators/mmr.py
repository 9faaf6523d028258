"""MMR diversification: maximal-marginal-relevance re-ranking.

Carbonell & Goldstein (SIGIR 1998): re-rank a relevance-ordered candidate
page so each pick balances relevance against redundancy with what is
already picked::

    pick_i = argmax_c  lam * rel(c) - (1 - lam) * max_{s in S} sim(c, s)

with ``sim`` the embedding cosine and the max over the empty set defined 0
(the first pick is the plain relevance argmax; its reported score is
``lam * rel``). Ties break on doc_id ASC, so the output is deterministic.
Standard both as a search-result diversifier and as a training-data
"diverse subset" selector.

Scale shape: the greedy loop is inherently sequential IN k, but k and the
candidate page are tiny (k~10 over N~10-100 candidates) — the operator
distributes OVER QUERIES: one ``applyInPandas`` group per query, each group
a few KB of vectors, Arrow-batched. The expensive part at 100 TB is
producing the candidates (the ANN/BM25 stage), never this re-rank. Dot
products accumulate SEQUENTIALLY in float64 (a Python loop, not numpy
pairwise summation) so the arithmetic is bit-identical to the SQL oracle's
``list_sum`` replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["mmr_rerank"]


def _seq_dot(a, b) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def _cos(a, b) -> float:
    import math

    return _seq_dot(a, b) / (
        math.sqrt(_seq_dot(a, a)) * math.sqrt(_seq_dot(b, b))
    )


def mmr_rerank(
    candidates: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "doc_id",
) -> DataFrame:
    """candidates(query_id, <id_col>, rel) x embeddings(<id_col>, embedding)
    -> (query_id, rank, <id_col>, score) — the MMR-selected top-k per query.

    ``rel`` is any relevance score (BM25, cosine-to-query, ...). Candidates
    missing an embedding are dropped. ``lam=1`` degenerates to the plain
    relevance order.
    """
    if not (0.0 <= lam <= 1.0):
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    cand = candidates.select("query_id", id_col, "rel").join(
        embeddings.select(id_col, "embedding"), id_col
    )
    out_schema = T.StructType(
        [
            T.StructField("query_id", candidates.schema["query_id"].dataType),
            T.StructField("rank", T.LongType()),
            T.StructField(id_col, candidates.schema[id_col].dataType),
            T.StructField("score", T.DoubleType()),
        ]
    )
    kk, ll = int(k), float(lam)

    def _greedy(pdf):
        import pandas as pd

        rows = sorted(
            (
                (r["rel"], r[id_col], list(r["embedding"]))
                for _, r in pdf.iterrows()
            ),
            key=lambda t: (-t[0], t[1]),
        )
        qid = pdf["query_id"].iloc[0]
        rel = {d: float(r) for r, d, _ in rows}
        vec = {d: v for _, d, v in rows}
        remaining = [d for _, d, _ in rows]
        maxsim: dict = {d: 0.0 for d in remaining}
        picked = []
        for rank in range(1, min(kk, len(remaining)) + 1):
            best_d, best_score = None, None
            for d in remaining:
                s = ll * rel[d] - (1.0 - ll) * maxsim[d]
                if best_score is None or s > best_score or (
                    s == best_score and d < best_d
                ):
                    best_d, best_score = d, s
            picked.append((qid, rank, best_d, best_score))
            remaining.remove(best_d)
            for d in remaining:
                s = _cos(vec[d], vec[best_d])
                if s > maxsim[d]:
                    maxsim[d] = s
        return pd.DataFrame(picked, columns=["query_id", "rank", id_col, "score"])

    return cand.groupBy("query_id").applyInPandas(_greedy, out_schema)
