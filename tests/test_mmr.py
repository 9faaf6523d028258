"""MMR diversification — pinned against a brute-force greedy in Python."""

from __future__ import annotations

import math
import random

import pytest


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def _brute_mmr(cands, vecs, k, lam):
    rel = dict(cands)
    remaining = sorted(rel, key=lambda d: (-rel[d], d))
    maxsim = {d: 0.0 for d in remaining}
    out = []
    for rank in range(1, min(k, len(remaining)) + 1):
        best = min(
            remaining, key=lambda d: (-(lam * rel[d] - (1 - lam) * maxsim[d]), d)
        )
        out.append((rank, best, lam * rel[best] - (1 - lam) * maxsim[best]))
        remaining.remove(best)
        for d in remaining:
            maxsim[d] = max(maxsim[d], _cos(vecs[d], vecs[best]))
    return out


@pytest.fixture(scope="module")
def data():
    rng = random.Random(73)
    vecs = {d: [rng.gauss(0, 1) for _ in range(16)] for d in range(30)}
    cands = [(d, rng.random()) for d in range(30)]
    return cands, vecs


def test_mmr_matches_brute_greedy(spark, data):
    from fulltextsearch_spark.operators.mmr import mmr_rerank

    cands, vecs = data
    cdf = spark.createDataFrame(
        [("q", d, r) for d, r in cands], ["query_id", "doc_id", "rel"]
    )
    edf = spark.createDataFrame(
        [(d, v) for d, v in vecs.items()], ["doc_id", "embedding"]
    )
    got = sorted(
        map(tuple, mmr_rerank(cdf, edf, k=8, lam=0.7).collect()),
        key=lambda t: t[1],
    )
    want = _brute_mmr(cands, vecs, 8, 0.7)
    assert len(got) == len(want) == 8
    for g, (rank, d, s) in zip(got, want):
        assert (g[0], g[1], g[2]) == ("q", rank, d)
        assert g[3] == pytest.approx(s, rel=1e-12)
    # diversification actually changed the order vs plain relevance
    plain = [d for d, _ in sorted(cands, key=lambda t: (-t[1], t[0]))][:8]
    assert [g[2] for g in got] != plain


def test_mmr_lam_one_is_relevance_order(spark, data):
    from fulltextsearch_spark.operators.mmr import mmr_rerank

    cands, vecs = data
    cdf = spark.createDataFrame(
        [("q", d, r) for d, r in cands], ["query_id", "doc_id", "rel"]
    )
    edf = spark.createDataFrame(
        [(d, v) for d, v in vecs.items()], ["doc_id", "embedding"]
    )
    got = sorted(map(tuple, mmr_rerank(cdf, edf, k=5, lam=1.0).collect()),
                 key=lambda t: t[1])
    plain = [d for d, _ in sorted(cands, key=lambda t: (-t[1], t[0]))][:5]
    assert [g[2] for g in got] == plain


def test_mmr_multi_query_groups_are_independent(spark, data):
    from fulltextsearch_spark.operators.mmr import mmr_rerank

    cands, vecs = data
    rows = [("a", d, r) for d, r in cands[:12]] + [("b", d, r) for d, r in cands[12:]]
    cdf = spark.createDataFrame(rows, ["query_id", "doc_id", "rel"])
    edf = spark.createDataFrame(
        [(d, v) for d, v in vecs.items()], ["doc_id", "embedding"]
    )
    got = mmr_rerank(cdf, edf, k=4, lam=0.5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for q, sub in (("a", cands[:12]), ("b", cands[12:])):
        want = _brute_mmr(sub, vecs, 4, 0.5)
        gotq = sorted(by_q[q])
        assert [(r, d) for r, d, _ in gotq] == [(r, d) for r, d, _ in want]
        for (_, _, gs), (_, _, ws) in zip(gotq, want):
            assert gs == pytest.approx(ws, rel=1e-12)


def test_mmr_rejects_bad_lam(spark, data):
    from fulltextsearch_spark.operators.mmr import mmr_rerank

    cands, vecs = data
    cdf = spark.createDataFrame([("q", 0, 1.0)], ["query_id", "doc_id", "rel"])
    edf = spark.createDataFrame([(0, [1.0, 0.0])], ["doc_id", "embedding"])
    with pytest.raises(ValueError):
        mmr_rerank(cdf, edf, lam=1.5)
