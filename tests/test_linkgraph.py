"""PageRank over a link graph, pinned against a dense numpy power iteration
(uniform teleport, dangling mass redistributed uniformly).
"""

from __future__ import annotations

import numpy as np
import pytest

from fulltextsearch_spark.operators.linkgraph import pagerank

D = 0.85
ITERS = 10


def brute(n, edges):
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(ITERS):
        dangling = r[deg == 0].sum()
        nxt = np.full(n, (1.0 - D) / n) + D * dangling / n
        for s, t in edges:
            nxt[t] += D * r[s] / deg[s]
        r = nxt
    return r


@pytest.mark.parametrize("seed", [5, 6])
def test_pagerank_matches_dense_power_iteration(spark, seed):
    rng = np.random.default_rng(seed)
    n = 30
    edges = sorted(
        {
            (int(s), int(t))
            for s, t in zip(rng.integers(0, n, 70), rng.integers(0, n, 70))
            if s != t and s % 7 != 0  # s%7==0 nodes are dangling
        }
    )
    edf = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["doc_id"]: r["pagerank"]
        for r in pagerank(edf, n, damping=D, iters=ITERS).collect()
    }
    want = brute(n, edges)
    assert set(got) == set(range(n))
    for v in range(n):
        assert got[v] == pytest.approx(want[v], rel=1e-12)
    # probability mass is conserved
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_no_edges_uniform(spark):
    edf = spark.createDataFrame([], "src LONG, dst LONG")
    got = [r["pagerank"] for r in pagerank(edf, 5, damping=D, iters=3).collect()]
    assert len(got) == 5
    for v in got:
        assert v == pytest.approx(0.2, rel=1e-12)  # all dangling -> uniform
