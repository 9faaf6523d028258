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


def test_hits_matches_numpy_power_iteration(spark):
    """HITS matches a numpy replay of the same L2-normalized half-steps,
    and a pure-hub / pure-authority star ranks as expected."""
    import numpy as np

    from fulltextsearch_spark.operators.linkgraph import hits

    # node 0 links to 1,2,3 (hub); 4 also links to 1 (1 = top authority);
    # node 5 isolated
    edges = [(0, 1), (0, 2), (0, 3), (4, 1)]
    n = 6
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        r["doc_id"]: (r["hub"], r["authority"])
        for r in hits(df, n, iters=10).collect()
    }
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] = 1.0
    h = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(10):
        a = A.T @ h
        a /= np.linalg.norm(a) or 1.0
        h = A @ a
        h /= np.linalg.norm(h) or 1.0
    for v in range(n):
        assert got[v][0] == pytest.approx(h[v], abs=1e-9)
        assert got[v][1] == pytest.approx(a[v], abs=1e-9)
    # structure: 0 is the dominant hub, 1 the dominant authority, 5 zero
    assert got[0][0] == max(x[0] for x in got.values())
    assert got[1][1] == max(x[1] for x in got.values())
    assert got[5] == (0.0, 0.0)


def test_label_propagation_two_cliques(spark):
    """LPA: two cliques joined by one weak edge resolve to two communities
    (each labeled by its min member), isolated node keeps its own label,
    and the result matches a Python replay of the synchronous rule."""
    from fulltextsearch_spark.operators.linkgraph import label_propagation

    # clique A = {0,1,2}, clique B = {3,4,5}, bridge 2-3, isolated 6
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    n, iters = 7, 5
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        r["doc_id"]: r["community"]
        for r in label_propagation(df, n, iters=iters).collect()
    }
    # python replay
    nbrs: dict = {u: set() for u in range(n)}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lbl = {u: u for u in range(n)}
    for _ in range(iters):
        new = {}
        for u in range(n):
            if not nbrs[u]:
                new[u] = lbl[u]
                continue
            cnt: dict = {}
            for v in nbrs[u]:
                cnt[lbl[v]] = cnt.get(lbl[v], 0) + 1
            new[u] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lbl = new
    assert got == lbl
    assert got[6] == 6
    assert len({got[0], got[1], got[2]}) == 1
    assert len({got[3], got[4], got[5]}) == 1


def test_personalized_pagerank_properties(spark):
    """PPR: mass conserved, concentrates on/near the seed set vs uniform PR,
    seeds=everyone reproduces uniform PageRank, empty seeds rejected."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from fulltextsearch_spark.operators.linkgraph import pagerank

    n = 60
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = ids.select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") * 3 + 1) % n).alias("dst")
    ).union(
        ids.select(F.col("doc_id"), ((F.col("doc_id") * 5 + 2) % n))
    ).where("src != dst").distinct()
    seeds = ids.where(F.col("doc_id") < 3)
    ppr = {r["doc_id"]: r["pagerank"] for r in
           pagerank(edges, n, iters=8, seeds=seeds).collect()}
    uni = {r["doc_id"]: r["pagerank"] for r in
           pagerank(edges, n, iters=8).collect()}
    assert abs(sum(ppr.values()) - 1.0) < 1e-9
    assert abs(sum(uni.values()) - 1.0) < 1e-9
    # seed mass share must exceed the uniform ranking's share of those nodes
    seed_share_ppr = sum(ppr[i] for i in range(3))
    seed_share_uni = sum(uni[i] for i in range(3))
    assert seed_share_ppr > 3 * seed_share_uni
    # personalizing on EVERY vertex == uniform teleport (same fixed point)
    allppr = {r["doc_id"]: r["pagerank"] for r in
              pagerank(edges, n, iters=8, seeds=ids).collect()}
    assert all(abs(allppr[i] - uni[i]) < 1e-12 for i in range(n))
    with _pytest.raises(ValueError):
        pagerank(edges, n, seeds=ids.where("doc_id < 0"))


def test_anchor_texts_order_cap_and_shape(spark):
    from pyspark.sql import functions as F

    from fulltextsearch_spark.operators.linkgraph import anchor_texts

    docs = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d") for i in range(10)],
        "doc_id LONG, text STRING",
    )
    edges = spark.createDataFrame(
        [(s, 0) for s in (5, 2, 9, 1, 7)] + [(3, 4)], "src LONG, dst LONG"
    )
    out = {r["doc_id"]: r["anchor"]
           for r in anchor_texts(docs, edges, n_words=2, max_anchors=3).collect()}
    # ascending-src order, capped at the 3 LOWEST src ids
    assert out[0] == "w1a w1b w2a w2b w5a w5b"
    assert out[4] == "w3a w3b"
    assert set(out) == {0, 4}  # un-linked pages get no row
    import pytest as _pytest

    with _pytest.raises(ValueError):
        anchor_texts(docs, edges, max_anchors=0)
