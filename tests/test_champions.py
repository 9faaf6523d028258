"""Champion lists: equality with exhaustive at m >= max df, candidate-set
containment, WindowGroupLimit pruning in the build plan."""

from __future__ import annotations

import pytest

from fulltextsearch_spark.config import EngineConfig
from fulltextsearch_spark.operators.champions import build_champions, search_champions
from fulltextsearch_spark.operators.index_build import build_index
from fulltextsearch_spark.operators.query import search
from fulltextsearch_spark.sources.ingest import assign_dense_doc_ids
from fulltextsearch_spark.sources.webpages import QUERY_SET, generate_webpages

K = 10
CFG = EngineConfig(k1=1.2, b=0.75, k=K, stem=True)


@pytest.fixture(scope="module")
def corpus(spark):
    pages = generate_webpages(spark, 300, seed=11, num_partitions=4)
    return assign_dense_doc_ids(pages, order_col="url")


@pytest.fixture(scope="module")
def index(spark, corpus):
    return build_index(spark, corpus, CFG, persist=False)


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERY_SET[:6], ["query_id", "content"])


def _rmap(rows):
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for v in by_q.values():
        v.sort()
    return by_q


def test_full_m_equals_exhaustive(spark, index, queries):
    """m >= max df -> champion candidates = all postings -> identical top-k."""
    n_docs = index.n_docs
    champs = build_champions(index, m=int(n_docs), cfg=CFG)
    a = _rmap(search_champions(index, champs, queries, CFG).collect())
    b = _rmap(search(index, queries, CFG).collect())
    assert a == b and a


def test_small_m_prunes_but_scores_stay_exact(spark, index, queries):
    """Every champion hit appears in the exhaustive ranking with the SAME
    exact score (inexact candidate set, exact scoring), and candidates come
    only from the query terms' champion lists."""
    champs = build_champions(index, m=3, cfg=CFG)
    champ_map = {r["term"]: set(r["doc_ids"]) for r in champs.collect()}
    assert all(len(v) <= 3 for v in champ_map.values())
    got = search_champions(index, champs, queries, CFG).collect()
    assert got, "m=3 must still return hits"
    exhaustive = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in search(index, queries, CFG, k=10**6).collect()
    }
    from fulltextsearch_spark.operators.query import query_terms

    qt = {}
    for r in query_terms(queries, stem=CFG.stem).collect():
        qt.setdefault(r["query_id"], set()).add(r["term"])
    for r in got:
        key = (r["query_id"], r["doc_id"])
        assert key in exhaustive
        assert abs(r["score"] - exhaustive[key]) < 1e-9
        allowed = set().union(*(champ_map.get(t, set()) for t in qt[r["query_id"]]))
        assert r["doc_id"] in allowed
    # pruning is real on this corpus: strictly fewer rows than exhaustive@10
    full10 = search(index, queries, CFG).count()
    assert len(got) <= full10


def test_build_plan_uses_window_group_limit(spark, index):
    plan = build_champions(index, m=4, cfg=CFG)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_rejects_bad_m(spark, index):
    with pytest.raises(ValueError):
        build_champions(index, m=0, cfg=CFG)


def test_tiered_fallback_fills_short_queries(spark, index, queries):
    """Queries tier 1 cannot fill to k are served by the exhaustive path;
    filled queries are answered from tier 1 verbatim."""
    from fulltextsearch_spark.operators.champions import search_tiered

    champs = build_champions(index, m=2, cfg=CFG)
    k = 8
    tiered = {}
    for r in search_tiered(index, champs, queries, CFG, k=k).collect():
        tiered.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    t1 = {}
    for r in search_champions(index, champs, queries, CFG, k=k).collect():
        t1.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    full = {}
    for r in search(index, queries, CFG, k=k).collect():
        full.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    assert any(len(v) < k for v in t1.values()), "m=2 must under-fill something"
    for qid, rows in full.items():
        want = t1[qid] if len(t1.get(qid, [])) >= k else full[qid]
        assert sorted(tiered.get(qid, [])) == sorted(want), qid
    # per-query row counts now match the exhaustive page size
    for qid in full:
        assert len(tiered[qid]) == len(full[qid]), qid
