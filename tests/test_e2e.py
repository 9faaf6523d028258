"""End-to-end rank-identity: Spark pipeline vs the pure-Python oracle
reimplementation of the reference semantics, on the synthetic webpages
corpus (FIXTURES.md §1) and the reference-style query set.
"""

from __future__ import annotations

import pytest

from fulltextsearch_spark.config import EngineConfig
from fulltextsearch_spark.operators.index_build import build_index
from fulltextsearch_spark.operators.query import search
from fulltextsearch_spark.sources.ingest import assign_dense_doc_ids
from fulltextsearch_spark.sources.webpages import QUERY_SET, generate_webpages
from tests.oracle import OracleIndex

N_DOCS = 400
K = 10


@pytest.fixture(scope="module")
def corpus(spark):
    pages = generate_webpages(spark, N_DOCS, seed=42, num_partitions=4)
    docs = assign_dense_doc_ids(pages, order_col="url")
    rows = docs.select("doc_id", "text").collect()
    return docs, [(r["doc_id"], r["text"]) for r in rows]


@pytest.fixture(scope="module")
def spark_results(spark, corpus):
    docs, _ = corpus
    results = {}
    for scoring, k1, b in [("bm25", 1.2, 0.75), ("bm25", 1.5, 0.75), ("tfidf", 1.2, 0.75)]:
        cfg = EngineConfig(k1=k1, b=b, k=K)
        idx = build_index(spark, docs, cfg)
        qdf = spark.createDataFrame(QUERY_SET, ["query_id", "content"])
        rows = search(idx, qdf, cfg, scoring=scoring).collect()
        by_q: dict[str, list] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
        for v in by_q.values():
            v.sort()
        results[(scoring, k1, b)] = by_q
    return results


def test_dense_doc_ids(corpus):
    _, rows = corpus
    ids = sorted(doc_id for doc_id, _ in rows)
    assert ids == list(range(N_DOCS))


@pytest.mark.parametrize("scoring,k1,b", [("bm25", 1.2, 0.75), ("bm25", 1.5, 0.75), ("tfidf", 1.2, 0.75)])
def test_rank_identity_vs_oracle(corpus, spark_results, scoring, k1, b):
    _, doc_rows = corpus
    oracle = OracleIndex(doc_rows)
    got_all = spark_results[(scoring, k1, b)]
    checked = 0
    for qid, content in QUERY_SET:
        expected = oracle.search(content, k=K, k1=k1, b=b, scoring=scoring)
        got = got_all.get(qid, [])
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in expected], (
            f"{qid} ({content!r}): rank/doc mismatch\n got={got}\n exp={expected}"
        )
        for (_, _, gs), (_, _, es) in zip(got, expected):
            assert gs == pytest.approx(es, rel=1e-9, abs=1e-12)
        checked += len(expected)
    assert checked > 30  # the query set genuinely exercises the corpus


def test_empty_and_unknown_queries(spark_results):
    by_q = spark_results[("bm25", 1.2, 0.75)]
    assert "q06" not in by_q or by_q["q06"] == []  # stop words only
    assert "q07" not in by_q or by_q["q07"] == []  # unknown term


def test_corpus_stats_reference_semantics(spark, corpus):
    # N = max(doc_id)+1 even when ids are sparse; avgdl counts missing as 0.
    docs, _ = corpus
    sparse = docs.filter("doc_id % 2 = 0 or doc_id = 399")
    idx = build_index(spark, sparse, EngineConfig())
    assert idx.n_docs == 400  # max id 399 + 1, not row count
    rows = sparse.select("doc_id", "text").collect()
    oracle = OracleIndex([(r["doc_id"], r["text"]) for r in rows])
    assert idx.n_docs == oracle.n_docs
    assert idx.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)


def test_salted_merge_identical_results(spark, corpus):
    """Skew path: forcing two-stage salted aggregation for every term with
    df > 5 must produce identical postings/df to the unsalted build."""
    docs, doc_rows = corpus
    cfg_salted = EngineConfig(k1=1.2, b=0.75, k=K, salt_df_threshold=5, salt_buckets=8)
    idx = build_index(spark, docs, cfg_salted)
    qdf = spark.createDataFrame(QUERY_SET, ["query_id", "content"])
    got = search(idx, qdf, cfg_salted).collect()
    oracle = OracleIndex(doc_rows)
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, content in QUERY_SET:
        expected = oracle.search(content, k=K, k1=1.2, b=0.75)
        mine = sorted(by_q.get(qid, []))
        assert [(r, d) for r, d, _ in mine] == [(r, d) for r, d, _ in expected], qid
    # postings sortedness survives the merge
    row = idx.postings.filter("term = 'http'").collect()[0]
    doc_ids = [p["doc_id"] for p in row["postings"]]
    assert doc_ids == sorted(doc_ids)
    assert row["df"] == len(doc_ids)
