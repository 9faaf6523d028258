"""Federated search == monolithic search over the union corpus, for any
shard split — the global-statistics contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fulltextsearch_spark.config import EngineConfig
from fulltextsearch_spark.operators.federated import search_federated
from fulltextsearch_spark.operators.index_build import build_index
from fulltextsearch_spark.operators.query import search
from fulltextsearch_spark.sources.ingest import assign_dense_doc_ids
from fulltextsearch_spark.sources.webpages import QUERY_SET, generate_webpages

CFG = EngineConfig(k1=1.2, b=0.75, k=10, stem=True)


@pytest.fixture(scope="module")
def corpus(spark):
    pages = generate_webpages(spark, 300, seed=21, num_partitions=4)
    return assign_dense_doc_ids(pages, order_col="url")


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERY_SET[:8], ["query_id", "content"])


def _rmap(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for v in out.values():
        v.sort()
    return out


@pytest.mark.parametrize("cuts", [(150,), (60, 240), (1,)])
def test_federated_matches_monolithic(spark, corpus, queries, cuts):
    mono = build_index(spark, corpus, CFG, persist=False)
    want = _rmap(search(mono, queries, CFG).collect())

    bounds = [0, *cuts, 10**9]
    shards = [
        build_index(
            spark,
            corpus.where(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ),
            CFG,
            persist=False,
        )
        for lo, hi in zip(bounds, bounds[1:])
    ]
    got = _rmap(search_federated(shards, queries, CFG).collect())
    assert set(got) == set(want)
    for qid in want:
        g, w = got[qid], want[qid]
        assert [(r, d) for r, d, _ in g] == [(r, d) for r, d, _ in w], qid
        assert all(abs(a[2] - b[2]) < 1e-9 for a, b in zip(g, w)), qid


def test_federated_single_shard_is_plain_search(spark, corpus, queries):
    mono = build_index(spark, corpus, CFG, persist=False)
    a = _rmap(search(mono, queries, CFG).collect())
    b = _rmap(search_federated([mono], queries, CFG).collect())
    assert a == b


def test_federated_rejects_empty(spark, queries):
    with pytest.raises(ValueError):
        search_federated([], queries, CFG)
