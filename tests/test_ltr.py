"""Closed-form ridge LTR: weights match numpy's solve, external labels,
conditioning guard."""

from __future__ import annotations

import numpy as np
import pytest

from fulltextsearch_spark.config import EngineConfig
from fulltextsearch_spark.operators.index_build import build_index
from fulltextsearch_spark.operators.ltr import ltr_features, ridge_weights, search_ltr
from fulltextsearch_spark.sources.ingest import assign_dense_doc_ids
from fulltextsearch_spark.sources.webpages import QUERY_SET, generate_webpages

CFG = EngineConfig(k1=1.2, b=0.75, k=10, stem=True)
L2 = 0.1


@pytest.fixture(scope="module")
def index(spark):
    corpus = assign_dense_doc_ids(
        generate_webpages(spark, 250, seed=3, num_partitions=4), order_col="url"
    )
    return build_index(spark, corpus, CFG, persist=False)


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERY_SET[:5], ["query_id", "content"])


def test_ridge_weights_match_numpy(spark, index, queries):
    feats = ltr_features(index, queries, CFG)
    rows = feats.collect()
    X = np.array([[r["f_bm25"], r["f_dlr"], 1.0] for r in rows])
    y = np.array([r["label"] for r in rows])
    w_np = np.linalg.solve(X.T @ X + L2 * np.eye(3), X.T @ y)
    got = ridge_weights(feats, L2).collect()[0]
    assert got["det"] > 0  # SPD + ridge
    np.testing.assert_allclose(
        [got["w1"], got["w2"], got["w0"]], w_np, rtol=1e-9, atol=1e-12
    )


def test_search_ltr_matches_brute_rerank(spark, index, queries):
    feats = ltr_features(index, queries, CFG)
    rows = feats.collect()
    X = np.array([[r["f_bm25"], r["f_dlr"], 1.0] for r in rows])
    y = np.array([r["label"] for r in rows])
    w = np.linalg.solve(X.T @ X + L2 * np.eye(3), X.T @ y)
    exp = {}
    for r in rows:
        s = w[0] * r["f_bm25"] + w[1] * r["f_dlr"] + w[2]
        exp.setdefault(r["query_id"], []).append((-s, r["doc_id"]))
    for v in exp.values():
        v.sort()
    got = {}
    for r in search_ltr(index, queries, CFG, l2=L2).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, lst in got.items():
        lst.sort()
        want = [d for _, d in exp[qid][: len(lst)]]
        assert [d for _, d, _ in lst] == want, qid
        for (rk, d, s), (negs, _) in zip(lst, exp[qid]):
            assert abs(s - (-negs)) < 1e-7


def test_external_labels_change_ranking(spark, index, queries):
    """Training against labels that reward ONE specific doc makes the model
    lean on whatever features that doc has — the external-label join path
    must produce different weights than self-supervised mode."""
    feats = ltr_features(index, queries, CFG)
    some = feats.limit(3).select("query_id", "doc_id").collect()
    labels = spark.createDataFrame(
        [(r["query_id"], r["doc_id"], 5.0) for r in some],
        "query_id STRING, doc_id LONG, label DOUBLE",
    )
    a = ridge_weights(feats, L2).collect()[0]
    import pyspark.sql.functions as F

    ext = labels.select("query_id", "doc_id", F.col("label").alias("_ext"))
    feats_ext = feats.drop("label").join(ext, ["query_id", "doc_id"], "left").select(
        "query_id", "doc_id", "f_bm25", "f_dlr",
        F.coalesce("_ext", F.lit(0.0)).alias("label"),
    )
    b = ridge_weights(feats_ext, L2).collect()[0]
    assert (a["w1"], a["w2"], a["w0"]) != (b["w1"], b["w2"], b["w0"])
    out = search_ltr(index, queries, CFG, l2=L2, labels=labels)
    assert out.count() > 0


def test_ridge_rejects_nonpositive_l2(spark, index, queries):
    feats = ltr_features(index, queries, CFG)
    with pytest.raises(ValueError):
        ridge_weights(feats, 0.0)
