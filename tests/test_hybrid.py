"""RRF fusion and faceted aggregation: exact scores, determinism, plan shape."""

from __future__ import annotations

import pytest

from fulltextsearch_spark.operators.facets import facet_counts
from fulltextsearch_spark.operators.hybrid import rrf_fuse, static_prior_per_query


def _list(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "rank", "doc_id"])


def test_rrf_exact_scores_and_tiebreak(spark):
    # list A ranks docs 1,2,3; list B ranks 3,4,1 — doc 3 and doc 1 appear in
    # both; doc 2 (A rank 2) and doc 4 (B rank 2) tie exactly -> doc_id ASC.
    a = _list(spark, [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)])
    b = _list(spark, [("q", 1, 3), ("q", 2, 4), ("q", 3, 1)])
    rows = rrf_fuse([a, b], rrf_k=60, k=10).collect()
    got = {r["doc_id"]: (r["rank"], r["score"]) for r in rows}
    assert got[1] == (1, pytest.approx(1 / 61 + 1 / 63, abs=0))
    assert got[3] == (2, pytest.approx(1 / 63 + 1 / 61, abs=0))
    # exact tie 1/62: doc 2 before doc 4
    assert got[2][0] == 3 and got[4][0] == 4
    assert got[2][1] == got[4][1] == pytest.approx(1 / 62, abs=0)


def test_rrf_weights_and_k_cap(spark):
    a = _list(spark, [("q", 1, 10), ("q", 2, 11)])
    b = _list(spark, [("q", 1, 11)])
    rows = rrf_fuse([a, b], rrf_k=0, k=1, weights=[1.0, 3.0]).collect()
    # doc 11: 1/2 + 3/1 = 3.5 beats doc 10: 1/1
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 11 and rows[0]["score"] == pytest.approx(3.5, abs=0)


def test_rrf_input_validation(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
    a = _list(spark, [("q", 1, 1)])
    with pytest.raises(ValueError):
        rrf_fuse([a, a], weights=[1.0])


def test_static_prior_per_query(spark):
    prior = spark.createDataFrame(
        [(0, 0.5), (1, 0.9), (2, 0.9), (3, 0.1)], ["doc_id", "pr"]
    )
    qids = spark.createDataFrame([("a",), ("b",), ("a",)], ["query_id"])
    rows = static_prior_per_query(prior, qids, "pr", k=3).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], {})[r["rank"]] = r["doc_id"]
    # top-3 by (pr DESC, doc_id ASC): 1, 2, 0 — identical for every query
    assert per_q == {"a": {1: 1, 2: 2, 3: 0}, "b": {1: 1, 2: 2, 3: 0}}


def test_facet_counts_and_broadcast_plan(spark):
    results = spark.createDataFrame(
        [("q1", 1, 0), ("q1", 2, 1), ("q1", 3, 2), ("q2", 1, 1)],
        ["query_id", "rank", "doc_id"],
    )
    meta = spark.createDataFrame(
        [(0, "en"), (1, "en"), (2, "de"), (3, "fr")], ["doc_id", "lang"]
    )
    df = facet_counts(results, meta, "lang")
    got = {(r["query_id"], r["lang"]): (r["n_docs"], r["best_rank"]) for r in df.collect()}
    assert got == {
        ("q1", "en"): (2, 1),
        ("q1", "de"): (1, 3),
        ("q2", "en"): (1, 1),
    }
    # the hit list must be the broadcast side — the corpus never shuffles
    assert "BroadcastHashJoin" in df._jdf.queryExecution().executedPlan().toString()


def test_date_histogram_buckets_and_metric(spark):
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, 5), "a", 10),
        (dt.datetime(2024, 1, 1, 23), "a", 5),
        (dt.datetime(2024, 1, 2, 0), "a", 7),
        (dt.datetime(2024, 1, 1, 12), "b", 1),
    ]
    from fulltextsearch_spark.operators.facets import date_histogram

    df = spark.createDataFrame(rows, ["ts", "etype", "v"])
    out = date_histogram(df, ts="ts", interval="day", keys=("etype",), value="v")
    got = {(r["bucket"].day, r["etype"]): (r["n"], r["sum_v"]) for r in out.collect()}
    assert got == {(1, "a"): (2, 15), (2, "a"): (1, 7), (1, "b"): (1, 1)}


def test_pipeline_aggs_derivative_cum_moving(spark):
    """ES pipeline aggs: deriv = bucket-over-bucket delta (NULL first),
    cum = running sum, mov_avg = trailing-3 unweighted mean, per key."""
    import datetime as dt

    from fulltextsearch_spark.operators.facets import date_histogram, pipeline_aggs

    rows = []
    for day, n in [(1, 3), (2, 5), (3, 2), (4, 10)]:
        rows += [(dt.datetime(2024, 1, day, h), "a") for h in range(n)]
    rows += [(dt.datetime(2024, 1, 1, 0), "b"), (dt.datetime(2024, 1, 3, 0), "b")]
    df = spark.createDataFrame(rows, ["ts", "etype"])
    h = date_histogram(df, ts="ts", interval="day", keys=("etype",))
    out = pipeline_aggs(h, metric="n", keys=("etype",), window=3)
    got = {
        (r["bucket"].day, r["etype"]): (r["deriv"], r["cum"], r["mov_avg"])
        for r in out.collect()
    }
    assert got == {
        (1, "a"): (None, 3, 3.0),
        (2, "a"): (2, 8, 4.0),
        (3, "a"): (-3, 10, round(10 / 3, 4)),
        (4, "a"): (8, 20, round(17 / 3, 4)),
        (1, "b"): (None, 1, 1.0),
        (3, "b"): (0, 2, 1.0),  # derivative over PRESENT buckets (no gap fill)
    }


def test_collocations_pmi_bruteforce(spark):
    """PMI and top-k ordering vs a Python recomputation over the engine
    tokenizer's own stream."""
    import math

    from fulltextsearch_spark.functions.tokenizer import tokenize
    from fulltextsearch_spark.operators.textstats import collocations

    texts = [
        "red fox red fox jumps",
        "red fox sleeps",
        "blue bird blue bird blue bird",
        "red fox and blue bird",
        "lonely",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = [
        (r["w1"], r["w2"], r["n"], round(r["pmi"], 9))
        for r in collocations(docs, min_count=2, k=5).collect()
    ]
    streams = [tokenize(t, do_stem=False) for t in texts]
    uni: dict = {}
    big: dict = {}
    for s in streams:
        for w in s:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(s, s[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    nu = sum(uni.values())
    nb = sum(big.values())
    want = [
        (a, b, n, round(math.log(n * nu * nu / (nb * uni[a] * uni[b])), 9))
        for (a, b), n in big.items()
        if n >= 2
    ]
    want.sort(key=lambda x: (-x[3], x[0], x[1]))
    assert got == want[:5]
