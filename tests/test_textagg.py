"""Doc keywords, token entropy, and exact percentile aggregation — pinned
against brute-force recomputation.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fulltextsearch_spark.config import EngineConfig
from fulltextsearch_spark.functions.tokenizer import tokenize
from fulltextsearch_spark.operators.index_build import build_index
from fulltextsearch_spark.sources.webpages import generate_webpages_pdf

CFG = EngineConfig(k1=1.2, b=0.75, k=10, stem=False)


@pytest.fixture(scope="module")
def setup(spark):
    pdf = generate_webpages_pdf(100, seed=61)[["text"]]
    pdf.insert(0, "doc_id", range(len(pdf)))
    docs = spark.createDataFrame(pdf)
    idx = build_index(spark, docs, CFG, persist=False)
    doc_toks = {
        int(r["doc_id"]): tokenize(r["text"], do_stem=False) for r in docs.collect()
    }
    return idx, docs, doc_toks


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_doc_keywords_match_brute_tfidf(spark, setup):
    from fulltextsearch_spark.operators.termvectors import doc_keywords

    idx, docs, doc_toks = setup
    ids = [2, 9, 31]
    m = 4
    got = _rows(
        doc_keywords(idx, docs, spark.createDataFrame([(i,) for i in ids], ["doc_id"]),
                     CFG, top_terms=m)
    )
    n = max(doc_toks) + 1
    df_by_term: dict[str, int] = {}
    for toks in doc_toks.values():
        for t in set(toks):
            df_by_term[t] = df_by_term.get(t, 0) + 1
    want = []
    for d in ids:
        toks = doc_toks[d]
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        scored = [
            (t, (c / len(toks)) * math.log((n - df_by_term[t] + 0.5) /
                                           (df_by_term[t] + 0.5) + 1.0))
            for t, c in tf.items()
        ]
        top = sorted(scored, key=lambda x: (-x[1], x[0]))[:m]
        want.extend((d, i + 1, t, s) for i, (t, s) in enumerate(top))
    want = sorted(want)
    assert len(got) == len(want) and got
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert g[3] == pytest.approx(w[3], rel=1e-12)


def test_token_entropy_matches_brute(spark, setup):
    from fulltextsearch_spark.operators.textstats import token_entropy

    _idx, docs, doc_toks = setup
    got = {r["doc_id"]: r.asDict() for r in token_entropy(docs).collect()}
    assert set(got) == set(doc_toks)
    for d, toks in doc_toks.items():
        g = got[d]
        assert g["dl"] == len(toks)
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        assert g["n_types"] == len(tf)
        if toks:
            h = -sum((c / len(toks)) * math.log2(c / len(toks)) for c in tf.values())
            assert g["entropy"] == pytest.approx(h, rel=1e-12)
            assert g["ttr"] == pytest.approx(len(tf) / len(toks), rel=1e-12)
        else:
            assert g["entropy"] == 0.0 and g["ttr"] == 0.0


def test_token_entropy_keeps_empty_docs(spark):
    from fulltextsearch_spark.operators.textstats import token_entropy

    docs = spark.createDataFrame(
        [(0, "fish fish fish"), (1, ""), (2, "the of and")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r.asDict() for r in token_entropy(docs).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0]["entropy"] == 0.0 and got[0]["n_types"] == 1  # one repeated type
    assert got[1]["dl"] == 0 and got[1]["entropy"] == 0.0 and got[1]["ttr"] == 0.0
    assert got[2]["dl"] == 0  # pure-stopword doc tokenizes to nothing


def _quantile_cont(vals: list[float], p: float) -> float:
    s = sorted(vals)
    pos = p * (len(s) - 1)
    lo = int(math.floor(pos))
    hi = int(math.ceil(pos))
    return s[lo] + (pos - lo) * (s[hi] - s[lo])


def test_field_percentiles_exact_linear_interpolation(spark):
    from fulltextsearch_spark.operators.facets import field_percentiles

    rows = [("a", float(v)) for v in [1, 5, 2, 9, 7, 3]] + [
        ("b", float(v)) for v in [10, 30, 20]
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r["k"]: r.asDict()
        for r in field_percentiles(df, ["k"], "v", [0.25, 0.5, 0.9]).collect()
    }
    for key in ("a", "b"):
        vals = [v for k, v in rows if k == key]
        assert got[key]["p25"] == pytest.approx(_quantile_cont(vals, 0.25), rel=1e-12)
        assert got[key]["p50"] == pytest.approx(_quantile_cont(vals, 0.5), rel=1e-12)
        assert got[key]["p90"] == pytest.approx(_quantile_cont(vals, 0.9), rel=1e-12)


def test_field_percentiles_column_naming(spark):
    from fulltextsearch_spark.operators.facets import field_percentiles

    df = spark.createDataFrame([("a", 1.0)], ["k", "v"])
    out = field_percentiles(df, ["k"], "v", [0.25, 0.999])
    assert out.columns == ["k", "p25", "p99_9"]


def test_extended_stats_moment_derivation(spark):
    """extended_stats derives variance/std from integer moment sums — the
    values match an exact Python replay and the derivation is aggregation-
    order independent (same result with 1 vs 8 partitions)."""
    from fulltextsearch_spark.operators.facets import extended_stats

    rows = [("x", v) for v in [4, 7, 13, 16]] + [("y", v) for v in [10, 10, 40]]
    df = spark.createDataFrame(rows, ["k", "v"])
    for parts in (1, 8):
        got = {
            r["k"]: r.asDict()
            for r in extended_stats(df.repartition(parts), "v", keys=("k",)).collect()
        }
        for key in ("x", "y"):
            vals = [float(v) for k, v in rows if k == key]
            n, s, sq = len(vals), sum(vals), sum(v * v for v in vals)
            assert got[key]["n"] == n
            assert got[key]["min_v"] == min(vals) and got[key]["max_v"] == max(vals)
            assert got[key]["sum_v"] == s and got[key]["sumsq_v"] == sq
            assert got[key]["avg_v"] == s / n
            assert got[key]["variance"] == sq / n - (s / n) * (s / n)
            assert got[key]["std_dev"] == math.sqrt(sq / n - (s / n) * (s / n))


def test_value_histogram_gap_fill(spark):
    """value_histogram emits empty buckets between min and max (ES
    min_doc_count=0), counts exactly, and min_doc_count>0 filters."""
    from fulltextsearch_spark.operators.facets import value_histogram

    df = spark.createDataFrame([(v,) for v in [5, 17, 18, 52, 55, 103]], ["v"])
    got = {r["bucket"]: r["n"] for r in value_histogram(df, "v", 10).collect()}
    assert got == {0: 1, 10: 2, 20: 0, 30: 0, 40: 0, 50: 2, 60: 0, 70: 0, 80: 0, 90: 0, 100: 1}
    trimmed = {
        r["bucket"]: r["n"]
        for r in value_histogram(df, "v", 10, min_doc_count=2).collect()
    }
    assert trimmed == {10: 2, 50: 2}


def test_extended_stats_variance_clamped_nonnegative(spark):
    """Review regression: near-constant double columns must not produce a
    negative variance (and NaN std) from FP cancellation."""
    from fulltextsearch_spark.operators.facets import extended_stats

    df = spark.createDataFrame([(0.1,)] * 10, ["v"])
    row = extended_stats(df, "v").collect()[0]
    assert row["variance"] >= 0.0
    assert row["std_dev"] == row["std_dev"]  # not NaN
    assert row["std_dev"] < 1e-8
