"""Scoring golden values — the WolframAlpha constants from the reference's
unit tests (``/root/reference/test/scoring/bm25_test.cpp`` and
``tf_idf_test.cpp``), asserted against both the numpy kernels and the Spark
Column expressions.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from fulltextsearch_spark.functions.scoring import bm25_np, idf_np, tfidf_np

# (N, avgdl, k1, b, dl, tf, df, expected) — bm25_test.cpp:5-38
BM25_CASES = [
    (4001, 1224.43, 1.5, 0.75, 1000, 10, 234, 6.28021),
    (4001, 1224.43, 1.5, 0.75, 1000, 0, 234, 0.0),
    (564000, 3389721.837, 1.5, 0.75, 12000000, 1, 133987, 0.670684),
]


@pytest.mark.parametrize("n,avgdl,k1,b,dl,tf,df,expected", BM25_CASES)
def test_bm25_golden_numpy(n, avgdl, k1, b, dl, tf, df, expected):
    idf = idf_np(np.array([df]), n)
    got = bm25_np(np.array([tf]), idf, np.array([dl]), avgdl, k1, b)[0]
    assert got == pytest.approx(expected, abs=1e-4)


# (N, dl, tf, df, expected) — tf_idf_test.cpp:5-38 (WolframAlpha constants)
TFIDF_CASES = [
    (4001, 1000, 10, 234, 0.0283709393),
    (4001, 1000, 0, 234, 0.0),
    (564000, 12000000, 1, 133987, 0.000000119775),
]


@pytest.mark.parametrize("n,dl,tf,df,expected", TFIDF_CASES)
def test_tfidf_golden_numpy(n, dl, tf, df, expected):
    idf = idf_np(np.array([df]), n)
    got = tfidf_np(np.array([tf]), idf, np.array([dl]))[0]
    assert got == pytest.approx(expected, abs=1e-5)
    if tf:
        exact = (tf / dl) * math.log((n - df + 0.5) / (df + 0.5) + 1)
        assert got == pytest.approx(exact, rel=1e-12)


def test_bm25_golden_column(spark):
    from pyspark.sql import functions as F

    from fulltextsearch_spark.functions.scoring import bm25_col

    rows = [(tf, df, dl, n, avgdl, k1, b, exp) for n, avgdl, k1, b, dl, tf, df, exp in BM25_CASES]
    for tf, df, dl, n, avgdl, k1, b, exp in rows:
        out = (
            spark.range(1)
            .select(
                bm25_col(F.lit(tf), F.lit(df), F.lit(dl), n, avgdl, k1, b).alias("s")
            )
            .collect()[0]["s"]
        )
        assert out == pytest.approx(exp, abs=1e-4)


def test_column_and_numpy_bit_identical(spark):
    from pyspark.sql import functions as F

    from fulltextsearch_spark.functions.scoring import bm25_col

    n, avgdl, k1, b = 4001, 1224.43, 1.2, 0.75
    cases = [(tf, df, dl) for tf in (1, 3, 17) for df in (1, 234, 4000) for dl in (1, 52, 2000)]
    sdf = spark.createDataFrame(cases, "tf LONG, df LONG, dl LONG")
    got = {
        (r["tf"], r["df"], r["dl"]): r["s"]
        for r in sdf.select("tf", "df", "dl", bm25_col(F.col("tf"), F.col("df"), F.col("dl"), n, avgdl, k1, b).alias("s")).collect()
    }
    for tf, df, dl in cases:
        np_val = bm25_np(np.array([tf]), idf_np(np.array([df]), n), np.array([dl]), avgdl, k1, b)[0]
        assert got[(tf, df, dl)] == np_val  # exact IEEE-754 equality


def test_lm_jm_and_dfr_columns_match_formula(spark):
    from pyspark.sql import functions as F

    from fulltextsearch_spark.functions.scoring import dfr_inl2_col, lm_jm_col

    rows = [(3, 7, 120, 40), (1, 2, 15, 9), (8, 30, 300, 300)]  # tf, cf/df, dl, ...
    df = spark.createDataFrame(rows, ["tf", "stat", "dl", "extra"])
    total, lam = 10_000.0, 0.1
    got_jm = [
        r[0]
        for r in df.select(
            lm_jm_col(F.col("tf"), F.col("stat"), F.col("dl"), total, lam)
        ).collect()
    ]
    for (tf, cf, dl, _), g in zip(rows, got_jm):
        want = math.log(1.0 + ((1.0 - lam) * tf / dl) / (lam * (cf / total)))
        assert g == pytest.approx(want, rel=1e-12)
        assert g > 0.0  # JM never needs the Dirichlet clamp on a match

    n_docs, avgdl = 5000.0, 180.0
    got_dfr = [
        r[0]
        for r in df.select(
            dfr_inl2_col(F.col("tf"), F.col("stat"), F.col("dl"), n_docs, avgdl)
        ).collect()
    ]
    for (tf, d_f, dl, _), g in zip(rows, got_dfr):
        tfn = tf * math.log2(1.0 + avgdl / dl)
        want = tfn / (tfn + 1.0) * math.log2((n_docs + 1.0) / (d_f + 0.5))
        assert g == pytest.approx(want, rel=1e-12)


def test_lm_jm_search_ranks_by_formula(spark):
    from pyspark.sql import functions as F

    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.operators.index_build import build_index
    from fulltextsearch_spark.operators.query import search, search_lm_jm

    docs = spark.createDataFrame(
        [
            (0, "salmon salmon salmon trout"),
            (1, "salmon trout pike pike pike pike pike pike"),
            (2, "trout trout"),
            (3, "salmon"),
        ],
        ["doc_id", "text"],
    )
    cfg = EngineConfig(k1=1.2, b=0.75, k=4, stem=False)
    idx = build_index(spark, docs, cfg, persist=False)
    q = spark.createDataFrame([("q", "salmon")], ["query_id", "content"])
    got = [(r["doc_id"], r["score"]) for r in search_lm_jm(idx, q, cfg).collect()]
    # brute: tf/dl dominates under JM -> doc3 (1/1) > doc0 (3/4) > doc1 (1/8)
    assert [d for d, _ in got] == [3, 0, 1]
    total = idx.avgdl * idx.n_docs
    cf = 5.0  # salmon occurrences
    for d, s, tf, dl in [(3, got[0][1], 1, 1), (0, got[1][1], 3, 4), (1, got[2][1], 1, 8)]:
        want = math.log(1.0 + (0.9 * tf / dl) / (0.1 * (cf / total)))
        assert s == pytest.approx(want, rel=1e-12)
    # DFR dispatch flows through the shared search()
    dfr = search(idx, q, cfg, scoring="dfr").collect()
    assert len(dfr) == 3 and dfr[0]["rank"] == 1
