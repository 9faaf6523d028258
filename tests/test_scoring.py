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
