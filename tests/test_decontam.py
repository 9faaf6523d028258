"""Benchmark decontamination (exact n-gram overlap vs an eval set)."""

from __future__ import annotations

import pytest

from fulltextsearch_spark.operators.decontam import (
    contamination_flags,
    decontaminate,
    doc_ngrams,
)
from fulltextsearch_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="test-decontam", master="local[2]", shuffle_partitions=2)
    yield s


def _corpus(spark):
    return spark.createDataFrame(
        [
            # 0 copies the benchmark question verbatim inside other prose
            (0, "intro words here which capital city of france is paris end"),
            # 1 shares only a shorter overlap (< n tokens) -> clean
            (1, "capital city of somewhere else entirely different words"),
            # 2 totally unrelated
            (2, "salmon swim upstream in the cold river every autumn"),
            # 3 shorter than n tokens AND unrelated -> clean, still in output
            (3, "two tokens"),
            # 4 contains BOTH benchmark rows' grams
            (4, "which capital city of france is paris and water boils at one hundred degrees celsius"),
        ],
        ["doc_id", "text"],
    )


def _bench(spark):
    return spark.createDataFrame(
        [
            ("which capital city of france is paris",),
            ("water boils at one hundred degrees celsius",),
        ],
        ["text"],
    )


def test_doc_ngrams_sliding_and_short_docs(spark):
    df = spark.createDataFrame([(0, "a1 b1 c1 d1"), (1, "a1 b1")], ["doc_id", "text"])
    got = {(r["doc_id"], r["gram"]) for r in doc_ngrams(df, n=3).collect()}
    assert got == {(0, "a1 b1 c1"), (0, "b1 c1 d1")}  # doc 1: < n tokens, no rows


def test_doc_ngrams_distinct_within_doc(spark):
    df = spark.createDataFrame([(0, "x1 y1 x1 y1 x1 y1")], ["doc_id", "text"])
    rows = doc_ngrams(df, n=2).collect()
    assert sorted(r["gram"] for r in rows) == ["x1 y1", "y1 x1"]  # each once


def test_contamination_flags(spark):
    flags = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in contamination_flags(_corpus(spark), _bench(spark), n=3).collect()
    }
    assert set(flags) == {0, 1, 2, 3, 4}  # total over the corpus
    assert flags[0][1] and flags[0][0] >= 1
    assert flags[1] == (0, False)
    assert flags[2] == (0, False)
    assert flags[3] == (0, False)
    assert flags[4][1] and flags[4][0] > flags[0][0]  # hits both bench rows


def test_min_hits_threshold(spark):
    flags = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_flags(
            _corpus(spark), _bench(spark), n=3, min_hits=3
        ).collect()
    }
    # surviving-token streams (stop words removed): doc 0 overlaps the
    # question's 2 trigrams; doc 4 those 2 plus the second bench row's 3
    assert flags[0] is False and flags[4] is True


def test_decontaminate_removes_exactly_flagged(spark):
    clean = decontaminate(_corpus(spark), _bench(spark), n=3)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2, 3]
    assert clean.columns == ["doc_id", "text"]  # original columns kept


def test_shuffle_join_path_matches_broadcast(spark):
    a = contamination_flags(_corpus(spark), _bench(spark), n=3, broadcast=True)
    b = contamination_flags(_corpus(spark), _bench(spark), n=3, broadcast=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
