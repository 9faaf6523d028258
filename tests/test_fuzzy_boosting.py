"""Fuzzy (edit-distance) search and the boosting (demotion) query — pinned
against brute-force recomputation.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fulltextsearch_spark.config import EngineConfig
from fulltextsearch_spark.functions.tokenizer import tokenize
from fulltextsearch_spark.operators.index_build import build_index
from fulltextsearch_spark.operators.query import search
from fulltextsearch_spark.sources.webpages import generate_webpages_pdf

CFG = EngineConfig(k1=1.2, b=0.75, k=10, stem=False)


@pytest.fixture(scope="module")
def setup(spark):
    pdf = generate_webpages_pdf(120, seed=67)[["text"]]
    pdf.insert(0, "doc_id", range(len(pdf)))
    docs = spark.createDataFrame(pdf)
    idx = build_index(spark, docs, CFG, persist=False)
    doc_toks = {
        int(r["doc_id"]): tokenize(r["text"], do_stem=False) for r in docs.collect()
    }
    vocab = sorted({t for toks in doc_toks.values() for t in toks})
    return idx, doc_toks, vocab


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_expand_fuzzy_matches_brute(spark, setup):
    from fulltextsearch_spark.operators.fuzzy import expand_fuzzy

    idx, _doc_toks, vocab = setup
    qs = [("f1", "fich"), ("f1", "rivr"), ("f2", "salmon")]
    qdf = spark.createDataFrame(qs, ["query_id", "qterm"])
    got = {
        (r["query_id"], r["term"]): r["qtf"]
        for r in expand_fuzzy(idx, qdf, max_edits=2, max_expansions=None).collect()
    }
    want: dict = {}
    for qid, qt in qs:
        for t in vocab:
            d = _lev(qt, t)
            if d <= 2:
                boost = 1.0 - d / min(len(qt), len(t))
                want[(qid, t)] = want.get((qid, t), 0.0) + boost
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], rel=1e-12)


def test_expand_fuzzy_prefix_len_restricts(spark, setup):
    from fulltextsearch_spark.operators.fuzzy import expand_fuzzy

    idx, _doc_toks, vocab = setup
    qdf = spark.createDataFrame([("f", "fich")], ["query_id", "qterm"])
    got = {r["term"] for r in
           expand_fuzzy(idx, qdf, max_edits=2, prefix_len=1,
                        max_expansions=None).collect()}
    want = {t for t in vocab if t[:1] == "f" and _lev("fich", t) <= 2}
    assert got == want and got


def test_expand_fuzzy_max_expansions_prefers_fewest_edits(spark, setup):
    from fulltextsearch_spark.operators.fuzzy import expand_fuzzy

    idx, _doc_toks, vocab = setup
    df_by_term = {r["term"]: r["df"] for r in idx.postings.select("term", "df").collect()}
    qdf = spark.createDataFrame([("f", "fish")], ["query_id", "qterm"])
    got = sorted(
        r["term"]
        for r in expand_fuzzy(idx, qdf, max_edits=2, max_expansions=3).collect()
    )
    cands = sorted(
        ((_lev("fish", t), -df_by_term[t], t) for t in vocab if _lev("fish", t) <= 2),
    )[:3]
    assert got == sorted(t for _, _, t in cands)
    # the exact term must always survive the cap (edits=0 sorts first)
    assert "fish" in got


def test_search_fuzzy_exact_term_zero_edits_equals_search(spark, setup):
    """max_edits=0 degenerates to plain search with boost 1 per term."""
    from fulltextsearch_spark.operators.fuzzy import search_fuzzy

    idx, _doc_toks, _vocab = setup
    qdf = spark.createDataFrame(
        [("q", "fish"), ("q", "river")], ["query_id", "qterm"]
    )
    got = _rows(search_fuzzy(idx, qdf, CFG, max_edits=0))
    plain = spark.createDataFrame([("q", "fish river")], ["query_id", "content"])
    want = _rows(search(idx, plain, CFG))
    assert len(got) == len(want) and got
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert g[3] == pytest.approx(w[3], rel=1e-12)


def test_search_boosting_demotes_negative_matches(spark, setup):
    from fulltextsearch_spark.operators.functionscore import search_boosting

    idx, doc_toks, _vocab = setup
    pos = spark.createDataFrame([("q", "fish river")], ["query_id", "content"])
    neg = spark.createDataFrame([("q", "salmon")], ["query_id", "content"])
    nb = 0.25
    got = _rows(search_boosting(idx, pos, neg, CFG, negative_boost=nb, k=10**6))
    full = search(idx, pos, CFG, k=10**6).collect()
    scores = {}
    for r in full:
        s = r["score"]
        if "salmon" in doc_toks[r["doc_id"]]:
            s *= nb
        scores[r["doc_id"]] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    want = sorted(("q", i + 1, d, s) for i, (d, s) in enumerate(ranked))
    assert len(got) == len(want) and got
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert g[3] == pytest.approx(w[3], rel=1e-12)
    # at least one doc actually got demoted below a non-matching doc
    assert any("salmon" in doc_toks[d] for d in scores)


def test_search_boosting_rejects_bad_boost(spark, setup):
    from fulltextsearch_spark.operators.functionscore import search_boosting

    idx, _doc_toks, _vocab = setup
    q = spark.createDataFrame([("q", "fish")], ["query_id", "content"])
    with pytest.raises(ValueError):
        search_boosting(idx, q, q, CFG, negative_boost=0.0)


def test_autocorrect_noisy_channel_rules(spark):
    """Valid tokens never change; OOV tokens take the best ln(df)-lam*edits
    candidate; gibberish keeps itself; corrected retrieval == retrieval of
    the hand-corrected query."""
    from pyspark.sql import functions as F

    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.operators.fuzzy import (
        autocorrect_terms,
        search_autocorrect,
    )
    from fulltextsearch_spark.operators.index_build import build_index
    from fulltextsearch_spark.operators.query import search

    docs = spark.createDataFrame(
        [(i, "spark engine runs queries fast " + ("common " * (i % 3)))
         for i in range(40)] + [(40, "sparse corner word")],
        "doc_id LONG, text STRING",
    )
    cfg = EngineConfig(k1=1.2, b=0.75, k=10, stem=False)
    idx = build_index(spark, docs, cfg, persist=False)
    slots = spark.createDataFrame(
        [("q1", 0, "spark"),    # in dictionary -> unchanged
         ("q1", 1, "enginee"),  # 1 edit -> engine
         ("q1", 2, "sparse"),   # valid but 1 edit from 'spark' -> MUST stay
         ("q1", 3, "zzqxv")],   # gibberish -> keeps itself, edits = -1
        "query_id STRING, slot LONG, term STRING",
    )
    got = {r["slot"]: (r["corrected"], r["edits"])
           for r in autocorrect_terms(idx, slots).collect()}
    assert got[0] == ("spark", 0)
    assert got[1] == ("engine", 1)
    assert got[2] == ("sparse", 0)
    assert got[3] == ("zzqxv", -1)

    misspelled = spark.createDataFrame(
        [("q", "sparrk enginee runns")], ["query_id", "content"]
    )
    corrected = spark.createDataFrame(
        [("q", "spark engine runs")], ["query_id", "content"]
    )
    a = sorted(map(tuple, search_autocorrect(idx, misspelled, cfg).collect()))
    b = sorted(map(tuple, search(idx, corrected, cfg).collect()))
    assert a == b and a
