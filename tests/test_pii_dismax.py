"""PII scrubbing and disjunction-max retrieval — pinned against Python
re / brute-force recomputation.
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from fulltextsearch_spark.config import EngineConfig
from fulltextsearch_spark.functions.tokenizer import tokenize
from fulltextsearch_spark.operators.index_build import build_index
from fulltextsearch_spark.sources.webpages import generate_webpages_pdf

CFG = EngineConfig(k1=1.2, b=0.75, k=10, stem=False)


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------


PII_DOCS = [
    (0, "mail me at john.doe+spam@mail-host.example.com or visit the office"),
    (1, "server at 192.168.0.17 answered, backup at 10.0.0.1 did not"),
    (2, "call +1 555 0142 9876 or 555-867-5309 after hours"),
    (3, "nothing sensitive here just words and the number 42"),
    (4, "combo: a@b.co from 8.8.8.8 dialed 020 7946 0958 twice: 020 7946 0958"),
    (5, ""),
]


def _brute_scrub(text: str):
    from fulltextsearch_spark.operators.pii import PII_PATTERNS

    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = len(re.findall(pat, text))
        text = re.sub(pat, repl, text)
    return text, counts


def test_scrub_pii_matches_python_re(spark):
    from fulltextsearch_spark.operators.pii import scrub_pii

    docs = spark.createDataFrame(PII_DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in scrub_pii(docs).collect()}
    assert set(got) == {d for d, _ in PII_DOCS}
    for doc_id, text in PII_DOCS:
        want_text, want_counts = _brute_scrub(text)
        g = got[doc_id]
        assert g["text"] == want_text, (doc_id, g["text"], want_text)
        for k, v in want_counts.items():
            assert g[k] == v, (doc_id, k, g[k], v)
    # the obvious semantic anchors
    assert "<EMAIL>" in got[0]["text"] and got[0]["n_email"] == 1
    assert got[1]["n_ip"] == 2 and "192.168" not in got[1]["text"]
    assert got[2]["n_phone"] >= 1 and "5309" not in got[2]["text"]
    assert got[3]["text"] == PII_DOCS[3][1]  # untouched
    assert got[4]["n_email"] == 1 and got[4]["n_ip"] == 1 and got[4]["n_phone"] == 2


def test_scrub_pii_email_wins_over_phone_digits(spark):
    """An email containing a long digit run must be redacted as EMAIL, and
    the digits inside it must not ALSO count as a phone hit."""
    from fulltextsearch_spark.operators.pii import scrub_pii

    docs = spark.createDataFrame(
        [(0, "reach 123456789a@digits.example.org today")], ["doc_id", "text"]
    )
    r = scrub_pii(docs).collect()[0]
    assert r["n_email"] == 1 and r["n_phone"] == 0 and r["n_ip"] == 0
    assert r["text"] == "reach <EMAIL> today"


# ---------------------------------------------------------------------------
# dis_max
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup(spark):
    pdf = generate_webpages_pdf(120, seed=59)[["text"]]
    pdf.insert(0, "doc_id", range(len(pdf)))
    docs = spark.createDataFrame(pdf)
    idx = build_index(spark, docs, CFG, persist=False)
    doc_toks = {
        int(r["doc_id"]): tokenize(r["text"], do_stem=False) for r in docs.collect()
    }
    return idx, doc_toks


def _dismax_brute(doc_toks, queries, tie, k):
    n = max(doc_toks) + 1
    dls = {d: len(t) for d, t in doc_toks.items()}
    avgdl = sum(dls.values()) / n
    df: dict[str, int] = {}
    tf: dict[tuple[int, str], int] = {}
    for d, toks in doc_toks.items():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
        for t in toks:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    out = []
    for qid, content in queries:
        qtf: dict[str, int] = {}
        for t in tokenize(content, do_stem=False):
            qtf[t] = qtf.get(t, 0) + 1
        scores: dict[int, float] = {}
        for d in doc_toks:
            per = []
            tot = 0.0
            for t, q in qtf.items():
                f = tf.get((d, t), 0)
                if f == 0:
                    continue
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s = idf * (f * (CFG.k1 + 1.0)) / (
                    f + CFG.k1 * (1.0 - CFG.b + CFG.b * dls[d] / avgdl)
                )
                per.append(s)
                tot += s * q
            if per:
                mx = max(per)
                scores[d] = mx + tie * (tot - mx)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend((qid, i + 1, d, s) for i, (d, s) in enumerate(ranked))
    return sorted(out)


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_dismax_matches_brute_force(spark, setup, tie):
    from fulltextsearch_spark.operators.dismax import search_dismax

    idx, doc_toks = setup
    queries = [("q1", "fish river fish"), ("q2", "salmon http page")]
    qdf = spark.createDataFrame(queries, ["query_id", "content"])
    got = sorted(map(tuple, search_dismax(idx, qdf, CFG, tie_breaker=tie).collect()))
    want = _dismax_brute(doc_toks, queries, tie, CFG.k)
    assert len(got) == len(want) and got
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert g[3] == pytest.approx(w[3], rel=1e-12)


def test_dismax_tie_one_equals_plain_sum(spark, setup):
    from fulltextsearch_spark.operators.dismax import search_dismax
    from fulltextsearch_spark.operators.query import search

    idx, _ = setup
    qdf = spark.createDataFrame([("q", "fish river salmon")], ["query_id", "content"])
    got = sorted(map(tuple, search_dismax(idx, qdf, CFG, tie_breaker=1.0).collect()))
    want = sorted(map(tuple, search(idx, qdf, CFG).collect()))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], rel=1e-12)


def test_dismax_rejects_bad_tie_breaker(spark, setup):
    from fulltextsearch_spark.operators.dismax import search_dismax

    idx, _ = setup
    qdf = spark.createDataFrame([("q", "fish")], ["query_id", "content"])
    with pytest.raises(ValueError):
        search_dismax(idx, qdf, CFG, tie_breaker=1.5)
