"""BM25F multi-field ranking, pinned against a brute-force Python oracle
(simple BM25F: per-field weighted length-normalized tf, shared saturation).
"""

from __future__ import annotations

import math

import pytest

from fulltextsearch_spark.functions.tokenizer import tokenize
from fulltextsearch_spark.operators.fields import bm25f_topk, build_fielded_index

K1 = 1.2
WEIGHTS = {"title": 2.5, "body": 1.0}
FIELD_B = {"title": 0.6, "body": 0.75}

DOCS = [
    # (doc_id, title, body)
    (0, "salmon fishing guide", "river salmon swim upstream every year"),
    (1, "cat care basics", "cat eats salmon fresh from market daily today"),
    (2, "empty body doc", ""),
    (3, "", "salmon salmon salmon cat cat guide"),
    (4, "river guide", "boat river trips fresh water fishing"),
]
QUERIES = [("f1", "salmon guide"), ("f2", "cat salmon salmon"), ("f3", "nosuchterm")]


def brute(k=10):
    streams = {
        d: {"title": tokenize(t, do_stem=False), "body": tokenize(b, do_stem=False)}
        for d, t, b in DOCS
    }
    n_docs = max(d for d, _, _ in DOCS) + 1
    avg = {
        f: sum(len(s[f]) for s in streams.values()) / n_docs
        for f in ("title", "body")
    }
    df: dict[str, int] = {}
    for s in streams.values():
        for t in set(s["title"]) | set(s["body"]):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, content in QUERIES:
        qtoks = tokenize(content, do_stem=False)
        qtf: dict[str, int] = {}
        for t in qtoks:
            qtf[t] = qtf.get(t, 0) + 1
        scores = {}
        for d, s in streams.items():
            total = 0.0
            hit = False
            for t, qn in qtf.items():
                if t not in df:
                    continue
                wtf = 0.0
                seen = False
                for f in ("title", "body"):
                    tf = s[f].count(t)
                    if tf:
                        seen = True
                        wtf += (
                            WEIGHTS[f]
                            * tf
                            / (1 - FIELD_B[f] + FIELD_B[f] * len(s[f]) / avg[f])
                        )
                if not seen:
                    continue
                hit = True
                idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                total += qn * idf * wtf / (K1 + wtf)
            if hit:
                scores[d] = total
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
    return out


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "title", "body"])
    return build_fielded_index(docs, {"title": "title", "body": "body"}, stem=False)


def test_bm25f_matches_brute_force(spark, index):
    qdf = spark.createDataFrame(QUERIES, ["query_id", "content"])
    got: dict[str, list] = {}
    for r in bm25f_topk(index, qdf, WEIGHTS, FIELD_B, k1=K1, k=10).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    want = brute()
    assert set(got) == {q for q, rows in want.items() if rows}
    for qid, rows in got.items():
        rows.sort()
        assert [(rk, d) for rk, d, _ in rows] == [(rk, d) for rk, d, _ in want[qid]]
        for (_, _, s_got), (_, _, s_want) in zip(rows, want[qid]):
            assert s_got == pytest.approx(s_want, rel=1e-12)


def test_title_weight_changes_ranking(spark, index):
    # 'guide' appears in doc 0/4 titles and doc 3 body; with a huge title
    # weight the title docs must outrank the body-only doc
    qdf = spark.createDataFrame([("g", "guide")], ["query_id", "content"])
    heavy = {r["doc_id"]: r["rank"] for r in
             bm25f_topk(index, qdf, {"title": 50.0, "body": 1.0}, FIELD_B).collect()}
    assert heavy[0] < heavy[3] and heavy[4] < heavy[3]
    light = {r["doc_id"]: r["rank"] for r in
             bm25f_topk(index, qdf, {"title": 0.01, "body": 1.0}, FIELD_B).collect()}
    assert light[3] < light[0]


def test_missing_weight_raises(spark, index):
    qdf = spark.createDataFrame([("g", "guide")], ["query_id", "content"])
    with pytest.raises(ValueError, match="weights missing"):
        bm25f_topk(index, qdf, {"title": 1.0}, FIELD_B)
