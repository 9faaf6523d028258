"""More-Like-This: seed term selection + related-doc ranking semantics."""

from __future__ import annotations

import math

from fulltextsearch_spark.config import EngineConfig
from fulltextsearch_spark.functions.tokenizer import tokenize
from fulltextsearch_spark.operators.index_build import build_index
from fulltextsearch_spark.operators.morelikethis import (
    more_like_this,
    seed_query_terms,
)

CFG = EngineConfig(k1=1.2, b=0.75, k=10, stem=False)

TEXTS = [
    "salmon rivers run cold and the salmon leap upstream",  # 0 (seed)
    "the salmon leap upstream where rivers run cold",  # 1: near-dup of 0
    "quantum computing hardware with cryogenic qubit control",  # 2
    "cold rivers carve canyons through granite and stone",  # 3: partial overlap
    "qubit error correction on cryogenic control hardware",  # 4
    "a cookbook of soups and stews for cold winter evenings",  # 5
]


def _docs(spark):
    return spark.createDataFrame(list(enumerate(TEXTS)), ["doc_id", "text"])


def test_seed_terms_are_top_tfidf(spark):
    docs = _docs(spark)
    idx = build_index(spark, docs, CFG, persist=False)
    got = seed_query_terms(idx, docs, [0], stem=False, max_query_terms=3)
    rows = {r["term"] for r in got.collect()}

    # brute tf-idf over the same tokenizer
    streams = {d: tokenize(t, do_stem=False) for d, t in enumerate(TEXTS)}
    n = len(TEXTS)
    df: dict[str, int] = {}
    for toks in streams.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    toks0 = streams[0]
    w = {
        t: (toks0.count(t) / len(toks0))
        * math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        for t in set(toks0)
    }
    want = {t for t, _ in sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:3]}
    assert rows == want


def test_neardup_ranks_first_and_seed_excluded(spark):
    docs = _docs(spark)
    idx = build_index(spark, docs, CFG, persist=False)
    res = more_like_this(idx, docs, [0, 2], CFG, max_query_terms=5).collect()
    by_seed = {}
    for r in res:
        by_seed.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    # the near-duplicate is the most-like doc; the seed never appears
    assert sorted(by_seed[0])[0] == (1, 1)
    assert all(d != 0 for _, d in by_seed[0])
    # the qubit seed pulls the other qubit doc first, not the salmon docs
    assert sorted(by_seed[2])[0] == (1, 4)
    assert all(d != 2 for _, d in by_seed[2])


def test_max_query_terms_caps_recall(spark):
    docs = _docs(spark)
    idx = build_index(spark, docs, CFG, persist=False)
    # with a single query term, only docs containing that one term can match
    res = more_like_this(idx, docs, [0], CFG, max_query_terms=1).collect()
    top_term = {
        r["term"] for r in seed_query_terms(idx, docs, [0], stem=False, max_query_terms=1).collect()
    }.pop()
    matched = {r["doc_id"] for r in res}
    holders = {d for d, t in enumerate(TEXTS) if top_term in tokenize(t, do_stem=False)}
    assert matched == holders - {0}
