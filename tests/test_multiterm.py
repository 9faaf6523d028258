"""Wildcard/regexp multi-term search, LM-Dirichlet ranking, and field
collapsing — pinned against brute-force recomputation on a small corpus.
"""

from __future__ import annotations

import fnmatch
import math
import re

import pytest
from pyspark.sql import functions as F

from fulltextsearch_spark.config import EngineConfig
from fulltextsearch_spark.functions.tokenizer import tokenize
from fulltextsearch_spark.operators.index_build import build_index
from fulltextsearch_spark.operators.multiterm import (
    expand_patterns,
    search_regexp,
    search_wildcard,
    wildcard_to_like,
)
from fulltextsearch_spark.sources.webpages import generate_webpages_pdf

CFG = EngineConfig(k1=1.2, b=0.75, k=10, stem=False)


@pytest.fixture(scope="module")
def setup(spark):
    pdf = generate_webpages_pdf(120, seed=47)[["text"]]
    pdf.insert(0, "doc_id", range(len(pdf)))
    docs = spark.createDataFrame(pdf)
    idx = build_index(spark, docs, CFG, persist=False)
    doc_toks = {
        int(r["doc_id"]): tokenize(r["text"], do_stem=False) for r in docs.collect()
    }
    vocab = sorted({t for toks in doc_toks.values() for t in toks})
    return idx, doc_toks, vocab


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# wildcard / regexp expansion
# ---------------------------------------------------------------------------


def test_wildcard_to_like_translation(spark):
    pats = spark.createDataFrame(
        [("a*", ), ("f?sh", ), ("50%*", ), ("a_b*", ), ("x\\y?", )], ["pattern"]
    )
    got = [r[0] for r in pats.select(wildcard_to_like(F.col("pattern"))).collect()]
    assert got == ["a%", "f_sh", "50\\%%", "a\\_b%", "x\\\\y_"]


def test_expand_wildcard_matches_fnmatch(spark, setup):
    idx, _doc_toks, vocab = setup
    pats = [("w1", "f*"), ("w2", "*ing"), ("w3", "?a*"), ("w2", "f*")]
    pdf = spark.createDataFrame(pats, ["query_id", "pattern"])
    got = {
        (r["query_id"], r["term"]): r["qtf"]
        for r in expand_patterns(idx, pdf, "wildcard").collect()
    }
    want: dict = {}
    for qid, pat in pats:
        for t in vocab:
            if fnmatch.fnmatchcase(t, pat):
                want[(qid, t)] = want.get((qid, t), 0) + 1
    assert got == want
    # multiplicity: a term matched by two of w2's patterns carries qtf=2
    assert any(v == 2 for (q, _), v in got.items() if q == "w2") or not {
        t for t in vocab if fnmatch.fnmatchcase(t, "*ing") and fnmatch.fnmatchcase(t, "f*")
    }


def test_expand_regexp_is_anchored(spark, setup):
    idx, _doc_toks, vocab = setup
    # 'a.' must match ONLY 2-char terms starting with a — not substrings
    pdf = spark.createDataFrame([("r1", "a."), ("r2", "f.*")], ["query_id", "pattern"])
    got = {
        (r["query_id"], r["term"])
        for r in expand_patterns(idx, pdf, "regexp").collect()
    }
    want = {("r1", t) for t in vocab if re.fullmatch("a.", t)} | {
        ("r2", t) for t in vocab if re.fullmatch("f.*", t)
    }
    assert got == want


def test_max_expansions_keeps_top_df(spark, setup):
    idx, _doc_toks, _vocab = setup
    pdf = spark.createDataFrame([("w", "*")], ["query_id", "pattern"])
    full = expand_patterns(idx, pdf, "wildcard")
    capped = expand_patterns(idx, pdf, "wildcard", max_expansions=5)
    df_by_term = {r["term"]: r["df"] for r in idx.postings.select("term", "df").collect()}
    got = sorted(r["term"] for r in capped.collect())
    want = sorted(
        sorted(df_by_term, key=lambda t: (-df_by_term[t], t))[:5]
    )
    assert got == want
    assert full.count() == len(df_by_term)


def test_search_wildcard_equals_expanded_plain_search(spark, setup):
    from fulltextsearch_spark.operators.query import _scored_candidates, topk

    idx, _doc_toks, _vocab = setup
    pdf = spark.createDataFrame([("w1", "f*"), ("w1", "sal*"), ("w2", "riv??")],
                                ["query_id", "pattern"])
    got = _rows(search_wildcard(idx, pdf, CFG))
    q_terms = expand_patterns(idx, pdf, "wildcard")
    want = _rows(topk(_scored_candidates(idx, q_terms, CFG, "bm25"), CFG.k))
    assert got == want and got


def test_search_regexp_runs_end_to_end(spark, setup):
    idx, _doc_toks, _vocab = setup
    pdf = spark.createDataFrame([("r1", "fish|river")], ["query_id", "pattern"])
    got = _rows(search_regexp(idx, pdf, CFG))
    assert got and all(r[0] == "r1" and r[1] >= 1 for r in got)


# ---------------------------------------------------------------------------
# LM-Dirichlet
# ---------------------------------------------------------------------------


def _lmd_brute(doc_toks: dict[int, list[str]], queries, mu: float, k: int):
    n = max(doc_toks) + 1
    dls = {d: len(toks) for d, toks in doc_toks.items()}
    total = (sum(dls.values()) / n) * n  # mirror avgdl*N arithmetic
    cf: dict[str, int] = {}
    tf: dict[tuple[int, str], int] = {}
    for d, toks in doc_toks.items():
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
            tf[(d, t)] = tf.get((d, t), 0) + 1
    out = []
    for qid, content in queries:
        qtoks = tokenize(content, do_stem=False)
        qtf: dict[str, int] = {}
        for t in qtoks:
            qtf[t] = qtf.get(t, 0) + 1
        scores: dict[int, float] = {}
        for d in doc_toks:
            s = 0.0
            hit = False
            for t, q in qtf.items():
                f = tf.get((d, t), 0)
                if f == 0 or t not in cf:
                    continue
                hit = True
                raw = math.log(1.0 + f / (mu * (cf[t] / total))) + math.log(
                    mu / (dls[d] + mu)
                )
                s += q * max(0.0, raw)
            if hit:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend((qid, i + 1, d, s) for i, (d, s) in enumerate(ranked))
    return sorted(out)


def test_lm_dirichlet_matches_brute_force(spark, setup):
    from fulltextsearch_spark.operators.query import search_lm_dirichlet

    idx, doc_toks, _vocab = setup
    queries = [("q1", "fish river fish"), ("q2", "salmon http page")]
    qdf = spark.createDataFrame(queries, ["query_id", "content"])
    got = _rows(search_lm_dirichlet(idx, qdf, CFG, mu=500.0, k=10))
    want = _lmd_brute(doc_toks, queries, mu=500.0, k=10)
    assert len(got) == len(want) and got
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert g[3] == pytest.approx(w[3], rel=1e-12)


def test_lm_dirichlet_clamp_keeps_scores_nonneg(spark, setup):
    from fulltextsearch_spark.operators.query import search_lm_dirichlet

    idx, _doc_toks, _vocab = setup
    qdf = spark.createDataFrame([("q", "the fish")], ["query_id", "content"])
    # tiny mu makes the dl normalizer dominate -> raw per-term scores go
    # negative for long docs; the clamp must keep totals >= 0
    rows = search_lm_dirichlet(idx, qdf, CFG, mu=1.0, k=10**6).collect()
    assert rows and all(r["score"] >= 0.0 for r in rows)


# ---------------------------------------------------------------------------
# field collapsing
# ---------------------------------------------------------------------------


def test_collapse_best_per_key_then_topk(spark, setup):
    from fulltextsearch_spark.operators.collapse import search_collapsed
    from fulltextsearch_spark.operators.query import search

    idx, _doc_toks, _vocab = setup
    qdf = spark.createDataFrame([("q1", "fish river"), ("q2", "salmon")],
                                ["query_id", "content"])
    keys = idx.doc_stats.select(
        "doc_id", (F.col("doc_id") % 7).cast("string").alias("key")
    )
    got = _rows(search_collapsed(idx, qdf, keys, CFG, k=5))
    # brute force from the uncollapsed full ranking
    full = search(idx, qdf, CFG, k=10**6).collect()
    by_q: dict[str, dict[str, tuple]] = {}
    for r in full:
        key = str(r["doc_id"] % 7)
        cur = by_q.setdefault(r["query_id"], {})
        cand = (-r["score"], r["doc_id"])
        if key not in cur or cand < cur[key]:
            cur[key] = cand
    want = []
    for qid, groups in by_q.items():
        best = sorted((negs, d, key) for key, (negs, d) in groups.items())[:5]
        want.extend(
            (qid, i + 1, key, d, -negs) for i, (negs, d, key) in enumerate(best)
        )
    assert got == sorted(want) and got
    # one row per (query, key)
    seen = {(q, key) for q, _, key, _, _ in got}
    assert len(seen) == len(got)


def test_collapse_drops_docs_without_key(spark, setup):
    from fulltextsearch_spark.operators.collapse import search_collapsed

    idx, _doc_toks, _vocab = setup
    qdf = spark.createDataFrame([("q", "fish")], ["query_id", "content"])
    keys = idx.doc_stats.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.lit("even").alias("key")
    )
    got = _rows(search_collapsed(idx, qdf, keys, CFG, k=10))
    assert len(got) == 1  # single key -> single collapsed row
    assert got[0][3] % 2 == 0


def test_required_literal_runs_conservative_subset():
    from fulltextsearch_spark.operators.multiterm import required_literal_runs as r

    assert r("luxur.*") == ["luxur"]
    assert r(".*ation") == ["ation"]
    assert r("conn..tion") == ["conn", "tion"]
    assert r("swim+ing") == ["swi", "ing"]  # quantified char dropped
    assert r("ho{1,2}ping") == ["ping"]
    assert r("word1[0-9]") == ["word1"]
    assert r("gen(er)?ous") == ["gen", "ous"]  # group contents never required
    assert r("(tion)?xyzw") == ["xyzw"]
    assert r("a|b") == [] and r("abc(d|e)fgh") == []  # alternation voids all
    assert r("x\\.yz") == []  # escaped chars break runs; leftovers < 3


def test_regexp_trigram_identical_to_plain_regexp(spark):
    """Trigram-prefiltered regexp == plain dictionary-scan regexp, on a mix
    of prefilterable and fallback patterns."""
    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.operators.index_build import build_index
    from fulltextsearch_spark.operators.multiterm import (
        build_term_trigrams,
        search_regexp,
        search_regexp_trigram,
    )
    from fulltextsearch_spark.sources.ingest import assign_dense_doc_ids
    from fulltextsearch_spark.sources.webpages import generate_webpages

    cfg = EngineConfig(k1=1.2, b=0.75, k=10, stem=False)
    corpus = assign_dense_doc_ids(
        generate_webpages(spark, 250, seed=13, num_partitions=3), order_col="url"
    )
    idx = build_index(spark, corpus, cfg, persist=False)
    tri = build_term_trigrams(idx)
    pats = spark.createDataFrame(
        [("p1", "luxur.*"), ("p2", "swim.*"), ("p2", "gener.*"),
         ("p3", "(cat|salmon)"), ("p4", "zz9qq.*")],
        ["query_id", "pattern"],
    )
    a = sorted(map(tuple, search_regexp_trigram(idx, tri, pats, cfg).collect()))
    b = sorted(map(tuple, search_regexp(idx, pats, cfg).collect()))
    assert a == b and a
    # the trigram map itself: every vocab term >= 3 chars appears
    vocab3 = idx.postings.select("term").where("length(term) >= 3").distinct().count()
    assert tri.select("term").distinct().count() == vocab3


def test_regexp_trigram_empty_patterns_returns_empty_frame(spark):
    """No patterns -> empty result frame with the standard result schema,
    mirroring search_regexp (documented result-identical), not an error."""
    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.operators.index_build import build_index
    from fulltextsearch_spark.operators.multiterm import (
        build_term_trigrams,
        search_regexp_trigram,
    )
    from fulltextsearch_spark.sources.ingest import assign_dense_doc_ids
    from fulltextsearch_spark.sources.webpages import generate_webpages

    cfg = EngineConfig(k1=1.2, b=0.75, k=10, stem=False)
    corpus = assign_dense_doc_ids(
        generate_webpages(spark, 40, seed=13, num_partitions=2), order_col="url"
    )
    idx = build_index(spark, corpus, cfg, persist=False)
    tri = build_term_trigrams(idx)
    pats = spark.createDataFrame([], "query_id string, pattern string")
    out = search_regexp_trigram(idx, tri, pats, cfg)
    assert out.columns == ["query_id", "rank", "doc_id", "score"]
    assert out.count() == 0
