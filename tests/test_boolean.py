"""Boolean-AND (conjunctive / minimum-should-match) and metadata-filtered
search semantics, pinned against brute-force recomputation on a small corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fulltextsearch_spark.config import EngineConfig
from fulltextsearch_spark.functions.tokenizer import tokenize
from fulltextsearch_spark.operators.index_build import build_index
from fulltextsearch_spark.operators.query import (
    search,
    search_conjunctive,
    search_filtered,
)
from fulltextsearch_spark.sources.webpages import generate_webpages_pdf

CFG = EngineConfig(k1=1.2, b=0.75, k=10, stem=False)
# 'marker7' is unique to doc 7; head terms co-occur broadly.
QUERIES = [
    ("q_and", "http page marker7"),
    ("q_two", "salmon river"),
    ("q_oov", "salmon zzznotaterm"),
    ("q_one", "fish"),
]


@pytest.fixture(scope="module")
def setup(spark):
    pdf = generate_webpages_pdf(150, seed=91)[["text"]]
    pdf.insert(0, "doc_id", range(len(pdf)))
    docs = spark.createDataFrame(pdf)
    idx = build_index(spark, docs, CFG, persist=False)
    qdf = spark.createDataFrame(QUERIES, ["query_id", "content"])
    token_sets = {
        qid: set(tokenize(content, do_stem=False)) for qid, content in QUERIES
    }
    doc_tokens = {
        int(r["doc_id"]): set(tokenize(r["text"], do_stem=False))
        for r in docs.collect()
    }
    return idx, qdf, token_sets, doc_tokens


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_conjunctive_is_or_intersected(spark, setup):
    idx, qdf, token_sets, doc_tokens = setup
    base = {(r[0], r[2]): r[3] for r in _rows(search(idx, qdf, CFG, k=10**6))}
    got = _rows(search_conjunctive(idx, qdf, CFG, k=10**6))
    # every result doc contains ALL query terms, with the OR path's score
    for qid, _rank, doc_id, score in got:
        assert token_sets[qid] <= doc_tokens[doc_id]
        assert score == pytest.approx(base[(qid, doc_id)])
    # and every all-terms doc is present
    want = {
        (qid, d)
        for qid in token_sets
        for d, toks in doc_tokens.items()
        if token_sets[qid] <= toks
    }
    assert {(q, d) for q, _, d, _ in got} == want


def test_conjunctive_oov_term_empty(spark, setup):
    idx, qdf, _, _ = setup
    got = _rows(search_conjunctive(idx, qdf, CFG))
    assert not [r for r in got if r[0] == "q_oov"]  # AND with OOV -> empty
    assert [r for r in got if r[0] == "q_one"]  # single-term query unaffected


def test_min_match_relaxation(spark, setup):
    idx, qdf, token_sets, doc_tokens = setup
    got = _rows(search_conjunctive(idx, qdf, CFG, k=10**6, min_match=2))
    for qid, _rank, doc_id, _s in got:
        assert len(token_sets[qid] & doc_tokens[doc_id]) >= min(2, len(token_sets[qid]))
    # q_oov now returns docs matching the 2 real... only 1 real term exists,
    # so min_match=2 still requires 2 distinct matched terms -> empty
    assert not [r for r in got if r[0] == "q_oov"]
    # min_match=1 == plain OR candidates
    or_docs = {(r[0], r[2]) for r in _rows(search(idx, qdf, CFG, k=10**6))}
    mm1 = {(r[0], r[2]) for r in _rows(search_conjunctive(idx, qdf, CFG, k=10**6, min_match=1))}
    assert mm1 == or_docs


def test_filtered_is_topk_among_allowed(spark, setup):
    idx, qdf, _, _ = setup
    allowed = idx.doc_stats.filter(F.col("dl") >= 60)
    allowed_ids = {int(r["doc_id"]) for r in allowed.collect()}
    got = _rows(search_filtered(idx, qdf, allowed, CFG))
    assert got and all(d in allowed_ids for _, _, d, _ in got)
    # equals brute force: filter ALL candidates, then rank
    full = _rows(search(idx, qdf, CFG, k=10**6))
    by_q: dict[str, list] = {}
    for qid, _rank, d, s in full:
        if d in allowed_ids:
            by_q.setdefault(qid, []).append((-s, d))
    want = []
    for qid, lst in by_q.items():
        for i, (negs, d) in enumerate(sorted(lst)[: CFG.k], start=1):
            want.append((qid, i, d, -negs))
    assert sorted(got) == sorted(want)
    # and differs from a naive post-filter whenever high ranks were excluded
    assert got != [r for r in full if r[2] in allowed_ids][: len(got)]


# ---------------------------------------------------------------------------
# Query-time synonym expansion
# ---------------------------------------------------------------------------


def test_expand_query_terms_weights_and_merge(spark):
    from fulltextsearch_spark.operators.query import expand_query_terms

    q_terms = spark.createDataFrame(
        [("q", "a", 2), ("q", "b", 1)], ["query_id", "term", "qtf"]
    )
    syn = spark.createDataFrame(
        # a->b merges with original b (1.0 + 2*0.5); a->c is pure expansion
        [("a", "b"), ("a", "c")],
        ["term", "syn"],
    )
    rows = expand_query_terms(q_terms, syn, weight=0.5).collect()
    got = {r["term"]: r["qtf"] for r in rows}
    assert got == {"a": 2.0, "b": 2.0, "c": 1.0}


def test_search_expanded_matches_manual_requery(spark, setup):
    """Expansion at weight w must equal a plain search whose query carries the
    synonym terms with qtf scaled by w — pinned via score equality."""
    from fulltextsearch_spark.operators.query import (
        _scored_candidates,
        query_terms,
        search_expanded,
        topk,
    )

    idx, qdf, _, _ = setup
    syn = spark.createDataFrame([("salmon", "fish"), ("river", "page")], ["term", "syn"])
    got = search_expanded(idx, qdf, syn, CFG, weight=0.25).collect()

    base = query_terms(qdf, stem=False)
    manual = base.select(
        "query_id", "term", F.col("qtf").cast("double").alias("qtf")
    ).unionByName(
        base.join(syn, "term").select(
            "query_id", F.col("syn").alias("term"), (F.col("qtf") * 0.25).alias("qtf")
        )
    ).groupBy("query_id", "term").agg(F.sum("qtf").alias("qtf"))
    want = topk(_scored_candidates(idx, manual, CFG, "bm25"), CFG.k).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert {key(r): (r["doc_id"], round(r["score"], 9)) for r in got} == {
        key(r): (r["doc_id"], round(r["score"], 9)) for r in want
    }


def test_search_expanded_zero_weight_is_plain_search(spark, setup):
    from fulltextsearch_spark.operators.query import search_expanded

    idx, qdf, _, _ = setup
    syn = spark.createDataFrame([("salmon", "fish")], ["term", "syn"])
    got = search_expanded(idx, qdf, syn, CFG, weight=0.0).collect()
    want = search(idx, qdf, CFG).collect()
    as_map = lambda rows: {  # noqa: E731
        (r["query_id"], r["rank"]): r["doc_id"] for r in rows
    }
    assert as_map(got) == as_map(want)


def test_explain_scores_sum_to_ranked_score(spark, setup):
    """Per-(query, doc) sums of explain() term contributions must equal the
    search path's ranked scores exactly; rows exist only for top-k docs."""
    from fulltextsearch_spark.operators.query import explain_scores

    idx, qdf, _, _ = setup
    ranked = {(r["query_id"], r["doc_id"]): r["score"]
              for r in search(idx, qdf, CFG, k=3).collect()}
    exp = explain_scores(idx, qdf, CFG, k=3).collect()
    sums: dict = {}
    for r in exp:
        key = (r["query_id"], r["doc_id"])
        sums[key] = sums.get(key, 0.0) + r["term_score"]
    assert set(sums) == set(ranked)
    for key, s in sums.items():
        assert s == pytest.approx(ranked[key], rel=1e-12)
    # raw inputs are positive and qtf carries query-token multiplicity
    assert all(r["tf"] >= 1 and r["df"] >= 1 and r["dl"] >= 1 and r["qtf"] >= 1
               for r in exp)


def test_search_rm3_expands_beyond_original_terms(spark):
    """RM3: the feedback pass retrieves a doc sharing NO term with the
    original query (reached only through expansion terms from the top
    feedback docs), and the integer feedback-term selection is replayed
    exactly by a Python reference."""
    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.functions.tokenizer import tokenize
    from fulltextsearch_spark.operators.index_build import build_index
    from fulltextsearch_spark.operators.query import search_rm3

    rows = [
        # 'anchor' docs couple the query term with expansion vocabulary
        (0, "kernel kernel scheduler preempt latency"),
        (1, "kernel scheduler preempt throughput"),
        (2, "kernel preempt scheduler"),
        # doc 3: NO 'kernel' — reachable only via expanded terms
        (3, "scheduler preempt latency latency"),
        # distractors
        (4, "garden flowers bloom spring"),
        (5, "recipe butter flour sugar"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    cfg = EngineConfig(k1=1.2, b=0.75, k=6, stem=False)
    idx = build_index(spark, docs, cfg, persist=False)
    queries = spark.createDataFrame([("q", "kernel")], ["query_id", "content"])
    got = search_rm3(
        idx, queries, docs, cfg, fb_docs=3, fb_terms=4, alpha=0.5, k=6
    ).collect()
    ranked = [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert 3 in ranked  # expansion reached it; plain BM25 never would
    assert 4 not in ranked and 5 not in ranked
    # replay the FP-free feedback-term selection
    fb = ranked_first = None
    from fulltextsearch_spark.operators.query import (
        _scored_candidates,
        query_terms,
        topk,
    )

    first = topk(_scored_candidates(idx, query_terms(queries, stem=False), cfg, "bm25"), 3)
    fb_ids = [r["doc_id"] for r in first.collect()]
    counts: dict = {}
    for d in fb_ids:
        for t in tokenize(rows[d][1], do_stem=False):
            counts[t] = counts.get(t, 0) + 1
    sel = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert set(t for t, _ in sel) >= {"scheduler", "preempt"}


def test_clarity_focused_beats_diffuse(spark):
    """Clarity: a query whose results use focused vocabulary scores higher
    than one retrieving collection-typical docs; values match a Python
    replay of the KL formula."""
    import math

    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.functions.tokenizer import tokenize
    from fulltextsearch_spark.operators.index_build import build_index
    from fulltextsearch_spark.operators.query import clarity_scores

    common = "data table row value scan merge sort hash"
    rows = [(i, common) for i in range(8)]
    rows += [(8, "zyzzyva quagga axolotl zyzzyva"), (9, "zyzzyva quagga wombat")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    cfg = EngineConfig(k1=1.2, b=0.75, k=5, stem=False)
    idx = build_index(spark, docs, cfg, persist=False)
    qs = spark.createDataFrame(
        [("focused", "zyzzyva"), ("diffuse", "table")], ["query_id", "content"]
    )
    got = {
        r["query_id"]: (r["n_fb_terms"], r["clarity"])
        for r in clarity_scores(idx, qs, docs, cfg, fb_docs=5).collect()
    }
    assert got["focused"][1] > got["diffuse"][1] > -1e-9

    # python replay for the focused query: fb docs = the 2 zyzzyva docs
    toks = {d: tokenize(t, do_stem=False) for d, t in rows}
    coll: dict = {}
    for ts in toks.values():
        for t in ts:
            coll[t] = coll.get(t, 0) + 1
    ct = sum(coll.values())
    fb = [8, 9]
    pwq: dict = {}
    for d in fb:
        dl = len(toks[d])
        for t in toks[d]:
            pwq[t] = pwq.get(t, 0.0) + (1.0 / dl) / len(fb)
    exp = sum(p * math.log2(p / (coll[t] / ct)) for t, p in pwq.items())
    assert got["focused"] == (len(pwq), pytest.approx(exp, rel=1e-9))
