"""Positional index + exact phrase search."""

from __future__ import annotations

import pytest

from fulltextsearch_spark.operators.positional import (
    build_positional_index,
    load_positional_index,
    phrase_occurrences,
    phrase_topk,
    save_positional_index,
)
from fulltextsearch_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="test-positional", master="local[2]", shuffle_partitions=2)
    yield s


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(
        [
            (0, "cat salmon fresh cat salmon stale"),
            (1, "salmon cat fresh"),
            (2, "cat alone swims fresh water"),
            # stop words vanish from the position stream: "cat of the
            # salmon" indexes as consecutive (cat, salmon)
            (3, "cat of the salmon fresh"),
            (4, "cat salmon cat salmon cat salmon"),
        ],
        ["doc_id", "text"],
    )
    return build_positional_index(docs)


def _occ(index, spark, phrase):
    q = spark.createDataFrame([("q", phrase)], ["query_id", "content"])
    return {r["doc_id"]: r["n_occ"] for r in phrase_occurrences(index, q).collect()}


def test_postings_positions(index):
    rows = {
        (r["term"], r["doc_id"]): list(r["positions"])
        for r in index.postings.collect()
    }
    assert rows[("cat", 0)] == [0, 3]
    assert rows[("salmon", 4)] == [1, 3, 5]
    assert ("of", 3) not in rows and ("the", 3) not in rows  # stop words
    assert rows[("salmon", 3)] == [1]  # position counts surviving tokens
    assert index.n_docs == 5 and index.doc_stats.count() == 5


def test_phrase_occurrences_exact_adjacency(index, spark):
    occ = _occ(index, spark, "cat salmon")
    # doc 1 has both terms but reversed; doc 2 lacks salmon
    assert occ == {0: 2, 3: 1, 4: 3}


def test_phrase_longer_and_single_term(index, spark):
    # doc 3's surviving stream is (cat, salmon, fresh) — stop words gone
    assert _occ(index, spark, "cat salmon fresh") == {0: 1, 3: 1}
    assert _occ(index, spark, "salmon") == {0: 2, 1: 1, 3: 1, 4: 3}  # tf


def test_phrase_with_stop_words_matches_surviving_stream(index, spark):
    # query-side stop removal mirrors the index side
    assert _occ(index, spark, "cat of the salmon") == _occ(index, spark, "cat salmon")


def test_duplicate_token_phrase(index, spark):
    occ = _occ(index, spark, "cat salmon cat")
    # doc 0 breaks at pos 2 ("fresh"); doc 4's overlapping starts 0 and 2
    # both count
    assert occ == {4: 2}


def test_unseen_term_and_all_stop_phrase(index, spark):
    assert _occ(index, spark, "cat zebra") == {}
    assert _occ(index, spark, "the of and") == {}


def test_phrase_topk_scores_and_ranks(index, spark):
    q = spark.createDataFrame(
        [("q1", "cat salmon"), ("q2", "zebra")], ["query_id", "content"]
    )
    rows = phrase_topk(index, q, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert "q2" not in by_q
    got = [(r["rank"], r["doc_id"]) for r in by_q["q1"]]
    # doc 4 (3 occurrences, dl 6) outranks doc 0 (2 occ, dl 6) outranks
    # doc 3 (1 occ, dl 3); ranks dense from 1
    assert got == [(1, 4), (2, 0), (3, 3)]
    scores = [r["score"] for r in by_q["q1"]]
    assert scores == sorted(scores, reverse=True) and scores[0] > 0


def test_save_load_round_trip(index, spark, tmp_path):
    root = str(tmp_path / "pidx")
    save_positional_index(index, root)
    loaded = load_positional_index(spark, root)
    assert (loaded.n_docs, loaded.stem) == (index.n_docs, index.stem)
    assert abs(loaded.avgdl - index.avgdl) < 1e-12
    q = spark.createDataFrame([("q", "cat salmon")], ["query_id", "content"])
    a = sorted(map(tuple, phrase_topk(index, q, k=5).collect()))
    b = sorted(map(tuple, phrase_topk(loaded, q, k=5).collect()))
    assert a == b


def _prox(index, spark, phrase, window):
    from fulltextsearch_spark.operators.positional import proximity_occurrences

    q = spark.createDataFrame([("q", phrase)], ["query_id", "content"])
    return {
        r["doc_id"]: r["n_windows"]
        for r in proximity_occurrences(index, q, window).collect()
    }


def test_proximity_window_semantics(index, spark):
    # doc 0 stream: cat0 salmon1 fresh2 cat3 salmon4 stale5
    assert _prox(index, spark, "fresh stale", 4) == {0: 1}  # anchor 2 only
    assert _prox(index, spark, "fresh stale", 3) == {}  # span is 4
    # unordered: "stale fresh" behaves identically
    assert _prox(index, spark, "stale fresh", 4) == {0: 1}


def test_proximity_counts_anchors(index, spark):
    got = _prox(index, spark, "cat fresh", 4)
    # doc 0 anchors 0 and 2; docs 1-3 one anchor each; doc 4 lacks fresh
    assert got == {0: 2, 1: 1, 2: 1, 3: 1}
    # query-term multiplicity is set semantics
    assert _prox(index, spark, "cat cat fresh", 4) == got


def test_proximity_topk_ranks(index, spark):
    from fulltextsearch_spark.operators.positional import proximity_topk

    q = spark.createDataFrame([("q1", "cat fresh")], ["query_id", "content"])
    rows = proximity_topk(index, q, window=4, k=10).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]
    # doc 0: tf=2 windows beats the shorter tf=1 docs under BM25
    assert rows[0]["doc_id"] == 0
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_best_snippets_brute_force(index, spark):
    from fulltextsearch_spark.functions.tokenizer import tokenize
    from fulltextsearch_spark.operators.positional import best_snippets

    texts = {
        0: "cat salmon fresh cat salmon stale",
        1: "salmon cat fresh",
        2: "cat alone swims fresh water",
        3: "cat of the salmon fresh",
        4: "cat salmon cat salmon cat salmon",
    }
    streams = {d: tokenize(t, do_stem=False) for d, t in texts.items()}
    queries = [("s1", "cat salmon"), ("s2", "fresh water")]
    qdf = spark.createDataFrame(queries, ["query_id", "content"])
    pairs = spark.createDataFrame(
        [(q, d) for q, _ in queries for d in texts], ["query_id", "doc_id"]
    )
    W = 3
    got = {
        (r["query_id"], r["doc_id"]): (r["snip_start"], r["n_terms"], r["n_hits"])
        for r in best_snippets(index, qdf, pairs, window=W).collect()
    }

    def brute(stream, terms):
        best = None
        for a in (i for i, t in enumerate(stream) if t in terms):
            win = stream[a : a + W]
            nt = len(set(win) & terms)
            nh = sum(1 for t in win if t in terms)
            key = (-nt, -nh, a)
            if best is None or key < best[0]:
                best = (key, (a, nt, nh))
        return best[1] if best else None

    want = {}
    for qid, content in queries:
        terms = set(tokenize(content, do_stem=False))
        for d, stream in streams.items():
            b = brute(stream, terms)
            if b is not None:
                want[(qid, d)] = b
    assert got == want
    # spot values: doc 4 "cat salmon cat salmon cat salmon", W=3 covers both
    # terms with 3 hits from start 0
    assert got[("s1", 4)] == (0, 2, 3)
    # doc 2 has no salmon: single-term snippet at first cat
    assert got[("s1", 2)] == (0, 1, 1)


def test_span_first_occurrences_and_rank(index, spark):
    from fulltextsearch_spark.operators.positional import (
        span_first_occurrences,
        span_first_topk,
    )

    # surviving positions: doc0 = cat(0) salmon(1) fresh(2) cat(3) salmon(4)
    # stale(5); doc3 = cat(0) salmon(1) fresh(2) (stop words dropped).
    spans = spark.createDataFrame(
        [("a", "salmon", 2), ("b", "salmon", 5), ("c", "fresh", 1)],
        ["query_id", "term", "end"],
    )
    occ = {
        (r["query_id"], r["doc_id"]): r["n_occ"]
        for r in span_first_occurrences(index, spans).collect()
    }
    # 'salmon' strictly before position 2 -> docs 0 (pos1), 1 (pos0),
    # 3 (pos1), 4 (pos1); doc2 has no salmon.
    assert occ[("a", 0)] == 1 and occ[("a", 1)] == 1
    assert occ[("a", 3)] == 1 and occ[("a", 4)] == 1
    assert ("a", 2) not in occ
    # wider window counts MULTIPLE qualifying occurrences
    assert occ[("b", 0)] == 2  # positions 1 and 4
    assert occ[("b", 4)] == 2  # positions 1 and 3
    # 'fresh' never opens a doc -> clause c matches nothing
    assert not any(q == "c" for q, _ in occ)

    ranked = span_first_topk(index, spans, k=3).collect()
    by_q: dict = {}
    for r in ranked:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    # rank 1 for query b goes to a double-occurrence doc (higher tf),
    # doc_id tie-break picks doc 0 over doc 4.
    assert sorted(by_q["b"])[0] == (1, 0)
    assert len(by_q["a"]) == 3


def test_sdm_matches_python_replay(spark):
    """SDM vs a full Python replay: unigram + ordered + unordered-window
    Dirichlet features, collection frequencies, zero-cf drops, zero-tf
    smoothing, identical-term pairs, lambda weighting, tiebreak."""
    import math
    from collections import Counter, defaultdict

    from fulltextsearch_spark.functions.tokenizer import tokenize
    from fulltextsearch_spark.operators.positional import (
        build_positional_index,
        search_sdm,
    )

    rows = [
        (0, "alpha beta gamma delta alpha beta"),
        (1, "alpha delta beta gamma alpha"),
        (2, "alpha alpha alpha zeta"),
        (3, "beta gamma epsilon epsilon beta"),
        (4, "unrelated words here alpha"),
        (5, ""),
    ]
    LAM, MU, W, K = (0.7, 0.2, 0.1), 500.0, 4, 5
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    idx = build_positional_index(docs)
    qs = [("q1", "alpha beta"), ("q2", "beta gamma epsilon"),
          ("q3", "alpha alpha"), ("q4", "zzz missing")]
    qdf = spark.createDataFrame(qs, ["query_id", "content"])
    got = {}
    for r in search_sdm(idx, qdf, lambdas=LAM, mu=MU, window=W, k=K).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9))
        )

    toks = {d: tokenize(t, do_stem=False) for d, t in rows}
    dl = {d: len(t) for d, t in toks.items()}
    C = sum(dl.values())  # == avgdl * n_docs by construction
    cf = Counter()
    for t in toks.values():
        cf.update(t)

    def positions(d, t):
        return [i for i, x in enumerate(toks[d]) if x == t]

    def od_count(d, a, b):
        pb = set(positions(d, b))
        return sum(1 for p in positions(d, a) if p + 1 in pb)

    def ud_count(d, a, b):
        pb = positions(d, b)
        return sum(
            1 for p in positions(d, a) for q2 in pb if q2 != p and abs(q2 - p) < W
        )

    for qid, content in qs:
        q = tokenize(content, do_stem=False)
        cands = sorted({d for d in toks for t in set(q) if t in toks[d]} )
        cands = [d for d in cands if any(t in toks[d] for t in q)]
        if not any(cf[t] for t in q):
            assert qid not in got
            continue
        prs = list(zip(q, q[1:]))
        cfo = {i: sum(od_count(d, a, b) for d in toks) for i, (a, b) in enumerate(prs)}
        cfu = {i: sum(ud_count(d, a, b) for d in toks) for i, (a, b) in enumerate(prs)}
        scores = {}
        for d in cands:
            st = sum(
                math.log((toks[d].count(t) + MU * cf[t] / C) / (dl[d] + MU))
                for t in q if cf[t] > 0
            )
            so = sum(
                math.log((od_count(d, a, b) + MU * cfo[i] / C) / (dl[d] + MU))
                for i, (a, b) in enumerate(prs) if cfo[i] > 0
            )
            su = sum(
                math.log((ud_count(d, a, b) + MU * cfu[i] / C) / (dl[d] + MU))
                for i, (a, b) in enumerate(prs) if cfu[i] > 0
            )
            scores[d] = LAM[0] * st + LAM[1] * so + LAM[2] * su
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
        have = sorted(got.get(qid, []))
        assert [d for _, d, _ in have] == [d for d, _ in want], qid
        for (rk, d, s), (wd, ws) in zip(have, want):
            assert abs(s - ws) < 1e-6, (qid, d)
