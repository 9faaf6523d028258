"""Significant terms, decay function-score, percolator, term vectors,
search-after pagination, and rank evaluation — pinned against brute-force
recomputation on a small corpus.
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
    pdf = generate_webpages_pdf(120, seed=53)[["text"]]
    pdf.insert(0, "doc_id", range(len(pdf)))
    docs = spark.createDataFrame(pdf)
    idx = build_index(spark, docs, CFG, persist=False)
    doc_toks = {
        int(r["doc_id"]): tokenize(r["text"], do_stem=False) for r in docs.collect()
    }
    return idx, docs, doc_toks


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# significant terms (JLH)
# ---------------------------------------------------------------------------


def test_significant_terms_matches_brute_jlh(spark, setup):
    from fulltextsearch_spark.operators.significant import significant_terms

    idx, docs, doc_toks = setup
    queries = [("q1", "fish river"), ("q2", "salmon")]
    qdf = spark.createDataFrame(queries, ["query_id", "content"])
    n_fg, top_terms, min_dc = 15, 8, 2
    got = _rows(
        significant_terms(idx, docs, qdf, CFG, n_fg=n_fg, top_terms=top_terms,
                          min_doc_count=min_dc)
    )

    # brute force: fg set from the (already pinned) search path
    fg_rows = search(idx, qdf, CFG, k=n_fg).collect()
    fg: dict[str, set[int]] = {}
    for r in fg_rows:
        fg.setdefault(r["query_id"], set()).add(r["doc_id"])
    n_docs = max(doc_toks) + 1
    df_by_term: dict[str, int] = {}
    for toks in doc_toks.values():
        for t in set(toks):
            df_by_term[t] = df_by_term.get(t, 0) + 1
    want = []
    for qid, fgset in fg.items():
        fg_size = len(fgset)
        fg_count: dict[str, int] = {}
        for d in fgset:
            for t in set(doc_toks[d]):
                fg_count[t] = fg_count.get(t, 0) + 1
        scored = []
        for t, c in fg_count.items():
            if c < min_dc:
                continue
            fg_pct = c / fg_size
            bg_pct = df_by_term[t] / n_docs
            if fg_pct > bg_pct:
                scored.append((t, c, df_by_term[t],
                               (fg_pct - bg_pct) * (fg_pct / bg_pct)))
        ranked = sorted(scored, key=lambda x: (-x[3], x[0]))[:top_terms]
        want.extend(
            (qid, i + 1, t, c, bg, s) for i, (t, c, bg, s) in enumerate(ranked)
        )
    want = sorted(want)
    assert len(got) == len(want) and got
    for g, w in zip(got, want):
        assert g[:5] == w[:5]
        assert g[5] == pytest.approx(w[5], rel=1e-12)


# ---------------------------------------------------------------------------
# decay function score
# ---------------------------------------------------------------------------


def test_search_decay_matches_rescored_full_ranking(spark, setup):
    from fulltextsearch_spark.operators.functionscore import search_decay

    idx, _docs, doc_toks = setup
    qdf = spark.createDataFrame([("q1", "fish river"), ("q2", "salmon")],
                                ["query_id", "content"])
    values = idx.doc_stats.select(
        "doc_id", (F.col("doc_id") % 90).cast("double").alias("value")
    )
    origin, scale, decay, offset = 0.0, 30.0, 0.5, 5.0
    got = _rows(search_decay(idx, qdf, values, CFG, origin=origin, scale=scale,
                             decay=decay, offset=offset, k=10))

    full = search(idx, qdf, CFG, k=10**6).collect()
    lam = math.log(decay) / scale
    by_q: dict[str, list[tuple[float, int]]] = {}
    for r in full:
        age = float(r["doc_id"] % 90)
        mult = math.exp(lam * max(0.0, abs(age - origin) - offset))
        by_q.setdefault(r["query_id"], []).append((r["score"] * mult, r["doc_id"]))
    want = []
    for qid, lst in by_q.items():
        ranked = sorted(lst, key=lambda x: (-x[0], x[1]))[:10]
        want.extend((qid, i + 1, d, s) for i, (s, d) in enumerate(ranked))
    want = sorted(want)
    assert len(got) == len(want) and got
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert g[3] == pytest.approx(w[3], rel=1e-12)


def test_decay_multiplier_identity_at_origin(spark):
    from fulltextsearch_spark.operators.functionscore import decay_multiplier

    df = spark.range(1).select(
        decay_multiplier(F.lit(0.0), origin=0.0, scale=10.0, decay=0.5).alias("m0"),
        decay_multiplier(F.lit(10.0), origin=0.0, scale=10.0, decay=0.5).alias("m1"),
    )
    r = df.collect()[0]
    assert r["m0"] == pytest.approx(1.0)
    assert r["m1"] == pytest.approx(0.5)


def test_decay_rejects_bad_decay(spark):
    from fulltextsearch_spark.operators.functionscore import decay_multiplier

    with pytest.raises(ValueError):
        decay_multiplier(F.lit(0.0), decay=1.5)


# ---------------------------------------------------------------------------
# percolator
# ---------------------------------------------------------------------------


def test_percolate_boolean_and(spark, setup):
    from fulltextsearch_spark.operators.percolate import percolate

    _idx, docs, doc_toks = setup
    stored = [("s1", "fish river"), ("s2", "salmon"), ("s3", "fish nosuchterm")]
    sdf = spark.createDataFrame(stored, ["query_id", "content"])
    got = _rows(percolate(docs, sdf, CFG))
    want = []
    for qid, content in stored:
        qterms = set(tokenize(content, do_stem=False))
        for d, toks in doc_toks.items():
            hit = qterms & set(toks)
            if qterms and hit == qterms:
                want.append((qid, d, len(qterms)))
    assert got == sorted(want)
    assert not any(q == "s3" for q, _, _ in got)  # unmatched term -> no docs


def test_percolate_min_match_relaxation(spark, setup):
    from fulltextsearch_spark.operators.percolate import percolate

    _idx, docs, doc_toks = setup
    sdf = spark.createDataFrame([("s", "fish river salmon")], ["query_id", "content"])
    got = _rows(percolate(docs, sdf, CFG, min_match=2))
    qterms = set(tokenize("fish river salmon", do_stem=False))
    want = sorted(
        ("s", d, len(qterms & set(toks)))
        for d, toks in doc_toks.items()
        if len(qterms & set(toks)) >= 2
    )
    assert got == want and got


# ---------------------------------------------------------------------------
# term vectors
# ---------------------------------------------------------------------------


def test_term_vectors_match_brute_stats(spark, setup):
    from fulltextsearch_spark.operators.termvectors import term_vectors

    idx, docs, doc_toks = setup
    ids = [3, 17, 42]
    got = _rows(term_vectors(idx, docs, spark.createDataFrame([(i,) for i in ids],
                                                              ["doc_id"]), CFG))
    df_by_term: dict[str, int] = {}
    ttf_by_term: dict[str, int] = {}
    for toks in doc_toks.values():
        for t in set(toks):
            df_by_term[t] = df_by_term.get(t, 0) + 1
        for t in toks:
            ttf_by_term[t] = ttf_by_term.get(t, 0) + 1
    want = []
    for d in ids:
        toks = doc_toks[d]
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        want.extend(
            (d, t, c, len(toks), df_by_term[t], ttf_by_term[t]) for t, c in tf.items()
        )
    assert got == sorted(want) and got


# ---------------------------------------------------------------------------
# search_after pagination
# ---------------------------------------------------------------------------


def test_search_after_pages_tile_the_full_ranking(spark, setup):
    from fulltextsearch_spark.operators.paging import page_cursor, search_after

    idx, _docs, _doc_toks = setup
    qdf = spark.createDataFrame([("q1", "fish river"), ("q2", "salmon http")],
                                ["query_id", "content"])
    k = 7
    page1 = search_after(idx, qdf, None, CFG, k=k)
    page2 = search_after(idx, qdf, page_cursor(page1), CFG, k=k)
    p1, p2 = _rows(page1), _rows(page2)
    # pages concatenated == global top-2k with ranks rebased
    full = _rows(search(idx, qdf, CFG, k=2 * k))
    tiled = sorted(p1 + [(q, r + k, d, s) for q, r, d, s in p2])
    assert tiled == full and p2
    # disjoint doc sets per query
    assert not ({(q, d) for q, _, d, _ in p1} & {(q, d) for q, _, d, _ in p2})


def test_search_after_missing_cursor_gives_first_page(spark, setup):
    from fulltextsearch_spark.operators.paging import search_after

    idx, _docs, _doc_toks = setup
    qdf = spark.createDataFrame([("q1", "fish")], ["query_id", "content"])
    cursor = spark.createDataFrame(
        [("qOTHER", 1e9, -1)], ["query_id", "after_score", "after_doc_id"]
    )
    got = _rows(search_after(idx, qdf, cursor, CFG, k=5))
    want = _rows(search(idx, qdf, CFG, k=5))
    assert got == want and got


# ---------------------------------------------------------------------------
# rank evaluation
# ---------------------------------------------------------------------------


def _brute_eval(run, qrels, k):
    rel = {(q, d): r for q, d, r in qrels}
    by_q: dict[str, list[tuple[int, int]]] = {}
    for q, rank, d in run:
        if rank <= k:
            by_q.setdefault(q, []).append((rank, d))
    out = []
    for q, hits in by_q.items():
        dcg = sum(
            (2.0 ** rel.get((q, d), 0) - 1.0) / math.log2(rank + 1.0)
            for rank, d in hits
        )
        ideal = sorted(
            ((r, d) for (qq, d), r in rel.items() if qq == q and r > 0),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        idcg = sum(
            (2.0 ** r - 1.0) / math.log2(i + 2.0) for i, (r, _) in enumerate(ideal)
        )
        first = min((rank for rank, d in hits if rel.get((q, d), 0) > 0), default=None)
        out.append(
            (
                q,
                dcg / idcg if idcg > 0 else 0.0,
                1.0 / first if first else 0.0,
                sum(1 for rank, d in hits if rel.get((q, d), 0) > 0) / k,
            )
        )
    return sorted(out)


def test_rank_eval_matches_brute_metrics(spark):
    from fulltextsearch_spark.operators.rankeval import rank_eval

    run = [
        ("q1", 1, 10), ("q1", 2, 11), ("q1", 3, 12), ("q1", 4, 13),
        ("q2", 1, 20), ("q2", 2, 21), ("q2", 3, 22),
        ("q3", 1, 30), ("q3", 2, 31),
    ]
    qrels = [
        ("q1", 11, 2), ("q1", 13, 1), ("q1", 99, 3),   # judged doc missing from run
        ("q2", 20, 1),
        # q3 has no relevant docs at all
        ("q3", 30, 0),
    ]
    k = 4
    got = _rows(
        rank_eval(
            spark.createDataFrame(run, ["query_id", "rank", "doc_id"]),
            spark.createDataFrame(qrels, ["query_id", "doc_id", "rel"]),
            k=k,
        )
    )
    want = _brute_eval(run, qrels, k)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0]
        for i in (1, 2, 3):
            assert g[i] == pytest.approx(w[i], rel=1e-12), (g, w)


def test_rank_eval_perfect_run_scores_one(spark):
    from fulltextsearch_spark.operators.rankeval import rank_eval

    run = [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)]
    qrels = [("q", 1, 3), ("q", 2, 2), ("q", 3, 1)]
    got = rank_eval(
        spark.createDataFrame(run, ["query_id", "rank", "doc_id"]),
        spark.createDataFrame(qrels, ["query_id", "doc_id", "rel"]),
        k=3,
    ).collect()[0]
    assert got["ndcg"] == pytest.approx(1.0)
    assert got["mrr"] == pytest.approx(1.0)
    assert got["precision"] == pytest.approx(1.0)
