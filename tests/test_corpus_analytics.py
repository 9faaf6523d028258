"""Corpus-analytics operators — bigram-LM perplexity, vocabulary stats, and
the ES top_hits / rare_terms / adjacency_matrix aggregations — pinned against
brute-force Python recomputation.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fulltextsearch_spark.functions.tokenizer import tokenize
from fulltextsearch_spark.operators.facets import adjacency_matrix, rare_terms, top_hits
from fulltextsearch_spark.operators.textstats import bigram_lm_scores, vocab_stats
from fulltextsearch_spark.sources.webpages import generate_webpages_pdf


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = generate_webpages_pdf(80, seed=17)[["text"]]
    pdf.insert(0, "doc_id", range(len(pdf)))
    # Edge docs: empty text and a single-token text (no bigrams).
    pdf.loc[len(pdf)] = [len(pdf), ""]
    pdf.loc[len(pdf)] = [len(pdf), "solitary"]
    docs = spark.createDataFrame(pdf)
    toks = {int(r["doc_id"]): tokenize(r["text"], do_stem=False) for r in docs.collect()}
    return docs, toks


def test_bigram_lm_scores_match_brute(spark, corpus):
    docs, toks = corpus
    alpha = 0.5
    bigc: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    vocab = set()
    for ts in toks.values():
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            bigc[(a, b)] = bigc.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    v = len(vocab)

    got = {
        int(r["doc_id"]): (int(r["n_bigrams"]), r["cross_entropy"], r["ppl"])
        for r in bigram_lm_scores(docs, alpha=alpha, stem=False).collect()
    }
    assert set(got) == set(toks)
    for d, ts in toks.items():
        n_big = max(len(ts) - 1, 0)
        assert got[d][0] == n_big
        if n_big == 0:
            assert got[d][1] == 0.0 and got[d][2] == 1.0
            continue
        h = -sum(
            math.log2((bigc[(a, b)] + alpha) / (ctx[a] + alpha * v))
            for a, b in zip(ts, ts[1:])
        ) / n_big
        assert got[d][1] == pytest.approx(round(h, 4), abs=2e-4)
        assert got[d][2] == pytest.approx(round(2.0 ** h, 4), rel=1e-4)


def test_vocab_stats_match_brute(spark, corpus):
    docs, toks = corpus
    freq: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            freq[t] = freq.get(t, 0) + 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(f) for _, f in ranked]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )

    row = vocab_stats(docs, stem=False).collect()[0]
    assert row["n_tokens"] == sum(freq.values())
    assert row["n_types"] == len(freq)
    assert row["hapax"] == sum(1 for f in freq.values() if f == 1)
    assert row["dis"] == sum(1 for f in freq.values() if f == 2)
    assert row["top_share"] == pytest.approx(
        round(max(freq.values()) / sum(freq.values()), 6), abs=2e-6
    )
    assert row["zipf_slope"] == pytest.approx(round(slope, 4), abs=2e-4)
    # Natural-ish text: the fitted exponent is negative and Zipf-ordered.
    assert row["zipf_slope"] < -0.3


def test_top_hits_buckets(spark):
    scored = spark.createDataFrame(
        [
            ("q1", 0, 3.0), ("q1", 1, 2.0), ("q1", 2, 5.0), ("q1", 3, 5.0),
            ("q2", 0, 1.0), ("q2", 2, 4.0),
        ],
        ["query_id", "doc_id", "score"],
    )
    meta = spark.createDataFrame(
        [(0, "en"), (1, "en"), (2, "de"), (3, "de")], ["doc_id", "lang"]
    )
    out = {
        (r["query_id"], r["lang"], r["bucket_rank"]): (r["doc_id"], r["score"])
        for r in top_hits(scored, meta, "lang", n_per_bucket=2).collect()
    }
    # Tie at 5.0 in (q1, de): doc_id asc breaks it.
    assert out[("q1", "de", 1)] == (2, 5.0)
    assert out[("q1", "de", 2)] == (3, 5.0)
    assert out[("q1", "en", 1)] == (0, 3.0)
    assert out[("q1", "en", 2)] == (1, 2.0)
    assert out[("q2", "en", 1)] == (0, 1.0)
    assert out[("q2", "de", 1)] == (2, 4.0)
    assert len(out) == 6


def test_rare_terms_threshold(spark):
    dft = spark.createDataFrame(
        [("a", 1), ("b", 5), ("c", 6), ("d", 100)], ["term", "df"]
    )
    # ceil(0.05 * 100) = 5 -> a, b qualify.
    got = sorted(r["term"] for r in rare_terms(dft, 100, max_share=0.05).collect())
    assert got == ["a", "b"]


def test_adjacency_matrix_counts(spark):
    tf = spark.createDataFrame(
        [
            (0, "join", 2), (0, "filter", 1),
            (1, "join", 1),
            (2, "filter", 3), (2, "spark", 1),
            (3, "spark", 1), (3, "join", 4), (3, "filter", 1),
        ],
        ["doc_id", "term", "tf"],
    )
    got = {
        (r["key1"], r["key2"]): r["doc_count"]
        for r in adjacency_matrix(tf, {"A": "join", "B": "filter", "C": "spark"}).collect()
    }
    assert got == {
        ("A", "A"): 3,  # docs 0, 1, 3
        ("B", "B"): 3,  # docs 0, 2, 3
        ("C", "C"): 2,  # docs 2, 3
        ("A", "B"): 2,  # docs 0, 3
        ("A", "C"): 1,  # doc 3
        ("B", "C"): 2,  # docs 2, 3
    }


def test_composite_agg_pagination(spark):
    from fulltextsearch_spark.operators.facets import composite_agg

    df = spark.createDataFrame(
        [("de", "s1"), ("de", "s1"), ("de", "s2"), ("en", "s1"),
         ("en", "s3"), ("fr", "s1")],
        ["lang", "source"],
    )
    page1 = [tuple(r) for r in composite_agg(df, ["lang", "source"], 2).collect()]
    assert page1 == [("de", "s1", 2), ("de", "s2", 1)]
    # after-key = last bucket of page 1 -> page 2 starts strictly after it
    page2 = [
        tuple(r)
        for r in composite_agg(df, ["lang", "source"], 2, after=("de", "s2")).collect()
    ]
    assert page2 == [("en", "s1", 1), ("en", "s3", 1)]
    page3 = [
        tuple(r)
        for r in composite_agg(df, ["lang", "source"], 2, after=("en", "s3")).collect()
    ]
    assert page3 == [("fr", "s1", 1)]
    # pages tile the full bucket set exactly
    assert len(page1) + len(page2) + len(page3) == 5


def test_has_child_score_modes(spark):
    from fulltextsearch_spark.operators.parentchild import child_docs, has_child_topk

    docs = spark.createDataFrame(
        [
            (0, "salmon river\nsalmon salmon\nempty here"),
            (1, "salmon alone"),
            (2, "river bank\nno fish at all"),
            (3, "   \nsalmon again\n"),
        ],
        ["doc_id", "text"],
    )
    kids = {(r["parent_id"], r["child_idx"]): r["child_text"]
            for r in child_docs(docs).collect()}
    # trimming + empty filtering happens BEFORE indexing
    assert kids[(3, 0)] == "salmon again"
    assert (3, 1) not in kids
    assert len([k for k in kids if k[0] == 0]) == 3

    q = spark.createDataFrame([("q", "salmon")], ["query_id", "content"])
    # min_children=2: only doc 0 has >=2 children containing 'salmon'
    got = has_child_topk(docs, q, k=5, score_mode="max", min_children=2).collect()
    assert [(r["parent_id"], r["n_children"]) for r in got] == [(0, 2)]
    # min_children=1: docs 0, 1, 3 qualify; sum > max for doc 0 only
    mx = {r["parent_id"]: r["score"]
          for r in has_child_topk(docs, q, k=5, score_mode="max").collect()}
    sm = {r["parent_id"]: r["score"]
          for r in has_child_topk(docs, q, k=5, score_mode="sum").collect()}
    assert set(mx) == {0, 1, 3}
    assert sm[0] > mx[0]
    assert sm[1] == pytest.approx(mx[1])


def test_dsir_weights_favor_target_domain(spark):
    from fulltextsearch_spark.operators.sampling import dsir_weights

    rows = []
    # target-like docs repeat one phrase; off-domain docs another
    for i in range(10):
        rows.append((i, "clean wiki prose sentence structure clean wiki prose"))
    for i in range(10, 20):
        rows.append((i, "spam casino bonus click casino bonus spam click"))
    rows.append((20, "a"))  # single-token: no bigrams
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    target = docs.where("doc_id < 10")
    got = {r["doc_id"]: (r["n_feats"], r["logw"])
           for r in dsir_weights(docs, target, n_buckets=256).collect()}
    assert got[20] == (0, 0.0)
    # every target-domain doc outranks every off-domain doc
    assert min(got[i][1] for i in range(10)) > max(got[i][1] for i in range(10, 20))
    assert got[0][0] > 0


def test_matrix_stats_and_percentile_ranks(spark):
    import numpy as np

    from fulltextsearch_spark.operators.facets import matrix_stats, percentile_ranks

    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 4.0, 5.0, 4.0, 5.0]
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    rows = {(r["field_x"], r["field_y"]): r for r in matrix_stats(df, ["x", "y"]).collect()}
    assert set(rows) == {("x", "x"), ("x", "y"), ("y", "y")}
    assert rows[("x", "y")]["covariance"] == pytest.approx(
        round(float(np.cov(xs, ys, bias=True)[0][1]), 6)
    )
    assert rows[("x", "y")]["correlation"] == pytest.approx(
        round(float(np.corrcoef(xs, ys)[0][1]), 6)
    )
    assert rows[("x", "x")]["covariance"] == pytest.approx(
        round(float(np.var(xs)), 6)
    )

    pr = percentile_ranks(df.withColumn("g", F.lit("a")), ["g"], "x", [2.0, 4.5]).collect()[0]
    assert pr["pr_2"] == pytest.approx(40.0)
    assert pr["pr_4_5"] == pytest.approx(80.0)


def test_similar_terms_matches_python_replay(spark):
    """PPMI-cosine neighbors vs a full Python replay: symmetric window-1
    contexts, min_count floor, PPMI clamp, cosine, (sim DESC, term) order,
    probe excluded."""
    import math
    from collections import Counter, defaultdict

    from fulltextsearch_spark.functions.tokenizer import tokenize
    from fulltextsearch_spark.operators.textstats import similar_terms

    rows = [
        (0, "spark engine runs fast query engine runs fast"),
        (1, "spark engine executes fast scan engine executes quickly"),
        (2, "database engine runs slow query database runs slow"),
        (3, "cat eats fish cat eats fish cat eats fish"),
        (4, "dog eats meat dog eats meat dog eats meat"),
        (5, "spark query engine fast scan filter"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    probes = spark.createDataFrame([("engine",), ("eats",)], ["term"])
    K, MC = 4, 2
    got = {}
    for r in similar_terms(df, probes, k=K, min_count=MC).collect():
        got.setdefault(r["probe"], []).append((r["rank"], r["term"], round(r["sim"], 9)))

    # Python replay
    pair = Counter()
    for _, text in rows:
        t = tokenize(text, do_stem=False)
        for a, b in zip(t, t[1:]):
            pair[(a, b)] += 1
            pair[(b, a)] += 1
    pair = {k_: v for k_, v in pair.items() if v >= MC}
    nw, nc = Counter(), Counter()
    for (w, c), v in pair.items():
        nw[w] += v
        nc[c] += v
    nn = sum(pair.values())
    vec = defaultdict(dict)
    for (w, c), v in pair.items():
        x = max(0.0, math.log(v * nn / (nw[w] * nc[c])))
        if x > 0:
            vec[w][c] = x
    nrm = {w: math.sqrt(sum(x * x for x in d.values())) for w, d in vec.items()}
    for probe in ("engine", "eats"):
        sims = []
        for w, d in vec.items():
            if w == probe:
                continue
            dot = sum(d.get(c, 0.0) * x for c, x in vec[probe].items())
            if dot:
                sims.append((dot / (nrm[w] * nrm[probe]), w))
        want = sorted(sims, key=lambda t2: (-t2[0], t2[1]))[:K]
        have = sorted(got.get(probe, []))
        assert [t for _, t, _ in have] == [w for _, w in want], probe
        assert all(abs(h[2] - w[0]) < 1e-6 for h, w in zip(have, want)), probe
    # sanity: 'eats' neighbors its subject/object co-occurrence family
    assert got["eats"], "expected neighbors for 'eats'"


def test_corpus_drift_detects_injected_shift(spark):
    """JSD is 0 for identical snapshots, positive under drift; the injected
    newcomer tops the risers; a vanished term tops the fallers."""
    from fulltextsearch_spark.operators.textstats import corpus_drift

    base = [(i, "alpha beta gamma shared words appear everywhere") for i in range(30)]
    a = spark.createDataFrame(
        base + [(100 + i, "vanishing token oldword oldword") for i in range(10)],
        "doc_id LONG, text STRING",
    )
    b = spark.createDataFrame(
        base + [(200 + i, "rising token newword newword newword") for i in range(10)],
        "doc_id LONG, text STRING",
    )
    rows = corpus_drift(a, b, min_count=5, k=3).collect()
    jsd = [r for r in rows if r["kind"] == "jsd"][0]["value"]
    assert jsd > 0.0
    risers = sorted((r["rank"], r["term"]) for r in rows if r["kind"] == "riser")
    fallers = sorted((r["rank"], r["term"]) for r in rows if r["kind"] == "faller")
    assert risers[0][1] == "newword"
    assert fallers[0][1] == "oldword"
    # identical snapshots -> JSD exactly 0, movers all ~0
    same = corpus_drift(a, a, min_count=5, k=3).collect()
    assert [r for r in same if r["kind"] == "jsd"][0]["value"] == 0.0
    assert all(abs(r["value"]) < 1e-9 for r in same if r["kind"] != "jsd")
