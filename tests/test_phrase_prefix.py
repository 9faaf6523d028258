"""match_phrase_prefix — pinned against brute-force scanning of the
tokenized corpus.
"""

from __future__ import annotations

import pytest

from fulltextsearch_spark.functions.tokenizer import tokenize
from fulltextsearch_spark.operators.positional import (
    build_positional_index,
    phrase_prefix_occurrences,
    phrase_prefix_topk,
    phrase_topk,
)
from fulltextsearch_spark.sources.webpages import generate_webpages_pdf


@pytest.fixture(scope="module")
def setup(spark):
    pdf = generate_webpages_pdf(100, seed=71)[["text"]]
    pdf.insert(0, "doc_id", range(len(pdf)))
    docs = spark.createDataFrame(pdf)
    idx = build_positional_index(docs)
    doc_toks = {
        int(r["doc_id"]): tokenize(r["text"], do_stem=False) for r in docs.collect()
    }
    return idx, doc_toks


def _brute_occ(doc_toks, lead: list[str], prefix: str, vocab_cap=None):
    vocab = sorted({t for toks in doc_toks.values() for t in toks})
    exp = [t for t in vocab if t.startswith(prefix)]
    if vocab_cap is not None:
        exp = exp[:vocab_cap]
    expset = set(exp)
    out = {}
    k = len(lead) + 1
    for d, toks in doc_toks.items():
        n = 0
        for i in range(len(toks) - k + 1):
            if toks[i : i + len(lead)] == lead and toks[i + len(lead)] in expset:
                n += 1
        if n:
            out[d] = n
    return out


def test_phrase_prefix_occurrences_match_brute(spark, setup):
    idx, doc_toks = setup
    qdf = spark.createDataFrame(
        [("p1", "fish riv"), ("p2", "the river wo")], ["query_id", "content"]
    )
    got = {
        (r["query_id"], r["doc_id"]): r["n_occ"]
        for r in phrase_prefix_occurrences(idx, qdf, max_expansions=None).collect()
    }
    # stop word 'the' drops on both sides -> lead ['river'], prefix 'wo'
    # ('wo' expands to ~130 vocabulary terms — real multi-term slots)
    want = {}
    for qid, lead, prefix in [("p1", ["fish"], "riv"), ("p2", ["river"], "wo")]:
        for d, n in _brute_occ(doc_toks, lead, prefix).items():
            want[(qid, d)] = n
    assert got == want and got


def test_phrase_prefix_empty_expansion_matches_nothing(spark, setup):
    idx, _doc_toks = setup
    qdf = spark.createDataFrame([("p", "fish zzzzqq")], ["query_id", "content"])
    assert phrase_prefix_occurrences(idx, qdf).count() == 0


def test_phrase_prefix_max_expansions_takes_term_asc(spark, setup):
    idx, doc_toks = setup
    qdf = spark.createDataFrame([("p", "the wo")], ["query_id", "content"])
    # lead is empty after the stop word drops -> single prefix slot; cap=2
    got = {
        (r["query_id"], r["doc_id"]): r["n_occ"]
        for r in phrase_prefix_occurrences(idx, qdf, max_expansions=2).collect()
    }
    want = {}
    for d, n in _brute_occ(doc_toks, [], "wo", vocab_cap=2).items():
        want[("p", d)] = n
    assert got == want and got


def test_phrase_prefix_full_term_equals_exact_phrase(spark, setup):
    """A prefix that matches exactly one vocabulary term — itself — must
    rank identically to the exact phrase query."""
    idx, doc_toks = setup
    vocab = sorted({t for toks in doc_toks.values() for t in toks})
    assert sum(1 for t in vocab if t.startswith("www")) == 1
    qp = spark.createDataFrame([("q", "http www")], ["query_id", "content"])
    got = sorted(map(tuple, phrase_prefix_topk(idx, qp).collect()))
    want = sorted(map(tuple, phrase_topk(idx, qp).collect()))
    assert got == want and got
