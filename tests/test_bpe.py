"""BPE tokenizer training: merge order, weighted counts, overlap rule."""

from __future__ import annotations

import pytest

from fulltextsearch_spark.operators.bpe import _merge_once, train_bpe


def test_merge_once_left_to_right_nonoverlapping():
    assert _merge_once(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_once(["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]
    assert _merge_once(["x", "a", "b", "y"], "a", "b") == ["x", "ab", "y"]
    assert _merge_once(["a"], "a", "a") == ["a"]
    assert _merge_once([], "a", "b") == []


def _replay(word_counts, n_merges):
    """Independent reference BPE (dict-based, as in Sennrich's pseudocode)."""
    table = {tuple(list(w) + ["_"]): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        stats: dict = {}
        for syms, c in table.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + c
        if not stats:
            break
        (l, r), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, c))
        table = {tuple(_merge_once(list(s), l, r)): cnt for s, cnt in table.items()}
    return merges


def test_train_bpe_matches_reference_replay(spark):
    # 'loow' repeats the 'oo' pair inside one word (overlap-count case:
    # 'looow' has ('o','o') twice via zip but merges once per pass)
    rows = []
    docs = (
        ["lower"] * 8 + ["low"] * 7 + ["newest"] * 6 + ["widest"] * 3 + ["looow"] * 5
    )
    for i, w in enumerate(docs):
        rows.append((i, w))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    wc: dict = {}
    for w in docs:
        wc[w] = wc.get(w, 0) + 1
    exp = _replay(wc, 8)
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in train_bpe(df, n_merges=8).orderBy("merge_rank").collect()
    ]
    assert got == exp
    # the distributed (unbounded-vocab) loop computes the identical table
    got_dist = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in train_bpe(df, n_merges=8, driver_vocab_limit=0)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got_dist == exp
    # sanity: the most frequent pair in this corpus wins round 1
    assert got[0][1:3] == exp[0][1:3]


def test_train_bpe_early_stop(spark):
    # single 1-char word + end mark -> one pair exists, then nothing
    df = spark.createDataFrame([(0, "x x x")], "doc_id LONG, text STRING")
    got = train_bpe(df, n_merges=5).collect()
    assert len(got) == 1
    assert (got[0]["lhs"], got[0]["rhs"], got[0]["pair_count"]) == ("x", "_", 3)


def test_train_bpe_empty_corpus(spark):
    df = spark.createDataFrame([(0, "the and of")], "doc_id LONG, text STRING")
    assert train_bpe(df, n_merges=3).count() == 0  # stopword-only -> no words


def test_bpe_encode_roundtrip_and_reconstruction(spark):
    """Encoding with the learned merges: concatenated segments reconstruct
    each word + end mark, merges reduce token count vs raw chars, and the
    segment stream matches a direct per-word replay."""
    from fulltextsearch_spark.functions.tokenizer import tokenize
    from fulltextsearch_spark.operators.bpe import bpe_encode

    docs = ["lower lowest" for _ in range(5)] + ["newest widest"] * 4
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id LONG, text STRING")
    merges = [
        (r["lhs"], r["rhs"])
        for r in train_bpe(df, n_merges=6).orderBy("merge_rank").collect()
    ]
    got = {r["doc_id"]: (r["n_bpe_tokens"], list(r["bpe_tokens"]))
           for r in bpe_encode(df, merges).collect()}
    for doc_id, text in enumerate(docs):
        n, toks = got[doc_id]
        assert n == len(toks)
        # per-word replay
        exp = []
        for w in tokenize(text, do_stem=False):
            syms = list(w) + ["_"]
            for l, r in merges:
                syms = _merge_once(syms, l, r)
            exp.extend(syms)
        assert toks == exp
        # segments reconstruct the words exactly
        assert "".join(toks) == "".join(w + "_" for w in tokenize(text, do_stem=False))
        # merges compress vs raw chars+mark
        raw = sum(len(w) + 1 for w in tokenize(text, do_stem=False))
        assert n < raw
