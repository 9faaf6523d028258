"""Multinomial NB quality classifier: brute-force Python replay, OOV and
empty-doc handling, class validation."""

from __future__ import annotations

import math

import pytest

from fulltextsearch_spark.functions.tokenizer import tokenize
from fulltextsearch_spark.operators.qualityclf import nb_score, nb_train

DOCS = [
    (0, "spark query engine table scan filter join"),
    (1, "query plan engine optimizer codegen stage"),
    (2, "cheap pills casino winner lottery click here"),
    (3, "winner casino bonus click free free free"),
    (4, "table engine casino query"),  # mixed — scored, unlabeled
    (5, ""),  # 0 tokens
    (6, "zzznovel terms never seen zzzbefore"),  # OOV-heavy
]
LABELS = [(0, 1), (1, 1), (2, 0), (3, 0)]
ALPHA = 0.5


def _brute():
    from collections import Counter

    c1, c0 = Counter(), Counter()
    for doc_id, lab in LABELS:
        toks = tokenize(dict(DOCS)[doc_id], do_stem=False)
        (c1 if lab == 1 else c0).update(toks)
    vocab = set(c1) | set(c0)
    n1, n0, v = sum(c1.values()), sum(c0.values()), len(vocab)
    d1 = sum(1 for _, l in LABELS if l == 1)
    d0 = len(LABELS) - d1
    prior = math.log(d1 / d0)

    def llr(t):
        return math.log((c1[t] + ALPHA) / (n1 + ALPHA * v)) - math.log(
            (c0[t] + ALPHA) / (n0 + ALPHA * v)
        )

    oov = math.log(ALPHA / (n1 + ALPHA * v)) - math.log(ALPHA / (n0 + ALPHA * v))
    out = {}
    for doc_id, text in DOCS:
        toks = tokenize(text, do_stem=False)
        s = prior + sum(llr(t) if t in vocab else oov for t in toks)
        out[doc_id] = (len(toks), round(s, 4), 1 if s > 0 else 0)
    return out


def test_nb_matches_brute_replay(spark):
    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    labels = spark.createDataFrame(LABELS, "doc_id LONG, label INT")
    model = nb_train(docs, labels, alpha=ALPHA)
    got = {
        r["doc_id"]: (r["n_toks"], r["nb_llr"], r["pred"])
        for r in nb_score(docs, model).collect()
    }
    exp = _brute()
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][0] == exp[d][0], d
        assert got[d][2] == exp[d][2], d
        assert abs(got[d][1] - exp[d][1]) < 1e-9, d
    # sanity: engine-ish docs positive, spam docs negative, 0-token = prior
    assert got[0][2] == 1 and got[1][2] == 1
    assert got[2][2] == 0 and got[3][2] == 0
    assert got[5][0] == 0 and got[5][1] == round(math.log(2 / 2), 4) == 0.0


def test_nb_shuffle_join_path_matches_broadcast(spark):
    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    labels = spark.createDataFrame(LABELS, "doc_id LONG, label INT")
    model = nb_train(docs, labels, alpha=ALPHA)
    a = sorted(map(tuple, nb_score(docs, model, broadcast_model=True).collect()))
    b = sorted(map(tuple, nb_score(docs, model, broadcast_model=False).collect()))
    assert a == b


def test_nb_train_rejects_empty_class(spark):
    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    only_pos = spark.createDataFrame([(0, 1), (1, 1)], "doc_id LONG, label INT")
    with pytest.raises(ValueError):
        nb_train(docs, only_pos)
    empty_tok = spark.createDataFrame([(0, 1), (5, 0)], "doc_id LONG, label INT")
    with pytest.raises(ValueError):
        nb_train(docs, empty_tok)  # class 0's only doc has zero tokens
