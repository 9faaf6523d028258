"""Phrase suggester: candidate expansion, exact combo cross product,
bigram-LM + error-penalty scoring."""

from __future__ import annotations

import itertools
import math

import pytest

from fulltextsearch_spark.functions.tokenizer import tokenize
from fulltextsearch_spark.operators.phrasesuggest import suggest_phrases


@pytest.fixture(scope="module")
def corpus(spark):
    # strong bigram structure: "fast table scan" dominates
    rows = []
    for i in range(30):
        rows.append((i, "fast table scan beats slow row scan every time"))
    for i in range(30, 40):
        rows.append((i, "hash join merge join sort spill"))
    rows.append((40, "tuble mention once"))  # a competing 1-edit neighbor
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _replay(rows, queries, k=3, max_edits=1, cap=3, alpha=0.5, err=-3.0):
    """Independent Python replay of the documented semantics."""
    toks = [tokenize(t, do_stem=False) for _, t in rows]
    vocab: dict[str, int] = {}
    bg: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    n_tokens = 0
    for ts in toks:
        n_tokens += len(ts)
        for w in ts:
            vocab[w] = vocab.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    v = float(len(vocab))

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    out = {}
    for qid, phrase in queries:
        words = tokenize(phrase, do_stem=False)
        if not words:
            continue
        slot_cands = []
        for w in words:
            cs = {w: (0, vocab.get(w, 0))}
            for t, occ in vocab.items():
                if abs(len(t) - len(w)) <= max_edits:
                    e = lev(t, w)
                    if e <= max_edits and (t not in cs or e < cs[t][0]):
                        cs[t] = (e, occ)
            ranked = sorted(cs.items(), key=lambda kv: (kv[1][0], -kv[1][1], kv[0]))[:cap]
            slot_cands.append([(t, e) for t, (e, _) in ranked])
        scored = []
        for combo in itertools.product(*slot_cands):
            ws = [t for t, _ in combo]
            n_edits = sum(e for _, e in combo)
            if len(ws) == 1:
                p = (vocab.get(ws[0], 0) + alpha) / (n_tokens + alpha * v)
                lm = math.log2(p)
            else:
                lm = 0.0
                for a, b in zip(ws, ws[1:]):
                    p = (bg.get((a, b), 0) + alpha) / (ctx.get(a, 0) + alpha * v)
                    lm += math.log2(p)
            scored.append((" ".join(ws), lm + n_edits * err))
        scored.sort(key=lambda t: (-t[1], t[0]))
        out[qid] = [(s, r + 1, sc) for r, (s, sc) in enumerate(scored[:k])]
    return out


def test_suggest_phrases_matches_replay_and_corrects(spark, corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    qs = [
        ("q1", "fast tble scan"),  # 3 slots, middle typo
        ("q2", "hash joun"),
        ("q3", "tble"),  # single-token typo: 'table' vs 'tuble' popularity
        ("q4", "zzzz qqqq"),  # fully OOV survives as itself
        ("q5", "the of"),  # stopword-only -> no rows
    ]
    got: dict = {}
    for r in suggest_phrases(corpus, qs, k=3).collect():
        got.setdefault(r["query_id"], []).append(
            (r["suggestion"], r["rank"], r["score"])
        )
    for k in got:
        got[k].sort(key=lambda t: t[1])
    exp = _replay(rows, qs)
    assert set(got) == {"q1", "q2", "q3", "q4"}
    for qid in got:
        assert [(s, r) for s, r, _ in got[qid]] == [(s, r) for s, r, _ in exp[qid]]
        for (_, _, a), (_, _, b) in zip(got[qid], exp[qid]):
            assert a == pytest.approx(b, rel=1e-9)
    # the LM actually corrects: strong bigram support beats the edit penalty
    assert got["q1"][0][0] == "fast table scan"
    assert got["q2"][0][0] == "hash join"
    # popularity prior: 'table' (frequent) outranks 'tuble' (hapax)
    assert got["q3"][0][0] == "table"
    # OOV phrase survives as itself (ES keeps the source token)
    assert got["q4"][0][0] == "zzzz qqqq"


def test_suggest_phrases_guards(spark, corpus):
    with pytest.raises(ValueError):
        suggest_phrases(corpus, [("x", "xx yy zz ww vv uu")], max_slots=5)
    assert suggest_phrases(corpus, []).count() == 0
