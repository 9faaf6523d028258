"""Exact-substring span dedup (Lee et al. 2022 ExactSubstr re-expressed as
duplicated-L-gram coverage), pinned against a brute-force Python oracle.
"""

from __future__ import annotations

import pytest

from fulltextsearch_spark.functions.tokenizer import tokenize
from fulltextsearch_spark.operators.spandedup import (
    duplicate_spans,
    strip_duplicate_spans,
)

L = 4

# crafted corpus: "alpha beta gamma delta" (4 tokens) duplicated across docs
# 0/1; doc 2 repeats a 6-token run of doc 0 (tests merging of overlapping
# windows); doc 3 repeats a span WITHIN itself; doc 4 is clean; doc 5 too
# short to hold any L-gram.
TEXTS = {
    0: "alpha beta gamma delta epsilon zeta unique0 tail0 end0",
    1: "front1 alpha beta gamma delta unique1 tail1",
    2: "alpha beta gamma delta epsilon zeta unique2",
    3: "red blue green gold mid red blue green gold last3",
    4: "totally fresh words nobody else wrote here",
    5: "tiny doc",
}


def brute_spans(keep_first: bool):
    streams = {d: tokenize(t, do_stem=False) for d, t in TEXTS.items()}
    occ: dict[tuple, list] = {}
    for d, toks in sorted(streams.items()):
        for s in range(len(toks) - L + 1):
            occ.setdefault(tuple(toks[s : s + L]), []).append((d, s))
    covered: dict[int, set] = {d: set() for d in streams}
    for gram, places in occ.items():
        if len(places) < 2:
            continue
        skip = min(places) if keep_first else None
        for d, s in places:
            if (d, s) == skip:
                continue
            covered[d].update(range(s, s + L))
    spans = set()
    for d, pos in covered.items():
        ps = sorted(pos)
        i = 0
        while i < len(ps):
            j = i
            while j + 1 < len(ps) and ps[j + 1] == ps[j] + 1:
                j += 1
            spans.add((d, ps[i], ps[j] + 1))
            i = j + 1
    return spans


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(sorted(TEXTS.items()), ["doc_id", "text"])


@pytest.mark.parametrize("keep_first", [True, False])
def test_spans_match_brute_force(spark, docs, keep_first):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(docs, min_len=L, keep_first=keep_first).collect()
    }
    assert got == brute_spans(keep_first)


def test_keep_first_exempts_earliest(spark, docs):
    got = duplicate_spans(docs, min_len=L, keep_first=True).collect()
    by_doc = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in got}
    # doc 0 holds the earliest copy of both duplicated runs -> no span at all
    assert 0 not in by_doc
    # doc 1's copy of (alpha beta gamma delta) flagged at its offset 1
    assert by_doc[1] == (1, 5)
    # doc 2 duplicates doc 0's 6-token run: three overlapping L-grams merge
    assert by_doc[2] == (0, 6)
    # doc 3's SECOND within-doc occurrence flagged, first kept
    assert by_doc[3] == (5, 9)
    assert 4 not in by_doc and 5 not in by_doc


def test_strip_removes_covered_tokens(spark, docs):
    rows = {
        r["doc_id"]: (list(r["kept_tokens"]), r["n_removed"])
        for r in strip_duplicate_spans(docs, min_len=L, keep_first=True).collect()
    }
    streams = {d: tokenize(t, do_stem=False) for d, t in TEXTS.items()}
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in duplicate_spans(docs, min_len=L, keep_first=True).collect()
    }
    for d, toks in streams.items():
        a, b = spans.get(d, (0, 0))
        want = [t for i, t in enumerate(toks) if not (a <= i < b)]
        assert rows[d][0] == want
        assert rows[d][1] == (b - a)
    # every doc present, clean docs untouched
    assert rows[4][1] == 0 and rows[5][1] == 0


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("keep_first", [True, False])
def test_random_corpora_match_brute(spark, seed, keep_first):
    """Randomized corpora over a tiny alphabet (dup-dense) vs brute force."""
    import random

    rng = random.Random(seed)
    words = ["red", "blue", "gold", "mint", "coal"]
    texts = {
        d: " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
        for d in range(12)
    }
    L = rng.choice([2, 3])
    docs = spark.createDataFrame(sorted(texts.items()), ["doc_id", "text"])
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(docs, min_len=L, keep_first=keep_first).collect()
    }

    streams = {d: tokenize(t, do_stem=False) for d, t in texts.items()}
    occ: dict[tuple, list] = {}
    for d, toks in sorted(streams.items()):
        for s in range(len(toks) - L + 1):
            occ.setdefault(tuple(toks[s : s + L]), []).append((d, s))
    covered: dict[int, set] = {d: set() for d in streams}
    for places in occ.values():
        if len(places) < 2:
            continue
        skip = min(places) if keep_first else None
        for d, s in places:
            if (d, s) != skip:
                covered[d].update(range(s, s + L))
    want = set()
    for d, pos in covered.items():
        ps = sorted(pos)
        i = 0
        while i < len(ps):
            j = i
            while j + 1 < len(ps) and ps[j + 1] == ps[j] + 1:
                j += 1
            want.add((d, ps[i], ps[j] + 1))
            i = j + 1
    assert got == want
