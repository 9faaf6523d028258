"""Trigram engine: parser byte-parity (vectorized vs per-byte oracle),
build parity, reference quirks (offset cap / uncapped probe / duplicate doc
entries), compactify, and search rank-identity.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from fulltextsearch_spark.config import EngineConfig
from fulltextsearch_spark.functions.trigram import cap_offset, trigram_values
from fulltextsearch_spark.operators.trigram import build_trigram_index, search_trigram
from fulltextsearch_spark.sources.ingest import assign_dense_doc_ids
from fulltextsearch_spark.sources.webpages import generate_webpages
from tests.trigram_oracle import TrigramOracle, oracle_trigrams

CFG = EngineConfig(k1=1.2, b=0.75, k=10)


def _pack(s: str, off: int) -> int:
    b = s.encode()
    c2 = b[2] if len(b) > 2 else 0
    return (b[0] << 24) | (b[1] << 16) | (c2 << 8) | off


# --- parser unit semantics (pinned to trigram_parser.cpp) -------------------


def test_sliding_windows_and_offsets():
    assert trigram_values(b"hello").tolist() == [
        _pack("hel", 0), _pack("ell", 1), _pack("llo", 2)
    ]


def test_two_char_standalone_needs_following_delimiter():
    assert trigram_values(b"ab ").tolist() == [_pack("ab\0", 0)]
    assert trigram_values(b"ab").tolist() == []  # end-of-input: parser exits
    assert trigram_values(b"ab,cd.").tolist() == [_pack("ab\0", 0), _pack("cd\0", 0)]


def test_single_char_and_empty():
    assert trigram_values(b"a b c").tolist() == []
    assert trigram_values(b"").tolist() == []
    assert trigram_values(b"!!!").tolist() == []


def test_bytewise_lowercase_and_specials():
    assert trigram_values(b"AbC").tolist() == [_pack("abc", 0)]
    assert trigram_values(b"$%&").tolist() == [_pack("$%&", 0)]


def test_non_ascii_bytes_are_delimiters():
    # "résumé": é (2 UTF-8 bytes) splits the word into ASCII runs
    vals = trigram_values("résumé".encode())
    assert vals.tolist() == [_pack("sum", 0)]  # "r" alone, "sum", trailing "" — é ends input run...
    # ^ runs: "r" (len1: nothing), "sum" (len3: one window), trailing after é: none


def test_offset_uint8_wrap_and_cap():
    word = b"a" * 300 + b" "
    vals = trigram_values(word)
    offs = [v & 0xFF for v in vals.tolist()]
    assert offs[:3] == [0, 1, 2]
    assert offs[255] == 255 and offs[256] == 0  # uint8 cast wraps
    capped = cap_offset(vals)
    assert int((capped & 0xFF).max()) == 14  # insert-side cap at kMaxWordOffset-1


@pytest.mark.parametrize("seed", range(8))
def test_parser_fuzz_vs_oracle(seed):
    rng = random.Random(seed)
    data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 2000)))
    assert trigram_values(data).tolist() == oracle_trigrams(data)


def test_parser_fuzz_texty(seed=123):
    rng = random.Random(seed)
    chunks = []
    for _ in range(400):
        chunks.append(rng.choice(["cat", "a", "ab", "hello world", "C++", "$100", "日本語", " ", ".", "x" * 20]))
    data = " ".join(chunks).encode()
    assert trigram_values(data).tolist() == oracle_trigrams(data)


# --- Spark engine vs oracle --------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    pages = generate_webpages(spark, 150, seed=21, num_partitions=4)
    docs = assign_dense_doc_ids(pages, order_col="url")
    rows = docs.select("doc_id", "text").collect()
    return docs, [(r["doc_id"], r["text"]) for r in rows]


TRIGRAM_QUERIES = [
    ("t1", "cat"),
    ("t2", "cat salmon"),
    ("t3", "national communication"),
    ("t4", "swimming"),
    ("t5", "ab cd"),          # padded 2-char trigrams
    ("t6", "zz"),             # 2-char at end of input -> no trigrams at all
    ("t7", "the"),            # no stop-word filtering in the trigram engine
    ("t8", "$100 50%off"),
]


def test_build_matches_oracle(spark, corpus):
    docs, doc_rows = corpus
    idx = build_trigram_index(spark, docs, CFG, compactify=False)
    oracle = TrigramOracle(doc_rows, compactify=False)
    assert idx.doc_count == oracle.doc_count
    assert idx.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)
    assert idx.stop_threshold == oracle.stop_threshold
    got = {
        r["key"]: [(p["doc_id"], p["tf"]) for p in r["postings"]]
        for r in idx.postings.collect()
    }
    exp = {k: v for k, v in oracle.index.items()}
    assert set(got) == set(exp)
    mismatches = [k for k in exp if sorted(got[k]) != sorted(exp[k])]
    assert mismatches == []


def test_compactify_drops_hot_trigrams(spark, corpus):
    docs, doc_rows = corpus
    full = build_trigram_index(spark, docs, CFG, compactify=False)
    pruned = build_trigram_index(spark, docs, CFG, compactify=True)
    n_full, n_pruned = full.postings.count(), pruned.postings.count()
    assert n_pruned < n_full
    assert pruned.postings.filter(f"df > {pruned.stop_threshold}").count() == 0


@pytest.mark.parametrize("scoring", ["bm25", "tfidf"])
def test_search_rank_identity(spark, corpus, scoring):
    docs, doc_rows = corpus
    idx = build_trigram_index(spark, docs, CFG)
    oracle = TrigramOracle(doc_rows)
    rows = search_trigram(idx, TRIGRAM_QUERIES, CFG, scoring=scoring).collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for v in by_q.values():
        v.sort()
    checked = 0
    for qid, content in TRIGRAM_QUERIES:
        exp = oracle.search(content, k=CFG.k, k1=CFG.k1, b=CFG.b, scoring=scoring)
        got = by_q.get(qid, [])
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exp], (qid, content)
        for (_, _, gs), (_, _, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-9, abs=1e-12)
        checked += len(exp)
    assert checked > 20
    assert not by_q.get("t6")  # 'zz' at end of input parses to nothing


def test_duplicate_doc_entries_when_offsets_collide(spark):
    """Raw offsets 14 and 15+ cap to the same key -> one doc contributes two
    posting entries; df counts entries, not distinct docs (reference quirk)."""
    long_word = "x" * 40  # windows at offsets 0..37, capped: 14 shared by 24 windows...
    docs = [(0, long_word + " hello")]
    oracle = TrigramOracle(docs, compactify=False)
    key_xxx_14 = (ord("x") << 24) | (ord("x") << 16) | (ord("x") << 8) | 14
    entries = oracle.index[key_xxx_14]
    # offsets 14..37 are distinct raws, all capped to 14 -> 24 entries, same doc
    assert len(entries) == 24 and all(d == 0 for d, _ in entries)
    # query probe with raw offset 15 misses (uncapped lookup)
    key_xxx_15 = key_xxx_14 + 1
    assert key_xxx_15 not in oracle.index


def test_hot_key_pruned_before_collect(spark):
    """Skew safety: a boilerplate trigram present in every doc must be
    dropped by the pre-aggregation anti-join, never materialized as a giant
    posting list — and the surviving index must equal the post-filter
    semantics exactly (compactify discards those lists anyway)."""
    rng = random.Random(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    # 'boiler' appears in every doc -> its trigrams' df = 3*n_docs > threshold
    rows = [
        (i, "boiler " + " ".join(rng.choice(words) for _ in range(rng.randint(2, 6))) + " ")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    idx = build_trigram_index(spark, docs, CFG, compactify=True)
    oracle = TrigramOracle(rows, compactify=True)
    got = {
        r["key"]: sorted((p["doc_id"], p["tf"]) for p in r["postings"])
        for r in idx.postings.collect()
    }
    exp = {k: sorted(v) for k, v in oracle.index.items()}
    assert got == exp
    # the hot trigrams really were dropped
    boi = (ord("b") << 24) | (ord("o") << 16) | (ord("i") << 8) | 0
    assert boi not in got
    # and the pre-prune happened before aggregation: the physical plan
    # aggregates only after the anti-join against the hot-key set
    plan = idx.postings._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan


def test_save_load_round_trip(spark, tmp_path):
    """store()/load() parity (trigram_index_engine.cpp:95-155): the reloaded
    index serves byte-identical results without rebuilding."""
    from fulltextsearch_spark.operators.trigram import (
        load_trigram_index,
        save_trigram_index,
    )

    rng = random.Random(5)
    # wide vocabulary so per-trigram df stays under the compactify threshold
    words = ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(5)) for _ in range(30)]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(3, 10))) + " ")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    idx = build_trigram_index(spark, docs, CFG)
    root = str(tmp_path / "tri_idx")
    save_trigram_index(idx, root)
    loaded = load_trigram_index(spark, root)
    assert loaded.doc_count == idx.doc_count
    assert loaded.avgdl == pytest.approx(idx.avgdl, rel=1e-12)
    assert loaded.stop_threshold == idx.stop_threshold
    queries = [("q1", f"{words[0]} {words[1]}"), ("q2", f"{words[2]} {words[3]}"), ("q3", words[4])]
    orig = sorted(map(tuple, search_trigram(idx, queries, CFG).collect()))
    redo = sorted(map(tuple, search_trigram(loaded, queries, CFG).collect()))
    assert len(redo) > 0
    assert [t[:3] for t in orig] == [t[:3] for t in redo]  # rank-identical
    for a, b in zip(orig, redo):  # scores equal up to FP summation order
        assert a[3] == pytest.approx(b[3], rel=1e-12)


def test_suggest_terms_brute_force(spark):
    """Fuzzy 'did you mean' suggestions == brute-force char-trigram Jaccard."""
    import numpy as np

    from fulltextsearch_spark.functions.tokenizer import tokenize
    from fulltextsearch_spark.functions.trigram import trigram_values
    from fulltextsearch_spark.operators.trigram import suggest_terms

    texts = [
        (0, "salmon swims upstream salmon salmon"),
        (1, "customer report window value vector"),
        (2, "query window filter merge sort customer"),
        (3, "vector value vectors querying"),
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    queries = [("m1", "slamon"), ("m2", "custmer"), ("m3", "qeury"), ("m4", "zz")]
    qdf = spark.createDataFrame(queries, ["query_id", "word"])
    got: dict[str, list] = {}
    for r in suggest_terms(docs, qdf, k=3).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["term"], round(r["jaccard"], 9), r["n_occ"])
        )

    def tset(w):
        v = trigram_values(w.encode())
        return set((v >> 8).tolist()) if v.size else set()

    vocab: dict[str, int] = {}
    for _, t in texts:
        for w in tokenize(t, do_stem=False):
            vocab[w] = vocab.get(w, 0) + 1
    want: dict[str, list] = {}
    for qid, word in queries:
        q = tset(word)
        if not q:
            continue
        cands = []
        for term, n_occ in vocab.items():
            v = tset(term)
            inter = len(q & v)
            if inter:
                cands.append((-inter / len(q | v), -n_occ, term))
        cands.sort()
        if cands:
            want[qid] = [
                (i + 1, t, round(-negj, 9), -negn)
                for i, (negj, negn, t) in enumerate(cands[:3])
            ]
    assert got == want
    # the obvious corrections rank first
    assert got["m1"][0][1] == "salmon"
    assert got["m2"][0][1] == "customer"
    # 'zz' has no trigrams -> absent entirely
    assert "m4" not in got
