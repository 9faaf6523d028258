"""Rule-level semantics of the published web-corpus filters.

Each case pins one clause of the Gopher (Rae et al. 2021, A1.1) or C4
(Raffel et al. 2020 §2.2) rule sets, or the keep-first paragraph-dedup
policy, against hand-computed expectations. The sf0.01 hash gate
(check_contract.py entries gopher_rules / c4_filters / paragraph_dedup)
covers the same code paths at corpus scale.
"""

from __future__ import annotations

import pytest

from fulltextsearch_spark.operators.webfilters import (
    c4_line_filters,
    gopher_quality,
    gopher_repetition,
    paragraph_dedup_stats,
)


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


GOOD_TEXT = (
    "the quick brown fox jumps over that lazy dog and keeps running with "
    "steady pace to be sure of a good outcome " * 3
)  # 66 words, has the/that/and/with/to/be/of >= 2 required stops


def test_gopher_passes_and_word_stats(spark):
    docs = spark.createDataFrame(
        [
            (0, GOOD_TEXT.strip()),
            (1, "tiny doc"),  # fails min_words
            (2, ("ab " * 60).strip()),  # mean word len 2 < 3, no stops
        ],
        ["doc_id", "text"],
    )
    out = _rows(gopher_quality(docs))
    assert out[0]["passes"] == 1
    assert out[0]["n_words"] == 66
    assert out[0]["n_required_stops"] >= 2
    assert out[1]["passes"] == 0 and out[1]["n_words"] == 2
    assert out[2]["passes"] == 0
    assert out[2]["mean_word_len"] == pytest.approx(2.0)


def test_gopher_symbol_bullet_ellipsis_rules(spark):
    bullet_text = "\n".join(["- item one here"] * 9 + ["a plain closing line"])
    ellipsis_text = "\n".join(["trailing thought..."] * 2 + ["plain line"])
    hashy = ("word " * 50).strip() + " " + ("# " * 10).strip()
    docs = spark.createDataFrame(
        [(0, bullet_text), (1, ellipsis_text), (2, hashy)], ["doc_id", "text"]
    )
    out = _rows(gopher_quality(docs))
    assert out[0]["bullet_line_ratio"] == pytest.approx(0.9)
    assert out[1]["ellipsis_line_ratio"] == pytest.approx(2 / 3, abs=1e-4)
    # 10 '#' over 60 words > 0.1 -> fails the symbol rule
    assert out[2]["symbol_ratio"] == pytest.approx(10 / 60, abs=1e-4)
    assert out[2]["passes"] == 0
    # non-alpha words drag the alphabetic ratio below 0.8 for doc 2
    assert out[2]["alpha_word_ratio"] == pytest.approx(50 / 60, abs=1e-4)


def test_c4_line_and_page_rules(spark):
    good = "\n".join(
        ["This line ends properly."] * 3 + ["short."] + ["And one more sentence here!"]
    )  # 4 kept lines (>=3 words each except 'short.'), 5 sentence marks
    docs = spark.createDataFrame(
        [
            (0, good),
            (1, good + " lorem ipsum filler"),
            (2, good + " { code"),
            (3, "no terminal punctuation on this line at all"),
            (4, "Too few sentences end here."),
        ],
        ["doc_id", "text"],
    )
    out = _rows(c4_line_filters(docs))
    assert out[0]["passes"] == 1
    assert out[0]["n_kept_lines"] == 4  # 'short.' has < 3 words
    assert out[0]["n_sentences"] == 5
    assert out[1]["has_lorem"] == 1 and out[1]["passes"] == 0
    assert out[2]["has_brace"] == 1 and out[2]["passes"] == 0
    assert out[3]["n_kept_lines"] == 0 and out[3]["passes"] == 0
    assert out[4]["n_sentences"] == 1 and out[4]["passes"] == 0


def test_paragraph_dedup_keep_first(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta\ngamma delta"),
            (1, "ALPHA BETA\nunique one"),  # first para dups doc 0 (case-folded)
            (2, "gamma delta\ngamma delta"),  # both dup doc 0's second para
            (3, "   \n  "),  # no non-empty paragraphs
        ],
        ["doc_id", "text"],
    )
    out = _rows(paragraph_dedup_stats(docs))
    assert out[0] == {"doc_id": 0, "n_paras": 2, "n_dup_paras": 0, "dup_ratio": 0.0}
    assert out[1]["n_dup_paras"] == 1 and out[1]["dup_ratio"] == pytest.approx(0.5)
    assert out[2]["n_dup_paras"] == 2 and out[2]["dup_ratio"] == pytest.approx(1.0)
    assert out[3] == {"doc_id": 3, "n_paras": 0, "n_dup_paras": 0, "dup_ratio": 0.0}


def test_gopher_repetition_clean_doc_passes(spark):
    docs = spark.createDataFrame(
        [(0, "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    )
    out = _rows(gopher_repetition(docs))
    r = out[0]
    assert r["passes"] == 1
    assert r["n_lines"] == 1
    for col, v in r.items():
        if col.endswith("_frac"):
            assert v == 0.0, col


def test_gopher_repetition_top_ngram(spark):
    # "spam ham " * 10 -> 20 words; 2-grams: "spam ham" x10, "ham spam" x9.
    # top = 10 * len("spam ham")=8 over 89 joined content chars.
    docs = spark.createDataFrame([(0, ("spam ham " * 10).strip())], ["doc_id", "text"])
    r = _rows(gopher_repetition(docs))[0]
    assert r["top_2gram_char_frac"] == pytest.approx(80 / 89, abs=1e-4)
    assert r["passes"] == 0


def test_gopher_repetition_duplicate_lines(spark):
    text = "line one text\nline one text\nother content here"
    r = _rows(gopher_repetition(spark.createDataFrame([(0, text)], ["doc_id", "text"])))[0]
    assert r["n_lines"] == 3
    assert r["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-4)
    # 13 chars of the second "line one text" over 13+13+18 line chars
    assert r["dup_line_char_frac"] == pytest.approx(13 / 44, abs=1e-4)
    assert r["passes"] == 0


def test_gopher_repetition_dup_5gram_and_tiebreak(spark):
    words = "alpha beta gamma delta epsilon x1 x2 alpha beta gamma delta epsilon"
    r = _rows(gopher_repetition(spark.createDataFrame([(0, words)], ["doc_id", "text"])))[0]
    total = len(words)  # joined = input (single spaces): 67 chars
    # the 5-gram "alpha beta gamma delta epsilon" repeats once -> its 30
    # chars counted for the occurrence beyond the first
    assert r["dup_5gram_char_frac"] == pytest.approx(30 / total, abs=1e-4)
    # four 2-grams tie at count 2; lexicographic min "alpha beta" (10 chars)
    assert r["top_2gram_char_frac"] == pytest.approx(2 * 10 / total, abs=1e-4)
    # no 6-gram repeats
    assert r["dup_6gram_char_frac"] == 0.0
    assert r["passes"] == 0


def test_gopher_repetition_short_doc_edge(spark):
    # fewer words than n: every n-gram array is empty, fracs all 0
    r = _rows(gopher_repetition(spark.createDataFrame([(0, "solo")], ["doc_id", "text"])))[0]
    assert r["passes"] == 1
    assert r["top_2gram_char_frac"] == 0.0 and r["dup_10gram_char_frac"] == 0.0


def test_paragraph_dedup_within_doc_order(spark):
    # duplicate inside ONE doc: first instance kept, second flagged
    docs = spark.createDataFrame([(7, "same para\nsame para")], ["doc_id", "text"])
    out = _rows(paragraph_dedup_stats(docs))
    assert out[7]["n_paras"] == 2 and out[7]["n_dup_paras"] == 1


def test_paragraph_dedup_plan_prunes_text_before_exchange(spark):
    # the window partitions on a MATERIALIZED md5 of the normalized
    # paragraph; neither the paragraph nor the source text may cross an
    # exchange (at 100 TB that would shuffle the whole corpus text)
    df = spark.createDataFrame(
        [(0, "a b c\nd e f"), (1, "a b c\nx y z")], ["doc_id", "text"]
    )
    plan = paragraph_dedup_stats(df)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "para#" not in line and "text#" not in line, line


# --- cross-corpus boilerplate line removal -----------------------------------


def test_boilerplate_removed_everywhere_unique_kept(spark):
    from fulltextsearch_spark.operators.webfilters import boilerplate_lines

    rows = [
        (0, "alpha one\nAll Rights Reserved\nbeta two"),
        (1, "gamma\nall rights reserved \nunique line one"),
        (2, "  ALL RIGHTS RESERVED\ndelta"),
        (3, "epsilon\nzeta"),
        (4, "twice here\nrepeated pair"),
        (5, "twice here\nother"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in boilerplate_lines(df, min_df=3).collect()}
    # normalization: lower + trim -> the three footer variants are one line
    assert out[0]["text"] == "alpha one\nbeta two" and out[0]["n_removed"] == 1
    assert out[1]["text"] == "gamma\nunique line one"
    assert out[2]["text"] == "delta" and out[2]["n_lines"] == 2
    assert out[3]["text"] == "epsilon\nzeta" and out[3]["n_removed"] == 0
    # df=2 < min_df -> kept (threshold exercised, not keep-first semantics)
    assert out[4]["text"] == "twice here\nrepeated pair"
    assert out[5]["text"] == "twice here\nother"


def test_boilerplate_counts_docs_not_instances(spark):
    """A line repeated 5x inside ONE doc has df=1 — within-doc repetition is
    gopher_repetition's job, not boilerplate removal."""
    from fulltextsearch_spark.operators.webfilters import boilerplate_lines

    df = spark.createDataFrame(
        [(0, "same\nsame\nsame\nsame\nsame"), (1, "x"), (2, "y")],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in boilerplate_lines(df, min_df=3).collect()}
    assert out[0]["n_removed"] == 0 and out[0]["n_lines"] == 5


def test_boilerplate_cap_guard(spark):
    from fulltextsearch_spark.operators.webfilters import boilerplate_lines

    df = spark.createDataFrame(
        [(i, "common line") for i in range(5)], "doc_id LONG, text STRING"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        boilerplate_lines(df, min_df=2, max_boilerplate=0)
