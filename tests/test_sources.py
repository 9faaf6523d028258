"""Query-dir source (S2) and result sink (S4) parity."""

from __future__ import annotations

import os

from fulltextsearch_spark.sources.queries import read_query_dir, write_results_tbl


def test_read_query_dir_semantics(spark, tmp_path):
    qdir = tmp_path / "queries"
    qdir.mkdir()
    # two lines share the file-stem id; trailing newline adds no empty query
    (qdir / "eval.txt").write_text("cat salmon\nrunning quickly\n")
    (qdir / "head.txt").write_text("http www com")  # no trailing newline
    (qdir / "notes.md").write_text("ignored — not .txt")

    rows = sorted(
        (r["query_id"], r["content"], r["query_uid"])
        for r in read_query_dir(spark, str(qdir)).collect()
    )
    assert rows == [
        ("eval", "cat salmon", "eval#0"),
        ("eval", "running quickly", "eval#1"),
        ("head", "http www com", "head#0"),
    ]


def test_read_query_dir_empty(spark, tmp_path):
    d = tmp_path / "noqueries"
    d.mkdir()
    assert read_query_dir(spark, str(d)).count() == 0


def test_write_results_tbl_format(spark, tmp_path):
    df = spark.createDataFrame(
        [("q1", 2, 7, 1.5), ("q1", 1, 3, 2.25)],
        "query_id STRING, rank LONG, doc_id LONG, score DOUBLE",
    )
    out = str(tmp_path / "res")
    write_results_tbl(df, out)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1
    lines = open(os.path.join(out, parts[0])).read().splitlines()
    # reference line format query|rank|doc_id|score| (main.cpp:80-85), rank order
    assert lines == ["q1|1|3|2.25|", "q1|2|7|1.5|"]
