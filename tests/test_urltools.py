"""URL normalization / dedup / domain-cap semantics, case by case.

The sf0.01 hash gate (check_contract.py entries url_dedup / domain_caps)
covers the same code paths against the DuckDB replay at corpus scale;
these pin the individual normalization rules on hand-built URLs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fulltextsearch_spark.operators.urltools import (
    domain_caps,
    normalize_url,
    registered_domain,
    url_dedup,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], ["doc_id", "url"])
    rows = df.select("doc_id", normalize_url("url").alias("n")).collect()
    return [r["n"] for r in sorted(rows, key=lambda r: r["doc_id"])]


def test_normalize_case_port_fragment_tracking(spark):
    out = _norm(
        spark,
        [
            "HTTP://WWW.Site.COM:80/a/b/?b=2&a=1&utm_source=x&fbclid=zz#frag",
            "https://h.example.org:443/p",
            "http://h.example.org:8080/p",  # non-default port survives
        ],
    )
    assert out[0] == "http://www.site.com/a/b?a=1&b=2"
    assert out[1] == "https://h.example.org/p"
    assert out[2] == "http://h.example.org:8080/p"


def test_normalize_root_path_and_tracking_only_query(spark):
    out = _norm(
        spark,
        [
            "http://h.com",  # empty path -> '/'
            "http://h.com/?utm_campaign=a&gclid=b&ref=c",  # query vanishes
            "http://h.com/x//",  # collapse trailing slashes only
        ],
    )
    assert out[0] == "http://h.com/"
    assert out[1] == "http://h.com/"
    assert out[2] == "http://h.com/x"


def test_registered_domain(spark):
    df = spark.createDataFrame(
        [
            (0, "http://www.site5.co.uk/x"),
            (1, "https://a.b.deep.site.com/"),
            (2, "http://localhost/"),
            (3, "http://example.org:8080/y"),
        ],
        ["doc_id", "url"],
    )
    rows = df.select("doc_id", registered_domain("url").alias("d")).collect()
    got = {r["doc_id"]: r["d"] for r in rows}
    assert got == {0: "site5.co.uk", 1: "site.com", 2: "localhost", 3: "example.org"}


def test_url_dedup_keep_first(spark):
    docs = spark.createDataFrame(
        [
            (0, "http://A.com/x?b=2&a=1"),
            (1, "HTTP://a.COM:80/x/?a=1&b=2&utm_source=t"),  # same page as 0
            (2, "http://a.com/x?a=1&b=2&page=2"),  # distinct (real param)
        ],
        ["doc_id", "url"],
    )
    rows = {r["doc_id"]: r.asDict() for r in url_dedup(docs).collect()}
    assert rows[0]["keep"] == 1 and rows[0]["group_size"] == 2
    assert rows[1]["keep"] == 0 and rows[1]["url_norm"] == rows[0]["url_norm"]
    assert rows[2]["keep"] == 1 and rows[2]["group_size"] == 1


def test_domain_caps(spark):
    docs = spark.createDataFrame(
        [(i, f"http://www.big.com/p{i}") for i in range(5)]
        + [(9, "http://small.org/only")],
        ["doc_id", "url"],
    )
    rows = {r["doc_id"]: r.asDict() for r in domain_caps(docs, max_per_domain=3).collect()}
    assert [rows[i]["keep"] for i in range(5)] == [1, 1, 1, 0, 0]
    assert rows[0]["domain"] == "big.com" and rows[0]["domain_docs"] == 5
    assert rows[9] == {
        "doc_id": 9,
        "domain": "small.org",
        "domain_docs": 1,
        "rank_in_domain": 1,
        "keep": 1,
    }


def test_normalize_is_idempotent(spark):
    urls = [
        "HTTP://WWW.Site.COM:80/a/b/?b=2&a=1&utm_source=x#frag",
        "https://h.example.org:443/p?z=1",
        "http://h.com",
    ]
    once = _norm(spark, urls)
    twice = _norm(spark, once)
    assert once == twice


GOOD_PAGE = (
    "the quick brown fox jumps over that lazy dog and keeps running with "
    "steady pace. every sentence here ends with clear marks and offers "
    "enough variety to pass. writing long natural text with many different "
    "words takes a little effort. the final section closes with one more "
    "complete thought for good measure. short lines still count when they "
    "end properly."
)  # 60 words, 5 sentences: passes gopher quality, repetition, and C4


def test_curate_web_pipeline(spark):
    from fulltextsearch_spark.operators.curation import curate_web

    rep_page = ("spam ham " * 30).strip() + "."
    rows = [
        (0, "http://big.com/p0", GOOD_PAGE),
        (1, "HTTP://BIG.com:80/p0?utm_source=x", GOOD_PAGE),  # refetch of 0
        (2, "http://big.com/p2", GOOD_PAGE),
        (3, "http://big.com/p3", GOOD_PAGE),
        (4, "http://big.com/p4", GOOD_PAGE),  # 4th unique page on big.com
        (5, "http://other.org/p5", rep_page),  # repetition fail
        (6, "http://other.org/p6", "tiny doc."),  # gopher fail
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    out = {r["doc_id"]: r.asDict() for r in curate_web(df, max_per_domain=3).collect()}

    assert out[0]["url_keep"] == 1 and out[0]["domain_rank"] == 1 and out[0]["keep"] == 1
    # the refetch is dropped AND consumes no domain budget
    assert out[1]["url_keep"] == 0 and out[1]["domain_rank"] == 0 and out[1]["keep"] == 0
    assert out[2]["domain_rank"] == 2 and out[2]["keep"] == 1
    assert out[3]["domain_rank"] == 3 and out[3]["keep"] == 1
    assert out[4]["domain_rank"] == 4 and out[4]["domain_keep"] == 0 and out[4]["keep"] == 0
    assert out[4]["gopher_pass"] == 1  # only the cap failed it
    assert out[5]["url_keep"] == 1 and out[5]["repetition_pass"] == 0 and out[5]["keep"] == 0
    assert out[6]["gopher_pass"] == 0 and out[6]["keep"] == 0


def test_curate_web_text_never_crosses_exchange(spark):
    """Pin the scale claim: the only wide ops are the two short-key windows
    (plus any caller-side sort), and neither text nor url columns survive
    into an exchange input."""
    from fulltextsearch_spark.operators.curation import curate_web

    df = curate_web(
        spark.createDataFrame(
            [(0, "http://a.com/x", "some text here")], ["doc_id", "url", "text"]
        )
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # every Exchange node's output row: partitioning key must be _uh/_domain
    exchanges = re.findall(r"Exchange (\w+)partitioning\(([^,)]+)", plan)
    assert len(exchanges) == 2, plan[:2000]
    keys = sorted(arg for _, arg in exchanges)
    assert keys[0].startswith("_domain") and keys[1].startswith("_uh"), keys
    # the projected attribute sets flowing through the exchanges carry flags,
    # never the text/url payload columns
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line and "url#" not in line, line


def test_schemeless_urls_parse_as_http_and_stay_distinct(spark):
    # Messy crawl data: no scheme. Each must normalize to its own canonical
    # form (implicit http), NOT collapse into one ':///' group.
    out = _norm(
        spark,
        [
            "example.com/a",
            "other.org/b?utm_source=x",
            "EXAMPLE.COM:80/a/",
        ],
    )
    assert out[0] == "http://example.com/a"
    assert out[1] == "http://other.org/b"
    assert out[2] == "http://example.com/a"  # same page as row 0

    df = spark.createDataFrame(
        [(0, "example.com/a"), (1, "other.org/b"), (2, "http://example.com/a")],
        ["doc_id", "url"],
    )
    dd = {r["doc_id"]: r for r in url_dedup(df).collect()}
    assert dd[1]["keep"] == 1 and dd[1]["group_size"] == 1
    assert {dd[0]["keep"], dd[2]["keep"]} == {0, 1} and dd[0]["group_size"] == 2

    doms = {
        r["doc_id"]: r["domain"]
        for r in df.select(
            "doc_id", registered_domain("url").alias("domain")
        ).collect()
    }
    assert doms == {0: "example.com", 1: "other.org", 2: "example.com"}


def test_fragment_question_mark_is_not_a_query(spark):
    # a '?' that first appears inside the fragment is fragment content;
    # resurrecting it as query params would split/merge dedup groups
    out = _norm(
        spark,
        [
            "http://ex.com/a#sec?x=1",
            "http://ex.com/a",
            "http://ex.com/a?x=1",
        ],
    )
    assert out[0] == "http://ex.com/a"
    assert out[0] == out[1]
    assert out[2] == "http://ex.com/a?x=1"  # real query still survives


def test_valueless_tracking_params_are_stripped(spark):
    out = _norm(
        spark,
        [
            "http://ex.com/a?fbclid",
            "http://ex.com/a?utm_source",
            "http://ex.com/a?ref&c=3",
            "http://ex.com/a?reference=x",  # NOT a tracker (key != ref)
        ],
    )
    assert out[0] == "http://ex.com/a"
    assert out[1] == "http://ex.com/a"
    assert out[2] == "http://ex.com/a?c=3"
    assert out[3] == "http://ex.com/a?reference=x"


def test_registered_domain_ip_literal_and_trailing_dot(spark):
    df = spark.createDataFrame(
        [
            (0, "http://10.2.0.1/x"),
            (1, "http://7.7.0.1:8080/y"),
            (2, "http://example.com./z"),  # trailing root-dot
            (3, "http://sub.example.com/z"),
        ],
        ["doc_id", "url"],
    )
    doms = {
        r["doc_id"]: r["domain"]
        for r in df.select("doc_id", registered_domain("url").alias("domain")).collect()
    }
    assert doms[0] == "10.2.0.1"  # an IP is its own domain
    assert doms[1] == "7.7.0.1"
    assert doms[2] == "example.com"
    assert doms[3] == "example.com"
    caps = {r["doc_id"]: r for r in domain_caps(df, max_per_domain=1).collect()}
    assert caps[0]["keep"] == 1 and caps[1]["keep"] == 1  # distinct IP domains
    assert caps[2]["keep"] == 1 and caps[3]["keep"] == 0  # same domain, capped
