"""HTML -> text extraction: handcrafted cases and the byte-identical
round-trip over the synthetic webpages corpus."""

from __future__ import annotations

from fulltextsearch_spark.operators.extract import extract_pages, extract_text_col


def _run(spark, html: str) -> str:
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(html,)], "h STRING")
    return df.select(extract_text_col(F.col("h"), binary=False).alias("t")).collect()[
        0
    ]["t"]


def test_script_style_head_comments_removed(spark):
    html = (
        "<html><head><title>SKIP</title><style>p{x:1}</style></head>"
        "<body><script>if (a < b && c) { d(); }</script>"
        "<!-- hidden -->visible</body></html>"
    )
    assert _run(spark, html) == "visible"


def test_block_tags_become_newlines_inline_tags_vanish(spark):
    html = "<body><p>one <b>bold</b></p><div>two</div><ul><li>x</li><li>y</li></ul></body>"
    assert _run(spark, html) == "one bold\ntwo\nx\ny"


def test_entities_decode_in_standard_order(spark):
    html = "<body>a &amp;amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</body>"
    # &amp;amp; -> &amp; (double-encoded survives one decode round)
    assert _run(spark, html) == "a &amp; b <tag> \"q\" 's' end"


def test_whitespace_collapse_and_trim(spark):
    html = "<body>  \t a   b \r\n<p>  c  </p>\n\n</body>"
    assert _run(spark, html) == "a b\nc"


def test_self_closing_and_attr_tags(spark):
    html = '<body>x<br/>y<img src="u.png">z<p class="a" data-k="v">w</p></body>'
    assert _run(spark, html) == "x\nyz\nw"


def test_generator_roundtrip_byte_identical(spark):
    """The north-star invariant on the synthetic corpus: extracting the html
    column reproduces the text column byte-for-byte for every url."""
    import pyspark.sql.functions as F

    from fulltextsearch_spark.sources.webpages import generate_webpages

    pages = generate_webpages(spark, 200, seed=5, num_partitions=3)
    out = extract_pages(pages.withColumnRenamed("text", "expected"), out_col="got")
    bad = out.where(F.col("got") != F.col("expected")).count()
    assert bad == 0
