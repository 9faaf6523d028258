"""HTML -> text extraction: the leg of the web-page contract upstream of
tokenization.

The input schema carries both ``html BINARY`` and ``text STRING``
(sources/webpages.py, the driver input_hint); this operator defines the
deterministic extraction that produces the latter from the former — the
"byte-identical extracted text per url" invariant the north star pins. It
is the jusText/trafilatura slot of the published pipelines (CCNet, C4,
RefinedWeb all begin with an HTML boilerplate strip) reduced to a FIXED,
engine-portable rule chain:

1. decode UTF-8 (invalid bytes dropped),
2. remove ``<script>``/``<style>`` elements, the whole ``<head>``, and
   HTML comments,
3. turn block-level tags (p, div, br, li, h1-6, tr/td/th, table, ul, ol,
   section, article, header, footer) into newlines,
4. strip every remaining tag,
5. decode the fixed entity set (&nbsp; &lt; &gt; &quot; &#39; and, LAST,
   &amp; — the standard order so double-encoded ampersands survive),
6. collapse horizontal whitespace to single spaces, squeeze newline runs,
   and trim.

Every step is a ``regexp_replace``/``replace`` Column — one codegen
projection, ZERO shuffles, no UDF — so at 100 TB extraction fuses into
the scan that reads the WARC-derived table. The regexes are restricted to
the RE2-safe subset (inline ``(?is)`` flags, no backreferences, no
lookaround) so the exact chain replays in the DuckDB oracle; the one
engine difference left open is ``\\s`` on vertical-tab (Java includes
\\x0B, RE2 does not) — no step below uses ``\\s`` for that reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_text_col", "extract_pages", "EXTRACT_STEPS"]

_HWS = "[ \\t\\r\\f]"  # horizontal whitespace (never \s — see module doc)

# (pattern, replacement) applied in order with global replace; patterns are
# RE2-safe and identical across Spark (Java regex) and DuckDB (RE2).
EXTRACT_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script[ \t]*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style[ \t]*>", " "),
    (r"(?is)<head\b[^>]*>.*?</head[ \t]*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (
        r"(?i)</?(p|div|br|li|h[1-6]|tr|td|th|table|ul|ol|section|article|header|footer)\b[^>]*/?>",
        "\n",
    ),
    (r"<[^>]*>", ""),
]

_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # must run last
]


def extract_text_col(html: Column, binary: bool = True) -> Column:
    """Column expression: html (BINARY or STRING) -> extracted plain text."""
    x = F.decode(html, "UTF-8") if binary else html
    for pat, rep in EXTRACT_STEPS:
        x = F.regexp_replace(x, pat, rep)
    for ent, ch in _ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(ch))
    x = F.regexp_replace(x, _HWS + "+", " ")
    x = F.regexp_replace(x, _HWS + r"*\n(" + _HWS + r"|\n)*", "\n")
    return F.regexp_replace(x, r"^[ \n]+|[ \n]+$", "")


def extract_pages(
    pages: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Add/replace ``out_col`` with the extraction of ``html_col``.

    The narrow projection a WARC-backed ingest runs before
    :func:`~fulltextsearch_spark.sources.ingest.assign_dense_doc_ids`.
    """
    binary = dict(pages.dtypes)[html_col] == "binary"
    return pages.withColumn(out_col, extract_text_col(F.col(html_col), binary))
