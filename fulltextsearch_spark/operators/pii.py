"""PII scrubbing: regex redaction of emails / phones / IPs over a corpus.

The standard pre-training curation stage (C4 and the BigScience/ROOTS
pipeline both ship one): personally-identifying strings are replaced with
fixed placeholder tokens before any downstream tokenization, and per-doc hit
counts are kept for curation metrics. Patterns are deliberately conservative
ASCII classics — the point of this operator is the *plumbing* (rewrite +
count in one projection, order-of-application pinned), not NLP-grade NER:

* email   — ``[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}``   -> ``<EMAIL>``
* ipv4    — ``\\b(\\d{1,3}\\.){3}\\d{1,3}\\b``           -> ``<IP>``
* phone   — ``\\b\\+?\\d[\\d -]{7,14}\\d\\b``            -> ``<PHONE>``

Application order is email, then ip, then phone (emails can contain digit
runs a phone pattern would chew; IPs would otherwise match the phone rule's
digit-run core). Each pattern uses the portable regex subset that means the
same thing to Java's engine (Spark) and RE2 (DuckDB), so the oracle replays
the rewrite verbatim.

Scale shape: pure ``regexp_replace``/``regexp_count`` Column expressions —
one narrow whole-stage-codegen projection over the corpus, zero shuffles,
zero Python. At 100 TB this runs at scan speed; counts aggregate with
map-side partials if a corpus total is wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "scrub_pii"]

# (name, regex, replacement) in application order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\+?\d[\d -]{7,14}\d\b", "<PHONE>"),
]


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, text, ...) -> (doc_id, text, n_email, n_ip, n_phone).

    ``text`` is the redacted rewrite; ``n_*`` count the hits each pattern
    redacted (counted against the text AS THAT PATTERN SEES IT — i.e. after
    the earlier patterns' replacements, matching the rewrite exactly).
    """
    out = docs
    counts = []
    cur = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        counts.append((f"n_{name}", F.regexp_count(cur, F.lit(pat))))
        cur = F.regexp_replace(cur, pat, repl)
    out = out.withColumn("_scrubbed", cur)
    for cname, cexpr in counts:
        out = out.withColumn(cname, cexpr.cast("long"))
    return out.drop(text_col).withColumnRenamed("_scrubbed", text_col).select(
        "doc_id", text_col, "n_email", "n_ip", "n_phone"
    )
