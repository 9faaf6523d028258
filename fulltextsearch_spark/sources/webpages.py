"""Deterministic synthetic Common-Crawl-style webpages corpus.

Matches the driver input_hint schema exactly:
``(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)``.
Generated per FIXTURES.md: Zipf-skewed vocabulary with a head term in nearly
every document (exercises the salted merge), per-doc rare marker tokens,
stop words, special word-chars ``$ % & + @``, and occasional non-ASCII words
(which the tokenizer must treat as delimiters).

Everything is seeded — same (n_docs, seed) -> byte-identical corpus — so
tests and benches are reproducible without external data.
"""

from __future__ import annotations

import datetime as _dt
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["WEBPAGES_SCHEMA", "generate_webpages_pdf", "generate_webpages", "QUERY_SET"]

WEBPAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_VOCAB = [
    # content words (Zipf-ranked); includes stemmable families
    "http", "www", "com", "page", "search", "engine", "index", "data", "web",
    "cat", "salmon", "fresh", "eats", "day", "running", "jumped", "quickly",
    "nation", "national", "rational", "generate", "generous", "communication",
    "fish", "river", "ocean", "water", "swim", "swimming", "swimmer",
    "happy", "happily", "happiness", "beauty", "beautiful", "relation",
    "relational", "connection", "connected", "connecting", "luxuriated",
    "hope", "hoping", "hopped", "hopping", "tied", "ties", "cries", "cried",
    "agreed", "agreement", "feed", "breed", "news", "skies", "dying",
    "organization", "optimization", "conditional", "sensational", "activate",
    "adjustment", "dependent", "adoption", "communism", "formalize",
    "electrical", "hopeful", "goodness", "revival", "allowance", "inference",
    "airliner", "gyroscopic", "adjustable", "defensible", "irritant",
    "replacement", "homologous", "effective", "bowdlerize",
] + [f"word{i}" for i in range(130)]

_STOPS = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "with", "was", "on"]
_SPECIAL = ["c++", "a+b", "100%", "$100", "@user", "me&you", "r&d", "$ave", "50%off"]
_NONASCII = ["résumé", "naïve", "café", "über", "日本語"]

# Reference evaluation queries (scripts/evaluation.ipynb) + semantics probes.
QUERY_SET = [
    ("q01", "cat"),
    ("q02", "cat salmon"),
    ("q03", "cat salmon fresh"),
    ("q04", "my cat eats a salmon a day"),
    ("q05", "salmon salmon"),  # duplicate-token accumulation
    ("q06", "the and of"),  # stop-words only -> empty
    ("q07", "zzzunknownzzz"),  # unknown term -> empty
    ("q08", "running"),  # stem match (run- family)
    ("q09", "$100 r&d"),  # special word chars
    ("q10", "national communication"),
    ("q11", "http www com"),  # head terms (skew path)
    ("q12", "swimming swimmer hoping"),
]


def generate_webpages_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    rng = random.Random(seed)
    epoch = _dt.datetime(2024, 1, 1)
    # Zipf-ish sampling weights over the vocabulary (alpha ~= 1.1).
    weights = [1.0 / (i + 1) ** 1.1 for i in range(len(_VOCAB))]
    rows = []
    for i in range(n_docs):
        n_words = rng.randint(20, 120)
        words = rng.choices(_VOCAB, weights=weights, k=n_words)
        # head term in ~95% of docs (skew driver)
        if rng.random() < 0.95:
            words.insert(rng.randrange(len(words) + 1), "http")
        # per-doc rare marker (unique-ish tail)
        words.insert(rng.randrange(len(words) + 1), f"marker{i}")
        for _ in range(rng.randint(2, 6)):
            words.insert(rng.randrange(len(words) + 1), rng.choice(_STOPS))
        for _ in range(rng.randint(1, 2)):
            words.insert(rng.randrange(len(words) + 1), rng.choice(_SPECIAL))
        if rng.random() < 0.2:
            words.insert(rng.randrange(len(words) + 1), rng.choice(_NONASCII))
        text = " ".join(words)
        url = f"https://example{i % 1000}.com/page/{i:08d}"
        rows.append(
            {
                "url": url,
                "warc_ts": epoch + _dt.timedelta(seconds=i),
                "html": ("<html><body>" + text + "</body></html>").encode(),
                "text": text,
                "lang": "en" if rng.random() < 0.95 else rng.choice(["de", "es"]),
            }
        )
    return pd.DataFrame(rows)


def generate_webpages(
    spark: SparkSession, n_docs: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    pdf = generate_webpages_pdf(n_docs, seed)
    df = spark.createDataFrame(pdf, schema=WEBPAGES_SCHEMA)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def write_webpages_chunked(spark: SparkSession, path: str, n_docs: int, chunk: int = 10_000) -> None:
    """Write a large corpus in parallel, byte-identical to the serial
    chunked generator (``bench._ensure_web_corpus``): chunk ``p`` is
    ``generate_webpages_pdf(chunk, seed=42+p)`` with urls rebased to
    ``/p{p}/`` (globally unique). Chunk generation is seeded per index, so
    the result is independent of partitioning — safe to fan out.
    """
    import pandas as pd  # noqa: PLC0415

    n_chunks = (n_docs + chunk - 1) // chunk

    def _gen(batches):
        for pdf in batches:
            for part in pdf["id"]:
                part = int(part)
                n = min(chunk, n_docs - part * chunk)
                out = generate_webpages_pdf(n, seed=42 + part)
                out["url"] = out["url"].str.replace("/page/", f"/p{part}/", regex=False)
                out["warc_ts"] = out["warc_ts"].astype("datetime64[us]")
                yield out

    (
        spark.range(n_chunks)
        .repartition(min(n_chunks, spark.sparkContext.defaultParallelism * 2))
        .mapInPandas(_gen, schema=WEBPAGES_SCHEMA)
        .write.mode("overwrite")
        .parquet(path)
    )
