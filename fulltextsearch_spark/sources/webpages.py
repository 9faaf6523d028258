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

_BURSTY_CACHE: tuple[list[str], list[float]] | None = None


def _bursty_vocab() -> tuple[list[str], list[float]]:
    """Vocabulary for the ``bursty=True`` corpus: a 60k-type Zipf tail
    (alpha 1.05) with the QUERY_SET words placed at deliberate ranks from
    ~28 up to 28,000, so query terms have doc frequencies spanning ~10%
    down to ~0.01% and therefore SPREAD IDFs (~2..9); the remaining named
    words get log-spaced filler ranks 150..~20,000. (The flat 200-word
    vocab makes every query term an equal-UB head term — MaxScore term
    skipping mathematically cannot engage there; real web vocabularies put
    query terms mid-frequency.) Cumulative weights are precomputed once so
    per-doc sampling is O(types x log V) bisects, not O(V)."""
    global _BURSTY_CACHE  # noqa: PLW0603
    if _BURSTY_CACHE is None:
        import itertools

        named = [w for w in _VOCAB if not w.startswith("word")]
        vocab = [f"w{i}" for i in range(60_000)]
        # QUERY_SET words get deliberate ranks so each multi-term bench query
        # mixes a genuinely RARE anchor term (df ~50-300 at 400k docs —
        # processed first by MaxScore, its df bounds the candidate set) with
        # VERY COMMON terms (df ~4-10%, hundreds of 128-posting blocks —
        # what candidates-only block skipping then avoids decoding; skipping
        # is only possible when candidates << common-term blocks). This is
        # the realistic shape: web query terms span df 10%..0.01%
        # (idf ~2..9), not a flat 200-word head.
        ranks = {
            "salmon": 39, "swimming": 28, "national": 76, "com": 85,
            "running": 100, "www": 200, "nation": 600, "rational": 2000,
            "cat": 12_000, "eats": 14_000, "day": 14_600, "swimmer": 18_000,
            "fresh": 19_300, "communication": 20_000, "hoping": 25_000,
            "hopeful": 26_000, "hope": 28_000,
        }
        rest = [w for w in named if w not in ranks]
        # remaining named words: log-spaced filler ranks, deterministic order
        perm = list(range(len(rest)))
        random.Random(1234).shuffle(perm)
        for j, w in enumerate(rest):
            ranks[w] = int(150 * (130 ** (perm[j] / max(len(rest) - 1, 1))))
        for w, r in sorted(ranks.items(), key=lambda kv: kv[1]):
            vocab.insert(min(r, len(vocab)), w)
        weights = [1.0 / (i + 1) ** 1.05 for i in range(len(vocab))]
        cum = list(itertools.accumulate(weights))
        _BURSTY_CACHE = (vocab, cum)
    return _BURSTY_CACHE
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


def generate_webpages_pdf(n_docs: int, seed: int = 42, bursty: bool = False) -> pd.DataFrame:
    """``bursty=False`` (default) is the original flat-tf corpus: words drawn
    i.i.d. Zipf, so within-doc tf is almost always 1 and doc lengths are
    uniform 20-120 — every posting block looks alike and block-max pruning
    has nothing to separate.

    ``bursty=True`` adds the two dispersion properties real web text has
    (Church & Gale 1995 term burstiness; lognormal page lengths): a document
    first samples word TYPES (Zipf with replacement, so head types repeat
    beyond the burst mechanism), then each sampled type's occurrence count
    is 1 almost always but occasionally runs hot (a deep burst), and doc
    length is lognormal. Both high-impact events (deep burst, very short
    page) are per-posting-rare, so 128-posting block maxima separate and
    safe pruning can skip — the corpus the WAND/MaxScore benches use, over
    the spread-df vocabulary of :func:`_bursty_vocab`.
    """
    rng = random.Random(seed)
    epoch = _dt.datetime(2024, 1, 1)
    # Zipf-ish sampling weights over the vocabulary (alpha ~= 1.1).
    weights = [1.0 / (i + 1) ** 1.1 for i in range(len(_VOCAB))]
    rows = []
    for i in range(n_docs):
        if bursty:
            bv, bcum = _bursty_vocab()
            n_types = max(6, min(300, int(rng.lognormvariate(3.5, 0.7))))
            types = rng.choices(bv, cum_weights=bcum, k=n_types)
            words = []
            for t in types:
                r = rng.random()
                if r < 0.0015:  # rare deep burst: tf 6..~45, saturates BM25
                    c = 6 + int(rng.expovariate(0.12))
                elif r < 0.04:  # mild repetition
                    c = 2
                else:
                    c = 1
                words.extend([t] * min(c, 48))
            rng.shuffle(words)
        else:
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
