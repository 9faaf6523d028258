"""Temperature mixing weights and deterministic stratified sampling —
pinned against hashlib/brute-force recomputation.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def test_mix_weights_matches_brute(spark):
    from fulltextsearch_spark.operators.sampling import mix_weights

    rows = [("en", i) for i in range(70)] + [("de", i) for i in range(20)] + [
        ("yo", i) for i in range(10)
    ]
    docs = spark.createDataFrame(rows, ["lang", "i"])
    alpha = 0.3
    got = {r["key"]: r.asDict() for r in mix_weights(docs, "lang", alpha).collect()}
    counts = {"en": 70, "de": 20, "yo": 10}
    total = sum(counts.values())
    pa = {k: (v / total) ** alpha for k, v in counts.items()}
    z = sum(pa.values())
    for k, n in counts.items():
        g = got[k]
        assert g["n_docs"] == n
        assert g["p"] == pytest.approx(n / total, rel=1e-12)
        assert g["weight"] == pytest.approx(pa[k] / z, rel=1e-12)
        assert g["expected_docs"] == pytest.approx(pa[k] / z * total, rel=1e-12)
    # temperature flattens: low-resource bucket gains share vs natural
    assert got["yo"]["weight"] > got["yo"]["p"]
    assert got["en"]["weight"] < got["en"]["p"]
    s = sum(g["weight"] for g in got.values())
    assert s == pytest.approx(1.0, rel=1e-12)


def test_mix_weights_alpha_one_is_natural(spark):
    from fulltextsearch_spark.operators.sampling import mix_weights

    docs = spark.createDataFrame(
        [("a", 0), ("a", 1), ("a", 2), ("b", 3)], ["k", "i"]
    )
    got = {r["key"]: r.asDict() for r in mix_weights(docs, "k", alpha=1.0).collect()}
    assert got["a"]["weight"] == pytest.approx(0.75, rel=1e-12)
    assert got["b"]["weight"] == pytest.approx(0.25, rel=1e-12)


def test_mix_weights_rejects_bad_alpha(spark):
    from fulltextsearch_spark.operators.sampling import mix_weights

    docs = spark.createDataFrame([("a", 0)], ["k", "i"])
    with pytest.raises(ValueError):
        mix_weights(docs, "k", alpha=0.0)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_sample_hash_matches_hashlib(spark):
    from fulltextsearch_spark.operators.sampling import sample_hash_col

    ids = list(range(50))
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", sample_hash_col(F.col("doc_id")).alias("h")).collect()
    }
    for i in ids:
        assert got[i] == _h32(str(i)), i


def test_stratified_sample_deterministic_and_rate_correct(spark):
    from fulltextsearch_spark.operators.sampling import stratified_sample

    n = 2000
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(n)]
    docs = spark.createDataFrame(rows, ["doc_id", "bucket"])
    rates = spark.createDataFrame([("a", 0.25), ("b", 1.0)], ["key", "rate"])
    kept = stratified_sample(docs, rates, "bucket").collect()
    got_ids = sorted(r["doc_id"] for r in kept)
    want_ids = sorted(
        i
        for i, b in rows
        if _h32(str(i)) < {"a": 0.25, "b": 1.0}[b] * (1 << 32)
    )
    assert got_ids == want_ids
    # every b-doc survives (rate 1.0); a-docs are ~25%
    n_b = sum(1 for i, b in rows if b == "b")
    assert sum(1 for r in kept if r["bucket"] == "b") == n_b
    n_a_kept = sum(1 for r in kept if r["bucket"] == "a")
    assert 0.18 * n / 2 < n_a_kept < 0.32 * n / 2
    # re-running with a different partitioning keeps EXACTLY the same docs
    kept2 = stratified_sample(docs.repartition(7), rates, "bucket").collect()
    assert sorted(r["doc_id"] for r in kept2) == got_ids


# --- leakage-safe group split ------------------------------------------------


def test_group_split_no_group_straddles(spark):
    from pyspark.sql import functions as F

    from fulltextsearch_spark.operators.sampling import group_split

    rows = [(i, f"site{i % 23}.com") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id LONG, domain STRING")
    out = group_split(df, "domain", weights=(0.7, 0.15, 0.15))
    per = out.groupBy("domain").agg(F.countDistinct("split").alias("n")).collect()
    assert all(r["n"] == 1 for r in per)
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits


def test_group_split_stable_and_growth_safe(spark):
    """Same (salt, group) -> same split, independent of the rest of the
    corpus: adding new docs/domains never moves an existing domain."""
    from fulltextsearch_spark.operators.sampling import group_split

    small = spark.createDataFrame(
        [(i, f"d{i}.org") for i in range(50)], "doc_id LONG, domain STRING"
    )
    big = spark.createDataFrame(
        [(i, f"d{i}.org") for i in range(200)], "doc_id LONG, domain STRING"
    )
    a = {r["domain"]: r["split"] for r in group_split(small, "domain").collect()}
    b = {r["domain"]: r["split"] for r in group_split(big, "domain").collect()}
    assert all(b[d] == s for d, s in a.items())
    # a different salt is a fresh assignment
    c = {r["domain"]: r["split"]
         for r in group_split(small, "domain", salt="v2").collect()}
    assert any(c[d] != a[d] for d in a)


def test_group_split_weights_roughly_respected(spark):
    from fulltextsearch_spark.operators.sampling import group_split

    df = spark.createDataFrame(
        [(i, f"g{i}") for i in range(3000)], "doc_id LONG, domain STRING"
    )
    out = group_split(df, "domain", weights=(0.8, 0.1, 0.1))
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert abs(counts["train"] / 3000 - 0.8) < 0.05
    assert abs(counts.get("val", 0) / 3000 - 0.1) < 0.03
    assert abs(counts.get("test", 0) / 3000 - 0.1) < 0.03


def test_group_split_validation(spark):
    import pytest as _pytest

    from fulltextsearch_spark.operators.sampling import group_split

    df = spark.createDataFrame([(0, "a")], "doc_id LONG, domain STRING")
    with _pytest.raises(ValueError):
        group_split(df, "domain", weights=(0.5,), names=("a", "b"))
    with _pytest.raises(ValueError):
        group_split(df, "domain", weights=(-1.0, 2.0), names=("a", "b"))
