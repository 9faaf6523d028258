"""Count-min sketch: one-sided error, partition-invariant merge, exactness
at collision-free width."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fulltextsearch_spark.operators.sketches import cms_build, cms_estimate


def _counts(spark, n_terms=60, seed=5):
    rng = random.Random(seed)
    rows = [(f"term{i:03d}", rng.randrange(1, 500)) for i in range(n_terms)]
    return spark.createDataFrame(rows, ["term", "cnt"]), dict(rows)


def test_one_sided_overcount_and_total_mass(spark):
    df, truth = _counts(spark)
    cms = cms_build(df, depth=3, width=8, seed=11)
    # every row of the sketch carries the full mass
    mass = {r["depth"]: r["tot"] for r in
            cms.groupBy("depth").agg(F.sum("total").alias("tot")).collect()}
    assert set(mass.values()) == {sum(truth.values())}
    est = {
        r["term"]: r["cms_est"]
        for r in cms_estimate(cms, df.select("term"), depth=3, width=8,
                              seed=11).collect()
    }
    assert set(est) == set(truth)
    assert all(est[t] >= truth[t] for t in truth)  # never under-counts
    assert any(est[t] > truth[t] for t in truth)  # width 8 forces collisions


def test_merge_is_partition_invariant(spark):
    df, _ = _counts(spark)
    one = cms_build(df.coalesce(1), depth=4, width=32, seed=3)
    many = cms_build(df.repartition(13), depth=4, width=32, seed=3)
    key = lambda r: (r["depth"], r["bucket"], r["total"])  # noqa: E731
    assert sorted(map(key, one.collect())) == sorted(map(key, many.collect()))


def test_exact_when_collision_free(spark):
    df, truth = _counts(spark, n_terms=20)
    cms = cms_build(df, depth=5, width=4096, seed=2)
    est = {
        r["term"]: r["cms_est"]
        for r in cms_estimate(cms, df.select("term"), depth=5, width=4096,
                              seed=2).collect()
    }
    assert est == truth


def test_absent_term_estimates_zero_on_empty_cells(spark):
    df = spark.createDataFrame([("onlyterm", 9)], ["term", "cnt"])
    cms = cms_build(df, depth=3, width=4096, seed=1)
    probe = spark.createDataFrame([("missing",)], ["term"])
    rows = cms_estimate(cms, probe, depth=3, width=4096, seed=1).collect()
    assert rows[0]["cms_est"] == 0  # 4096 buckets, 3 cells: empty-cell min


# ---------------------------------------------------------------------------
# HyperLogLog (reference hyperloglog.hpp:7-53 — m=64 registers)
# ---------------------------------------------------------------------------

def _values(spark, n=5000, dupes=3, seed=9):
    rng = random.Random(seed)
    rows = [(f"v{i:05d}",) for i in range(n)] * dupes
    rng.shuffle(rows)
    return spark.createDataFrame(rows, ["term"])


def test_hll_duplicates_do_not_change_registers(spark):
    from fulltextsearch_spark.operators.sketches import hll_build

    once = spark.createDataFrame([(f"v{i:05d}",) for i in range(500)], ["term"])
    thrice = _values(spark, n=500, dupes=3)
    key = lambda r: (r["idx"], r["rho"])  # noqa: E731
    assert sorted(map(key, hll_build(once).collect())) == sorted(
        map(key, hll_build(thrice).collect())
    )


def test_hll_merge_is_partition_invariant(spark):
    from fulltextsearch_spark.operators.sketches import hll_build

    df = _values(spark, n=2000, dupes=1)
    key = lambda r: (r["idx"], r["rho"])  # noqa: E731
    assert sorted(map(key, hll_build(df.coalesce(1)).collect())) == sorted(
        map(key, hll_build(df.repartition(17)).collect())
    )


def test_hll_estimate_within_theory_bounds(spark):
    from fulltextsearch_spark.operators.sketches import hll_build, hll_estimate

    n = 5000
    est = hll_estimate(hll_build(_values(spark, n=n))).collect()[0]
    assert est["m"] == 64 and est["v_zero"] == 0
    # sigma = 1.04/sqrt(64) = 13% — 4 sigma is a generous deterministic bound
    assert abs(est["hll_est"] - n) / n < 0.52
    # harmonic_scaled is the exact integer 2^43 * sum(2^-rho)
    regs = {r["idx"]: r["rho"] for r in hll_build(_values(spark, n=n)).collect()}
    expect = sum(1 << (43 - regs.get(i, 0)) for i in range(64))
    assert est["harmonic_scaled"] == expect


def test_hll_union_semantics(spark):
    """Sketching A union B == register-wise max of sketch(A), sketch(B)."""
    from fulltextsearch_spark.operators.sketches import hll_build

    a = spark.createDataFrame([(f"a{i}",) for i in range(800)], ["term"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(800)], ["term"])
    both = hll_build(a.union(b))
    merged = (
        hll_build(a)
        .union(hll_build(b))
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    )
    key = lambda r: (r["idx"], r["rho"])  # noqa: E731
    assert sorted(map(key, both.collect())) == sorted(map(key, merged.collect()))


def test_keyed_hll_matches_per_key_single_sketch(spark):
    """Grouped HLL == running the single-key sketch per group, and the
    arithmetic absent-register fold == the grid-join estimate."""
    from fulltextsearch_spark.operators.sketches import (
        hll_build,
        hll_build_keyed,
        hll_estimate,
        hll_estimate_keyed,
    )

    rows = [("a", f"x{i}") for i in range(700)] + [
        ("b", f"y{i}") for i in range(90)
    ] + [("b", f"x{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "key STRING, term STRING")
    keyed = hll_estimate_keyed(hll_build_keyed(df, "key")).collect()
    got = {r["key"]: (r["v_zero"], r["harmonic_scaled"], r["hll_est"]) for r in keyed}
    for k in ("a", "b"):
        single = hll_estimate(
            hll_build(df.where(F.col("key") == k).select("term"))
        ).collect()[0]
        assert got[k] == (
            single["v_zero"], single["harmonic_scaled"], single["hll_est"]
        ), k
