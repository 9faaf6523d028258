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
