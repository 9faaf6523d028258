#!/usr/bin/env python3
"""The timed job a cluster-scaling level runs via spark-submit.

Submitted by scripts/cluster_bench.py against a standalone master with N
1-core executors; builds the compressed index over the given corpus and runs
the reference query set through block-max WAND. Prints one JSON line.
Master/deploy config comes from spark-submit — this script only declares the
app logic (the spark-submit --py-files contract of the north rule).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--docs", type=int, required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("fts-cluster-scaling").getOrCreate()

    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.operators.compressed_index import (
        build_compressed_index_pyfiles,
    )
    from fulltextsearch_spark.operators.wand import search_wand
    from fulltextsearch_spark.session import get_spark  # noqa: F401  (zip sanity)
    from fulltextsearch_spark.sources.webpages import QUERY_SET

    cfg = EngineConfig(k1=1.2, b=0.75, k=10, stem=True)

    # Same pipeline and warm protocol as scripts/scaling_bench.py (the §2
    # local harness), so the two scaling measurements are comparable:
    # file-order doc_ids from the parquet footer manifest (the reference's
    # own ingest semantic, parquet2parquet.py:8-56 — id assignment happens
    # in an UNTIMED preprocessing script there too), workers reading
    # parquet directly with pyarrow, one full-size warm rep so the measured
    # run is steady-state compute on every executor, not JVM/Python
    # cold-start (at 4 executors a tiny warm slice leaves 3 JVMs cold).
    warm = build_compressed_index_pyfiles(spark, args.corpus, cfg)
    warm.postings.count()
    warm.postings.unpersist()
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    cidx = build_compressed_index_pyfiles(spark, args.corpus, cfg)
    n_terms = cidx.postings.count()
    build_s = time.perf_counter() - t0

    qdf = spark.createDataFrame(QUERY_SET, ["query_id", "content"])
    t0 = time.perf_counter()
    res = search_wand(cidx, qdf, cfg).collect()
    query_s = time.perf_counter() - t0
    results = sorted((r["query_id"], r["rank"], round(r["score"], 6)) for r in res)

    print(
        "CLUSTER_RESULT "
        + json.dumps(
            {
                "docs": args.docs,
                "build_seconds": round(build_s, 3),
                "docs_per_sec": round(args.docs / build_s, 1),
                "query_batch_seconds": round(query_s, 3),
                "ms_per_query": round(query_s / len(QUERY_SET) * 1000, 1),
                "n_terms": n_terms,
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
