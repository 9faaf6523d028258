#!/usr/bin/env python3
"""Interleaved head-to-head: this repo's fused Spark build vs the compiled
reference C++ engine, same corpus, same pinned core counts, reps alternated
engine-by-engine so VM-capacity drift hits both sides equally.

Prereqs: `bash scripts/ref_bench/build_and_run.sh <docs>` has produced
/tmp/ref_build/ref_fts + corpus<docs>.bin, and the parquet corpus exists at
$SPARK_GRAFT_BENCH_CACHE/webspark<docs> (scaling_bench's ensure_corpus).

    python scripts/ref_bench/head_to_head.py [--docs 400000] [--cores 8,2]
    [--repeat 3]

Writes BENCH/head_to_head.json, prints one JSON line. Spark child mode
(--child N) builds once warm + once measured and prints the seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
SCRATCH = "/tmp/ref_build"


def spark_child(cpus: int, corpus: str) -> None:
    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.operators.compressed_index import (
        build_compressed_index_pyfiles,
    )
    from fulltextsearch_spark.session import get_spark

    spark = get_spark(
        app_name=f"h2h-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    cfg = EngineConfig(k1=1.2, b=0.75, k=10, stem=True)
    warm = build_compressed_index_pyfiles(spark, corpus, cfg)
    warm.postings.count()
    warm.postings.unpersist()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    c = build_compressed_index_pyfiles(spark, corpus, cfg)
    c.postings.count()
    print(json.dumps({"spark_build_seconds": round(time.perf_counter() - t0, 3)}))
    spark.stop()


def run_ref(cpus: int, docs: int) -> float:
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}",
        f"{SCRATCH}/ref_fts", f"{SCRATCH}/corpus{docs}.bin",
        f"{SCRATCH}/queries.txt", "10", "1.2", "0.75",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True).stdout
    m = re.search(r"BUILD_SECONDS\s+([0-9.]+)", out)
    return float(m.group(1))


def run_spark(cpus: int, corpus: str, docs: int) -> float:
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}", sys.executable,
        os.path.abspath(__file__), "--child", str(cpus), "--corpus", corpus,
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True, cwd=REPO
    ).stdout
    return json.loads(out.strip().splitlines()[-1])["spark_build_seconds"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400000)
    ap.add_argument("--cores", default="8,2")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--corpus", default=None)
    args = ap.parse_args()

    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/fts_bench_cache")
    corpus = args.corpus or os.path.join(cache, f"webspark{args.docs}")
    if args.child is not None:
        spark_child(args.child, corpus)
        return

    runs = []
    for rep in range(args.repeat):
        for cpus in [int(c) for c in args.cores.split(",")]:
            ref_s = run_ref(cpus, args.docs)
            spark_s = run_spark(cpus, corpus, args.docs)
            runs.append(
                {
                    "rep": rep,
                    "cpus": cpus,
                    "ref_build_seconds": ref_s,
                    "spark_build_seconds": spark_s,
                    "ratio": round(spark_s / ref_s, 3),
                }
            )
            print(json.dumps(runs[-1]), flush=True)

    best: dict[int, dict] = {}
    for r in runs:
        ratios = sorted(x["ratio"] for x in runs if x["cpus"] == r["cpus"])
        best[r["cpus"]] = {
            "ref_best": min(x["ref_build_seconds"] for x in runs if x["cpus"] == r["cpus"]),
            "spark_best": min(
                x["spark_build_seconds"] for x in runs if x["cpus"] == r["cpus"]
            ),
            "median_ratio": ratios[len(ratios) // 2],
        }
    summary = {
        "metric": "fused Spark build vs reference C++ build, interleaved",
        "docs": args.docs,
        "runs": runs,
        "per_cores": {str(k): v for k, v in sorted(best.items())},
        "best_ratio": {
            str(k): round(v["spark_best"] / v["ref_best"], 3)
            for k, v in sorted(best.items())
        },
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "head_to_head.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
