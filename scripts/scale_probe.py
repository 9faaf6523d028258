#!/usr/bin/env python3
"""Two-size scale probe with measured shuffle bytes for one pipeline stage.

SCALE.md argues each stage's 100 TB behavior from its shuffle volume; this
script turns that argument into a measurement for the two stages the
round-3 review singled out (MinHash-LSH candidate pairs, IVF-PQ build +
ADC probe): run the SAME stage at two input sizes in fresh sessions with
event logs on, then parse the logs for total shuffle read/write bytes and
report the bytes-per-input-row fit. Near-linear bytes growth (constant
bytes/row) is the property that lets the SCALE.md extrapolation stand.

    python scripts/scale_probe.py --op minhash --sizes 50000,400000
    python scripts/scale_probe.py --op ivfpq  --sizes 2000,20000

Writes BENCH/scale_probe_<op>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/fts_bench_cache")


def _parse_events(log_dir: str) -> dict:
    """Sum shuffle + input metrics over all completed stages of all apps in
    ``log_dir`` (single-app dirs in practice — one session per probe run)."""
    tot = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0, "input_bytes": 0,
           "stages": 0}
    def _read(p: str) -> list[str]:
        if p.endswith(".zstd"):
            import subprocess

            out = subprocess.run(["zstd", "-dc", p], capture_output=True, text=True)
            return out.stdout.splitlines()
        with open(p, errors="replace") as f:
            return f.readlines()

    for name in os.listdir(log_dir):
        path = os.path.join(log_dir, name)
        lines: list[str] = []
        if os.path.isdir(path):
            for p in sorted(os.listdir(path)):
                if p.startswith("events_"):
                    lines += _read(os.path.join(path, p))
        else:
            lines = _read(path)
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if not isinstance(ev, dict):
                continue
            if ev.get("Event") != "SparkListenerStageCompleted":
                continue
            tot["stages"] += 1
            for acc in ev["Stage Info"].get("Accumulables", []):
                n = acc.get("Name", "")
                v = acc.get("Value", 0)
                if not isinstance(v, int):
                    continue
                if n == "internal.metrics.shuffle.write.bytesWritten":
                    tot["shuffle_write_bytes"] += v
                elif n in (
                    "internal.metrics.shuffle.read.localBytesRead",
                    "internal.metrics.shuffle.read.remoteBytesRead",
                ):
                    tot["shuffle_read_bytes"] += v
                elif n == "internal.metrics.input.bytesRead":
                    tot["input_bytes"] += v
    return tot


def _run_minhash(spark, n_docs: int, threshold: float = 0.3, bands="default") -> int:
    from fulltextsearch_spark.operators.dedup import minhash_lsh_pairs
    from fulltextsearch_spark.sources.ingest import assign_dense_doc_ids

    corpus = spark.read.parquet(os.path.join(CACHE, f"web{n_docs}"))
    docs = assign_dense_doc_ids(corpus.select("url", "text"), order_col="url")
    kw = {} if bands == "default" else {"bands": bands}
    return minhash_lsh_pairs(docs, threshold=threshold, shingle_k=8, **kw).count()


def _run_build(spark, n_docs: int) -> int:
    """Fused compressed-index build; returns the varint stream bytes of the
    resulting postings so the probe can compare measured shuffle bytes to
    the SCALE.md claim that build shuffle ~= compressed index size."""
    from pyspark.sql import functions as F

    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.operators.compressed_index import (
        build_compressed_index_pyfiles,
    )

    cfg = EngineConfig(k1=1.2, b=0.75, k=10, stem=True)
    idx = build_compressed_index_pyfiles(spark, os.path.join(CACHE, f"web{n_docs}"), cfg)
    r = idx.postings.agg(
        (
            F.sum(F.length("doc_ids_enc"))
            + F.sum(F.length("tfs_enc"))
            + F.sum(F.length("dls_enc"))
        ).alias("b")
    ).collect()[0]
    return int(r["b"])


def _run_ivfpq(spark, n_rows: int) -> int:
    from pyspark.sql import functions as F

    from fulltextsearch_spark.operators.similarity import build_ivfpq, ivfpq_adc_topk

    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    n_base = base.count()
    reps = max(1, n_rows // n_base)
    # deterministic tiling with distinct ids and a tiny per-copy rotation so
    # the vectors are not literal duplicates (k-means would collapse)
    emb = (
        base.crossJoin(spark.range(reps).select(F.col("id").alias("copy")))
        .select(
            (F.col("vec_id") + F.col("copy") * n_base).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> x + 0.001 * copy * (1 + i % 7))"
            ).alias("embedding"),
        )
    )
    idx = build_ivfpq(emb, n_centroids=16, m=4, n_codes=16, persist=False)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ivfpq_adc_topk(idx, q, nprobe=4, k=10).count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", choices=["minhash", "ivfpq", "build"], required=True)
    ap.add_argument("--sizes", required=True, help="comma-separated input sizes")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.3)
    ap.add_argument("--bands", default="default", help='"auto", "default", or int')
    ap.add_argument("--tag", default="", help="suffix for the output json name")
    args = ap.parse_args()

    from fulltextsearch_spark.session import get_spark

    if args.op in ("minhash", "build"):
        from bench import _ensure_web_corpus  # reuse the deterministic generator

    results = []
    for size in [int(s) for s in args.sizes.split(",")]:
        log_dir = f"/tmp/fts_probe_events_{args.op}{args.tag}_{size}"
        import shutil

        shutil.rmtree(log_dir, ignore_errors=True)
        os.makedirs(log_dir, exist_ok=True)
        if args.op in ("minhash", "build"):
            _ensure_web_corpus(os.path.join(CACHE, f"web{size}"), size)
        spark = get_spark(
            app_name=f"scale-probe-{args.op}-{size}",
            master=f"local[{args.cpus}]",
            shuffle_partitions=args.cpus,
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file://{log_dir}",
            },
        )
        t0 = time.perf_counter()
        if args.op == "minhash":
            bands = args.bands if args.bands in ("auto", "default") else int(args.bands)
            rows = _run_minhash(spark, size, args.threshold, bands)
        elif args.op == "build":
            rows = _run_build(spark, size)
        else:
            rows = _run_ivfpq(spark, size)
        wall = round(time.perf_counter() - t0, 3)
        spark.stop()
        m = _parse_events(log_dir)
        results.append({"size": size, "wall_s": wall, "out_rows": rows, **m})
        print(json.dumps(results[-1]), flush=True)

    if len(results) >= 2:
        a, b = results[0], results[-1]
        growth = b["size"] / a["size"]
        sh = (b["shuffle_write_bytes"] or 1) / (a["shuffle_write_bytes"] or 1)
        summary = {
            "op": args.op + args.tag,
            "cpus": args.cpus,
            "runs": results,
            "size_growth": round(growth, 2),
            "shuffle_bytes_growth": round(sh, 2),
            "bytes_per_row": {
                str(r["size"]): round(r["shuffle_write_bytes"] / r["size"], 1)
                for r in results
            },
            "near_linear": bool(sh <= growth * 1.3),
        }
    else:
        summary = {"op": args.op, "runs": results}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out = os.path.join(REPO, "BENCH", f"scale_probe_{args.op}{args.tag}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
