#!/usr/bin/env python3
"""Rank-identity check: our Spark engine vs the ACTUAL reference C++ binary.

Run ``bash scripts/ref_bench/build_and_run.sh [docs]`` first (compiles the
unmodified reference engine and produces /tmp/ref_build/ref_out_<docs>.txt),
then this script builds our compressed index over the SAME url-sorted corpus
(identical dense doc_ids) and compares per-query (rank, doc_id, score).

Comparison rule: scores at print precision (reference prints %.9f); doc_ids
must match exactly EXCEPT inside equal-score groups at the k boundary, where
the reference's own min-heap over unordered_map iteration order is
nondeterministic (SURVEY.md §2.6, inverted_index_engine.cpp:142-148) — there
the score multiset must still match.
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    ref_out = f"/tmp/ref_build/ref_out_{docs}.txt"
    if not os.path.exists(ref_out):
        print(f"missing {ref_out}; run scripts/ref_bench/build_and_run.sh {docs}")
        return 2

    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.operators.compressed_index import build_compressed_index
    from fulltextsearch_spark.operators.wand import search_wand
    from fulltextsearch_spark.session import get_spark
    from fulltextsearch_spark.sources.ingest import assign_dense_doc_ids
    from fulltextsearch_spark.sources.webpages import QUERY_SET

    spark = get_spark("parity-vs-ref", master="local[16]", shuffle_partitions=16)
    cfg = EngineConfig(k1=1.2, b=0.75, k=10, stem=True)
    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/fts_bench_cache")
    raw = spark.read.parquet(os.path.join(cache, f"webspark{docs}")).select("url", "text")
    cidx = build_compressed_index(spark, assign_dense_doc_ids(raw, "url"), cfg)
    print("ours: n_docs", cidx.n_docs, "avgdl", round(cidx.avgdl, 6))

    qdf = spark.createDataFrame(QUERY_SET, ["query_id", "content"])
    ours: dict[str, list] = defaultdict(list)
    for r in search_wand(cidx, qdf, cfg).collect():
        ours[r["query_id"]].append((r["rank"], r["doc_id"], r["score"]))
    qids = [q[0] for q in QUERY_SET]

    ref: dict[str, list] = defaultdict(list)
    for line in open(ref_out):
        m = re.match(r"RESULT (\d+)\|(\d+)\|(\d+)\|([0-9.]+)\|", line)
        if m:
            ref[qids[int(m.group(1)) - 1]].append(
                (int(m.group(2)), int(m.group(3)), float(m.group(4)))
            )

    ok = True
    for qid in qids:
        a, b = sorted(ours.get(qid, [])), sorted(ref.get(qid, []))
        if len(a) != len(b):
            print(f"{qid}: COUNT MISMATCH ours={len(a)} ref={len(b)}")
            ok = False
            continue
        sa = sorted(round(x[2], 6) for x in a)
        sb = sorted(round(x[2], 6) for x in b)
        if sa != sb:
            print(f"{qid}: SCORE MISMATCH\n  ours={sa}\n  ref ={sb}")
            ok = False
            continue
        if not sa:
            print(f"{qid}: IDENTICAL (no results in either engine)")
            continue
        ga, gb = defaultdict(set), defaultdict(set)
        for _, d, s in a:
            ga[round(s, 6)].add(d)
        for _, d, s in b:
            gb[round(s, 6)].add(d)
        mism = [(s, sorted(ga[s] ^ gb[s])) for s in ga if ga[s] != gb[s]]
        hard = [m for m in mism if m[0] != min(sa)]
        if hard:
            print(f"{qid}: DOC MISMATCH above the tie boundary: {hard}")
            ok = False
        elif mism:
            print(f"{qid}: boundary-tie difference only (reference nondeterministic)")
        else:
            print(f"{qid}: IDENTICAL ranks, docs, scores")
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
