#!/usr/bin/env python3
"""Flag-compatible analogue of the reference's one-shot `fts` CLI
(/root/reference/src/bootstrap/cli.cpp:12-29, src/main.cpp:17-108):
build the chosen engine over a data directory, then either exit
(benchmark mode), serve a directory of query files into
``<scoring>_result.tbl``, or run an interactive console loop.

    python scripts/fts.py -d /data/webpages -a inverted -s bm25 -q /queries
    python scripts/fts.py -d /data/docs -a trigram -s tf-idf -b
    echo "cat salmon" | python scripts/fts.py -d /data/docs -a inverted -s bm25

Differences from the reference, by design: the engine is Spark (the index
is a distributed DataFrame, not an in-RAM table), `-d` takes a parquet
directory (the reference's own iterator also reads parquet via Arrow), and
a corpus without a ``doc_id`` column gets reference-semantic sequential ids
(file order). ``-a vsm`` is the reference's declared-but-throwing engine,
completed here; it defines its own tf-idf cosine scoring, so ``-s`` is
accepted but ignored for it (documented, not silent: a note prints).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="Fulltext search (Spark-first)")
    ap.add_argument("-d", "--data", required=True, help="parquet corpus directory")
    ap.add_argument("-a", "--algorithm", required=True, choices=["inverted", "vsm", "trigram"])
    ap.add_argument("-s", "--scoring", required=True, choices=["bm25", "tf-idf"])
    ap.add_argument("-b", "--benchmarking-mode", action="store_true", dest="bench")
    ap.add_argument("-n", "--num_results", type=int, default=10)
    ap.add_argument("-q", "--queries", default=None, help="query .txt dir (also output dir)")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--no-stem", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.session import get_spark

    spark = get_spark(
        app_name="fts-cli", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    cfg = EngineConfig(k1=1.2, b=0.75, k=args.num_results, stem=not args.no_stem)
    scoring = "tfidf" if args.scoring == "tf-idf" else args.scoring

    docs = spark.read.parquet(args.data)
    if "doc_id" not in docs.columns:
        from fulltextsearch_spark.sources.ingest import assign_file_order_doc_ids

        docs = assign_file_order_doc_ids(spark, args.data, columns=["text"])

    t0 = time.perf_counter()
    if args.algorithm == "inverted":
        from fulltextsearch_spark.operators.compressed_index import build_compressed_index
        from fulltextsearch_spark.operators.wand import search_wand

        idx = build_compressed_index(spark, docs, cfg)
        idx.postings.count()  # materialize (reference builds eagerly too)
        n_docs = idx.n_docs

        def run(queries_df):
            return search_wand(idx, queries_df, cfg, scoring=scoring, k=args.num_results)

    elif args.algorithm == "vsm":
        from fulltextsearch_spark.operators.index_build import build_index
        from fulltextsearch_spark.operators.vsm import build_vsm, search_vsm

        if scoring != "tfidf":
            print("# note: vsm defines its own tf-idf cosine scoring; -s ignored")
        vidx = build_vsm(build_index(spark, docs, cfg))
        vidx.index.postings.count()
        n_docs = vidx.index.n_docs

        def run(queries_df):
            return search_vsm(vidx, queries_df, cfg)  # k rides in cfg.k

    else:  # trigram
        from fulltextsearch_spark.operators.trigram import build_trigram_index, search_trigram

        tidx = build_trigram_index(spark, docs, cfg)
        tidx.postings.count()
        n_docs = tidx.doc_count

        def run(queries_df):
            pairs = [(r["query_id"], r["content"]) for r in queries_df.collect()]
            return search_trigram(tidx, pairs, cfg, scoring=scoring, k=args.num_results)

    build_s = time.perf_counter() - t0
    print(f"# built {args.algorithm} over {n_docs} docs in {build_s:.2f}s")
    if args.bench:
        spark.stop()
        return 0

    if args.queries:
        from fulltextsearch_spark.sources.queries import read_query_dir, write_results_tbl

        qdir = read_query_dir(spark, args.queries)
        display = {r["query_uid"]: r["query_id"] for r in qdir.collect()}
        queries = qdir.select(F.col("query_uid").alias("query_id"), "content")
        t0 = time.perf_counter()
        rows = run(queries).orderBy("query_id", "rank").collect()
        print(f"# {len(display)} queries in {time.perf_counter() - t0:.3f}s")
        out_rows = [
            (display.get(r["query_id"], r["query_id"]), r["rank"], r["doc_id"], r["score"])
            for r in rows
        ]
        out = os.path.join(args.queries, f"{args.scoring}_result.tbl")
        write_results_tbl(
            spark.createDataFrame(
                out_rows, "query_id STRING, rank LONG, doc_id LONG, score DOUBLE"
            ),
            out,
        )
        print(f"# results -> {out}")
    else:
        from fulltextsearch_spark.sources.queries import queries_from_pairs

        count = 0
        interactive = sys.stdin.isatty()
        while True:
            if interactive:
                print("Enter query (!q to quit): ", end="", flush=True)
            line = sys.stdin.readline()
            if not line:
                break
            content = line.rstrip("\n")
            if content == "!q":
                break
            t0 = time.perf_counter()
            rows = run(queries_from_pairs(spark, [(str(count), content)])).collect()
            # reference prints "<query>: <latency ns>" then doc_id|score| lines
            print(f"{content}: {int((time.perf_counter() - t0) * 1e9)}")
            for r in sorted(rows, key=lambda r: r["rank"]):
                print(f"{r['doc_id']}|{r['score']:g}|")
            count += 1

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
