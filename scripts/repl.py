#!/usr/bin/env python3
"""Interactive query REPL over a saved index (S3).

Mirrors the reference's command-line query mode
(``/root/reference/src/queries/query_iterator.cpp:34-51`` — the
``CommandLineIterator`` prompts ``Enter query (!q to quit):``, assigns
sequential ids, and stops on ``!q``; ``src/main.cpp:86-104`` prints each
result as ``doc_id|score|`` after a per-query latency line).

Serving goes through :meth:`fulltextsearch_spark.operators.serving.
QueryServer.search_local` — the saved index stays on disk, each query reads
only the row groups holding its terms (parquet footer statistics), and the
scoring kernel runs in-process with no per-query Spark job, so the loop
answers in milliseconds on arbitrarily large corpora.

    python scripts/repl.py --index /path/to/index \
        [--k 10 --scoring bm25 --cpus 8]

Reads queries from stdin (scriptable: ``echo 'cat salmon' | repl.py …``).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True, help="compressed index dir")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--scoring", choices=["bm25", "tfidf"], default="bm25")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.operators.serving import QueryServer
    from fulltextsearch_spark.session import get_spark

    spark = get_spark(
        app_name="fts-repl", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    server = QueryServer.load(spark, args.index)
    cfg = EngineConfig(k1=server.k1, b=server.b, k=args.k)
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
        # in-process fast path: footer-pruned pyarrow reads + the MaxScore
        # kernel, no per-query Spark job (rank-identical to server.search)
        rows = server.search_local(
            [(str(count), content)], cfg, scoring=args.scoring, k=args.k
        )
        # reference prints "<query>: <latency ns>" then doc_id|score| lines
        print(f"{content}: {int((time.perf_counter() - t0) * 1e9)}")
        for _qid, _rank, doc_id, score in sorted(rows, key=lambda r: r[1]):
            print(f"{doc_id}|{score:g}|")
        count += 1
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
