#!/usr/bin/env python3
"""spark-submit entry point: resumable compressed-index build.

    spark-submit --py-files fts.zip scripts/build_index.py \
        --input /path/to/webpages_parquet --output /path/to/index_root \
        [--k1 1.2 --b 0.75 --no-stem --files-per-chunk 4 --order-col url]

Rerunning after a failure resumes from per-chunk manifests; an unchanged
input is a no-op. Stage metrics append to ``<output>/_lineage.jsonl``.
Package the library with ``scripts/make_pyfiles.sh`` (or any zip of
``fulltextsearch_spark/``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="parquet dir / Iceberg table of web pages")
    ap.add_argument("--output", required=True, help="index root (manifests, tokenized, index)")
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--files-per-chunk", type=int, default=4)
    ap.add_argument("--order-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--has-doc-id", action="store_true", help="input already carries dense doc_id")
    ap.add_argument("--master", default=None, help="only for local runs; omit under spark-submit")
    args = ap.parse_args()

    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.plans.checkpoints import resumable_build
    from fulltextsearch_spark.session import get_spark

    spark = get_spark(app_name="fts-build-index", master=args.master)
    cfg = EngineConfig(k1=args.k1, b=args.b, stem=not args.no_stem)
    summary = resumable_build(
        spark,
        args.input,
        args.output,
        cfg,
        files_per_chunk=args.files_per_chunk,
        order_col=args.order_col,
        text_col=args.text_col,
        has_doc_id=args.has_doc_id,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
