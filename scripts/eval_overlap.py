#!/usr/bin/env python3
"""Result-overlap evaluation over the reference's canned query set.

Re-expresses ``/root/reference/scripts/evaluation.ipynb``: the notebook runs
four canned queries ('cat', 'cat salmon', 'cat salmon fresh', 'my cat eats a
salmon a day') against ElasticSearch and against the engine's stemmed and
unstemmed variants, then reports top-``limit`` result-set intersections. No
ElasticSearch exists in this sandbox, so the authority slot is the exhaustive
stemmed BM25 ranking (rank-identical to the reference C++ engine per
``scripts/parity_vs_reference.py``); the compared variants are the unstemmed
BM25 engine and the trigram engine — the same three-way comparison shape as
the notebook, over the deterministic synthetic web corpus (whose vocabulary
deliberately contains the canned queries' words;
``fulltextsearch_spark/sources/webpages.py``).

Prints one table row per (query, pair): intersection size, Jaccard, and the
notebook's ``len(intersection)/limit`` overlap share. Also writes each
engine's results in the ``query|rank|doc_id|score|`` sink format so
``scripts/quality_metrics.py`` (J5) can diff any pair of runs.

Usage: python scripts/eval_overlap.py [--docs 20000] [--limit 100]
                                      [--out /tmp/fts_eval_overlap]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    ("cat", "cat"),
    ("cat-salmon", "cat salmon"),
    ("cat-salmon-fresh", "cat salmon fresh"),
    ("my-cat-eats-a-salmon-a-day", "my cat eats a salmon a day"),
]


def _write_tbl(path: str, rows) -> None:
    with open(path, "w") as fh:
        for r in rows:
            fh.write(f"{r.query_id}|{r.rank}|{r.doc_id}|{r.score:.4f}|\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--limit", type=int, default=100)
    ap.add_argument("--out", default="/tmp/fts_eval_overlap")
    args = ap.parse_args()

    from fulltextsearch_spark.config import EngineConfig
    from fulltextsearch_spark.operators.compressed_index import build_compressed_index
    from fulltextsearch_spark.operators.trigram import build_trigram_index, search_trigram
    from fulltextsearch_spark.operators.wand import search_wand
    from fulltextsearch_spark.session import get_spark
    from fulltextsearch_spark.sources.ingest import assign_dense_doc_ids
    from fulltextsearch_spark.sources.webpages import generate_webpages

    spark = get_spark(app_name="eval-overlap")
    pages = generate_webpages(spark, args.docs)
    docs = assign_dense_doc_ids(pages, "url").select("doc_id", "text").persist()
    qdf = spark.createDataFrame(QUERIES, ["query_id", "content"])

    runs: dict[str, dict[str, list]] = {}

    for name, stem in (("stemmed", True), ("unstemmed", False)):
        cfg = EngineConfig(k=args.limit, stem=stem)
        idx = build_compressed_index(spark, docs, cfg)
        res = search_wand(idx, qdf, cfg, prune=False).collect()
        runs[name] = {}
        for r in sorted(res, key=lambda r: (r.query_id, r.rank)):
            runs[name].setdefault(r.query_id, []).append(r)

    # compactify=False: the synthetic corpus is Zipf-headed enough that the
    # canned queries' trigrams all cross the stop-trigram threshold and get
    # cleared (reference semantics), which would make the comparison vacuous
    # — the notebook's real-web ES corpus didn't have that property.
    tri_cfg = EngineConfig(k=args.limit)
    tri = build_trigram_index(spark, docs, tri_cfg, compactify=False)
    tri_res = search_trigram(tri, QUERIES, tri_cfg).collect()
    runs["trigram"] = {}
    for r in sorted(tri_res, key=lambda r: (r.query_id, r.rank)):
        runs["trigram"].setdefault(r.query_id, []).append(r)

    os.makedirs(args.out, exist_ok=True)
    for name, by_q in runs.items():
        _write_tbl(
            os.path.join(args.out, f"{name}.tbl"),
            [r for q in sorted(by_q) for r in by_q[q]],
        )

    pairs = [("stemmed", "unstemmed"), ("stemmed", "trigram"), ("unstemmed", "trigram")]
    print(f"{'query':28s} {'pair':22s} {'|A|':>4s} {'|B|':>4s} {'∩':>4s} "
          f"{'jaccard':>8s} {'overlap@limit':>13s}")
    summary = []
    for qid, _ in QUERIES:
        for a, b in pairs:
            sa = {r.doc_id for r in runs[a].get(qid, [])[: args.limit]}
            sb = {r.doc_id for r in runs[b].get(qid, [])[: args.limit]}
            inter = len(sa & sb)
            union = len(sa | sb)
            jac = inter / union if union else 1.0
            share = inter / args.limit  # the notebook's metric
            print(f"{qid:28s} {a + ' vs ' + b:22s} {len(sa):4d} {len(sb):4d} "
                  f"{inter:4d} {jac:8.3f} {share:13.3f}")
            summary.append({"query": qid, "pair": f"{a}/{b}", "a": len(sa),
                            "b": len(sb), "intersection": inter,
                            "jaccard": round(jac, 4),
                            "overlap_at_limit": round(share, 4)})
    out_json = {"docs": args.docs, "limit": args.limit, "rows": summary}
    with open(os.path.join(args.out, "overlap.json"), "w") as fh:
        json.dump(out_json, fh, indent=1)
    print(json.dumps({"metric": "eval_overlap", "docs": args.docs,
                      "limit": args.limit,
                      "out": args.out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
