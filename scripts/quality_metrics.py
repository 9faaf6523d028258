#!/usr/bin/env python3
"""Result-intersection quality metrics (J5) — compare two search-result files.

Re-expresses the reference's evaluation script
(``/root/reference/scripts/qualityMetrics.py:10-31``): for the documents
appearing in BOTH result sets it reports the match count and the sum of
absolute score differences. Two input formats:

* reference CSV, headerless ``<docId>,<score>`` rows (one query per file);
* this engine's ``.tbl`` sink, ``query|rank|doc_id|score|`` lines (S4,
  reference main.cpp:80-85) — matching is then per (query_id, doc_id) and a
  per-query breakdown is printed too.

Usage: python scripts/quality_metrics.py <file1> <file2>
A ``.tbl`` path may be a file or a directory of part files.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict


def _load(path: str) -> dict[tuple[str, str], float]:
    """{(query_id, doc_id): score}. CSV rows get query_id ''."""
    paths = [path]
    if os.path.isdir(path):
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(("_", "."))
        )
    out: dict[tuple[str, str], float] = {}
    for p in paths:
        with open(p, newline="") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                if "|" in line:  # query|rank|doc_id|score|
                    q, _rank, doc, score = line.strip("|").split("|")[:4]
                else:  # docId,score
                    doc, score = line.split(",")[:2]
                    q = ""
                out[(q, doc)] = float(score)
    return out


def compare(path1: str, path2: str) -> dict:
    r1, r2 = _load(path1), _load(path2)
    both = sorted(set(r1) & set(r2))
    sum_abs = sum(abs(r1[k] - r2[k]) for k in both)
    per_query: dict[str, dict] = defaultdict(lambda: {"matches": 0, "sum_abs_diff": 0.0})
    for q, d in both:
        per_query[q]["matches"] += 1
        per_query[q]["sum_abs_diff"] += abs(r1[(q, d)] - r2[(q, d)])
    return {
        "matches": len(both),
        "sum_abs_diff": sum_abs,
        "only_in_1": len(set(r1) - set(r2)),
        "only_in_2": len(set(r2) - set(r1)),
        "per_query": {q: dict(v) for q, v in sorted(per_query.items())},
    }


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 1
    m = compare(sys.argv[1], sys.argv[2])
    print(f"Number of document appearing in both searches: {m['matches']}")
    print(
        "Sum of absolute differences in the second column for matching entries: "
        f"{m['sum_abs_diff']}"
    )
    if any(q for q in m["per_query"] if q != ""):
        for q, v in m["per_query"].items():
            print(f"  {q}: matches={v['matches']} sum_abs_diff={v['sum_abs_diff']:.9g}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
