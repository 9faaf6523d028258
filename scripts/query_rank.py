#!/usr/bin/env python3
"""Rank-of-expected-document evaluation, analogue of the reference's
``scripts/query_rank.py:1-36``: given a ``query|document`` expectations file
and a ``query|rank|doc_id|score|`` results .tbl, report the rank at which
each expected document actually appeared (-1 when absent) as
``query_ranks.csv`` in the output directory.

    python scripts/query_rank.py expected.tbl results.tbl out_dir

Plain pandas on driver-sized files — result tables are k rows per query by
construction, so this never needs Spark.
"""

from __future__ import annotations

import argparse
import glob
import os

import pandas as pd


def _read_tbl(path: str, names: list[str]) -> pd.DataFrame:
    """Read a pipe-separated file OR a Spark .tbl output directory."""
    paths = sorted(glob.glob(os.path.join(path, "part*"))) if os.path.isdir(path) else [path]
    frames = [
        pd.read_csv(p, sep="|", header=None, names=names, index_col=False, usecols=range(len(names)))
        for p in paths
        if os.path.getsize(p)
    ]
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(columns=names)


def get_document_rank(queries_file: str, output_file: str, result_dir: str) -> pd.DataFrame:
    expected = _read_tbl(queries_file, ["query", "document"])
    output = _read_tbl(output_file, ["query", "rank", "document", "score"])

    results = []
    for _, row in expected.iterrows():
        match = output[(output["query"] == row["query"]) & (output["document"] == row["document"])]
        rank = int(match["rank"].values[0]) if not match.empty else -1
        results.append({"query": row["query"], "rank": rank, "document": row["document"]})

    os.makedirs(result_dir, exist_ok=True)
    result_file = os.path.join(result_dir, "query_ranks.csv")
    results_df = pd.DataFrame(results)
    results_df.to_csv(result_file, index=False)
    print(f"Results saved to {result_file}")
    return results_df


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description="Find the rank of documents for given queries.")
    ap.add_argument("queries_file", help="query|document expectations (file)")
    ap.add_argument("output_file", help="query|rank|doc_id|score| results (.tbl file or dir)")
    ap.add_argument("result_dir", help="directory for query_ranks.csv")
    a = ap.parse_args()
    get_document_rank(a.queries_file, a.output_file, a.result_dir)
