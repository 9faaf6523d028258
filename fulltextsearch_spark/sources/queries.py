"""Query sources and result sinks, parity with the reference CLI surface.

* File source (S2): one query per line of each ``.txt`` file in a directory;
  the query id is the file stem — every line of the same file shares it
  (``/root/reference/src/queries/query_iterator.cpp:7-32``).
* Result sink (S4): ``query|rank|doc_id|score|`` lines into
  ``<scoring>_result.tbl`` (``/root/reference/src/main.cpp:64-86``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_query_dir", "queries_from_pairs", "write_results_tbl"]


def read_query_dir(spark: SparkSession, path: str) -> DataFrame:
    """(query_id, content, query_uid) from a directory of .txt files.

    Mirrors FileIterator: only ``.txt`` files are read; the *display* id is
    the file stem shared by every line of the file. The reference searches
    each line as a separate query even when ids collide, so ``query_uid``
    (stem#line) is the unique key to search on; report with ``query_id``.
    """
    txts = [os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".txt")]
    if not txts:
        return spark.createDataFrame([], "query_id STRING, content STRING, query_uid STRING")
    pairs = []
    for t in txts:
        stem = os.path.basename(t)[: -len(".txt")]
        with open(t, "rb") as f:
            # reference splits on '\n' only (query_iterator.cpp:18-24); a
            # trailing newline yields no empty last query because word_begin
            # reaches end. Decode bytes as latin-1-safe utf-8 passthrough.
            data = f.read()
        lines = data.split(b"\n")
        if lines and lines[-1] == b"":
            lines.pop()
        for i, line in enumerate(lines):
            pairs.append((stem, line.decode("utf-8", errors="replace"), f"{stem}#{i}"))
    return spark.createDataFrame(pairs, ["query_id", "content", "query_uid"])


def queries_from_pairs(spark: SparkSession, pairs: list[tuple[str, str]]) -> DataFrame:
    return spark.createDataFrame(pairs, ["query_id", "content"])


def write_results_tbl(results: DataFrame, out_path: str) -> None:
    """Write ``query|rank|doc_id|score|`` lines (reference main.cpp:80-85).

    Collect-free: formatted on executors, coalesced for the single-file
    contract of the reference CLI (results are k rows per query — tiny).
    """
    line = F.concat_ws(
        "",
        F.col("query_id").cast("string"), F.lit("|"),
        F.col("rank").cast("string"), F.lit("|"),
        F.col("doc_id").cast("string"), F.lit("|"),
        F.col("score").cast("string"), F.lit("|"),
    )
    (
        results.orderBy("query_id", "rank")
        .select(line.alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(out_path)
    )
