"""Corpus ingest: dense deterministic doc_id assignment + format ingest.

Replaces the reference's ingest scripts:

* ``scripts/parquet2parquet.py:8-56`` assigns a global sequential uint32 id
  (0-based) over sorted files. Here
  :func:`assign_dense_doc_ids` does the same deterministically over a sort
  key (default ``url``) **without a single-partition global sort**: range
  repartition + per-partition counts -> cumulative offsets -> partition-local
  sequence. ``monotonically_increasing_id()`` is deliberately not used (not
  dense, partition-layout-dependent).
* ``scripts/csv2parquet.py:16-33`` selects (text, id) from CSV and writes
  parquet; :func:`csv_to_corpus` is the DataFrame equivalent.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["assign_dense_doc_ids", "csv_to_corpus"]


def assign_dense_doc_ids(
    df: DataFrame, order_col: str = "url", num_partitions: int | None = None
) -> DataFrame:
    """Add a dense 0-based ``doc_id`` ordered by ``order_col``, scalably.

    Two-phase (no global sort on one node):
      1. range-repartition + sort within partitions on the key — global order
         across partition ranges;
      2. count rows per partition (tiny collect), prefix-sum on the driver,
         then a partition-local running sequence via ``mapInPandas``.

    At 10^12 docs this is two passes over the data with only a P-row driver
    exchange — the standard zipWithIndex shape, DataFrame-native.
    """
    num_partitions = num_partitions or df.rdd.getNumPartitions() or 1
    arranged = df.repartitionByRange(num_partitions, F.col(order_col)).sortWithinPartitions(
        order_col
    )
    with_pid = arranged.withColumn("_pid", F.spark_partition_id())
    counts = {
        r["_pid"]: r["cnt"]
        for r in with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)] + list(df.schema.fields)
    )

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        used = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = offsets[pid] + used
            pdf = pdf.drop(columns=["_pid"])
            pdf.insert(0, "doc_id", np.arange(start, start + len(pdf), dtype=np.int64))
            used += len(pdf)
            yield pdf

    return with_pid.mapInPandas(_assign, schema=out_schema)


def csv_to_corpus(
    spark, path: str, text_col: str = "text", id_col: str | None = None, **reader_opts
) -> DataFrame:
    """CSV -> (doc_id, text) corpus frame (reference csv2parquet.py:16-33)."""
    df = spark.read.options(header=True, **reader_opts).csv(path)
    if id_col is not None:
        return df.select(
            F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
        )
    return assign_dense_doc_ids(df.select(F.col(text_col).alias("text")), order_col="text")
