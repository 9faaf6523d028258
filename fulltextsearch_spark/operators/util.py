"""Shared operator plumbing.

``spread_for_python_kernel`` fixes the small-input parallelism cliff for
operators whose hot path is an Arrow/Pandas UDF: Spark sizes parquet scan
splits by bytes (``spark.sql.files.maxPartitionBytes``), so a table far
smaller than one split arrives as a single partition and the Python kernel
runs on ONE core no matter how many the session has. At real corpus sizes
the scan produces thousands of splits and this helper is a no-op (it never
*reduces* partitioning and never touches a DataFrame that is already at
least as parallel as the session default) — it only round-robins tiny
inputs so local/bench runs exercise every core, matching what a real
multi-split scan gives for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_for_python_kernel"]


def spread_for_python_kernel(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session default parallelism iff it is
    currently narrower — a no-op shuffle-guard for cheap-to-move inputs
    feeding expensive per-row Python kernels."""
    spark = df.sparkSession
    target = min_partitions or max(spark.sparkContext.defaultParallelism, 1)
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - planning-only failure
        return df
    if current >= target:
        return df
    return df.repartition(target)
