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


def record_footprint(root: str, tables: dict[str, str]) -> dict:
    """Index size-on-disk metric: sum bytes per saved table, append ONE line
    to ``{root}/_lineage.jsonl``.

    The Spark analogue of the reference's footprint API
    (``/root/reference/src/fts_engine.hpp:50-60``,
    ``inverted_index_engine.cpp:164-188`` — it reports index
    size/capacity from its in-RAM structures; here the durable truth is
    parquet bytes on disk). Local/NFS paths only — non-file URI schemes are
    skipped (object stores report size through their own metadata APIs).
    """
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    rec: dict = {"stage": "footprint"}
    for name, path in tables.items():
        if "://" in path and not path.startswith("file://"):
            continue
        p = path.removeprefix("file://")
        total = 0
        for dirpath, _, files in os.walk(p):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(dirpath, fn))
                except OSError:  # file vanished mid-walk
                    pass
        rec[f"{name}_bytes"] = total
    if "://" not in root or root.startswith("file://"):
        try:
            with open(
                os.path.join(root.removeprefix("file://"), "_lineage.jsonl"), "a"
            ) as f:
                f.write(json.dumps(rec) + "\n")
        except OSError:  # pragma: no cover - read-only store
            pass
    return rec
