"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fulltextsearch-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for the index-build workload.

    On a real cluster these settings arrive via ``spark-submit --conf``; this
    factory encodes the same defaults for local runs: AQE on (runtime shuffle
    coalescing + skew handling), Arrow enabled for the pandas UDF hot path.
    """
    # Local-mode python workers inherit PYTHONPATH (not the driver's
    # sys.path mutations), so a driver launched from OUTSIDE the repo root
    # would satisfy its own imports yet fail inside every UDF with
    # ModuleNotFoundError. Pin the package root into the env before the
    # first worker spawns; a real cluster ships the zip via --py-files.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if repo_root not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join(
            [repo_root] + [p for p in parts if p]
        )
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
