"""SparkSession factory.

One place to configure the engine's execution posture:

- AQE on (runtime re-planning, partition coalescing, skew-join splitting)
  so plans tuned at local scale survive a 1000-executor cluster.
- UTC session timezone so results are comparable across engines
  (DuckDB oracle timestamps are UTC-naive).
- Arrow enabled for the pandas-UDF slow path.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE coalescing makes the static number mostly irrelevant.

The reference has no notion of a session — it is a single-threaded
eager pandas script (SURVEY.md §3). Everything here is engine-side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def cpu_count() -> int:
    """Worker-thread count: $SPARK_GRAFT_CPUS if set, else all cores."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def get_spark(
    app_name: str = "module8-movies-etl-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local mode is a single JVM with N threads; on a cluster the same
    config holds — AQE and broadcast thresholds are the scale levers.
    """
    cores = cpu_count()
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or max(DEFAULT_SHUFFLE_PARTITIONS, cores)),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # 12g, deliberately NOT most-of-RAM: in local single-JVM mode a
        # huge G1 heap turns the allocation-heavy shuffle/agg stages
        # into multi-second GC pauses (measured 8-13× slowdowns on the
        # pair-join queries at 48g; GC time exceeded task runtime).
        # The working set at bench scale is well under 12g.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
