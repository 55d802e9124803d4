"""Writers — the engine's sink operators (SURVEY.md §2.1, S4-S6).

Reference surface being re-expressed:

- S4  ``to_sql(if_exists='append')`` into Postgres
  (``challenge.py:312-322``) → ``df.write.jdbc`` (executor-parallel
  partition writes; no driver loop, no chunked re-read).
- S5  manual ``DELETE FROM`` before re-run (``challenge.py:19-30``)
  → ``mode('overwrite')``.
- S6  per-chunk progress prints (``challenge.py:317-325``) → Spark task
  metrics; not a data operator.

The canonical sink is partitioned Parquet: at 100 TB the partition
column choice (usually a date) is what makes downstream scans prunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Canonical sink. ``partition_by`` drives downstream pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_parquet(spark, path: str) -> int:
    """Small-file compaction: rewrite a parquet dataset through AQE's
    REBALANCE exchange so file count follows data volume, then swap
    the rewritten dataset into place. Returns the new file count.

    The maintenance job every long-lived table needs — streaming
    sinks and incremental loads accrete small files, and at 100 TB
    the scan's task-scheduling overhead grows with file count, not
    data size. Spark cannot overwrite a path it is reading, so the
    rewrite goes to a staging dir and swaps via two renames (atomic
    on a posix filesystem; object stores use a committer instead).
    """
    import os
    import shutil

    staging = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__pre_compact"
    spark.read.parquet(path).hint("rebalance").write.mode("overwrite").parquet(
        staging
    )
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    num_partitions: int | None = None,
    batch_size: int = 100_000,
    properties: dict[str, str] | None = None,
) -> None:
    """S4: JDBC sink, executor-parallel.

    Replaces the reference's single-threaded 1M-row chunk loop
    (``challenge.py:317-325``, ~3,949 rows/s): each partition opens
    its own connection and inserts in ``batch_size`` batches.
    ``num_partitions`` caps concurrent connections against the target.
    """
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    props = {"batchsize": str(batch_size)}
    props.update(properties or {})
    df.write.jdbc(url=url, table=table, mode=mode, properties=props)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
) -> None:
    """CSV sink — the reference's actual output format (its repo
    strips two output CSVs, ``.MISSING_LARGE_BLOBS``; pandas
    ``to_csv`` equivalents). Executor-parallel part files; the
    interchange sink for spreadsheet/pandas consumers. Not a 100 TB
    format (no columnar pruning, no row groups) — parquet stays
    canonical; this exists for export parity.
    """
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
) -> None:
    """JSON-lines sink — the mirror of the S1 JSON scan, for
    downstream consumers of the reference's wiki-shaped records.
    Same export-parity caveat as CSV."""
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — the interop format for Hive-centric consumers.
    Same columnar/pushdown/pruning properties as parquet (Spark ships
    a vectorized ORC reader); parquet stays the canonical sink, this
    exists so a reference user with ORC-based downstream tooling can
    switch without a format migration."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_xml(
    df,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (Spark 4 native xml source) — one file per partition
    wrapped in ``rootTag``; rebalance upstream if partition count
    should track data volume like the other sinks."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )
