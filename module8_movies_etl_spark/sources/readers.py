"""Readers — the engine's scan operators (SURVEY.md §2.1).

Reference surface being re-expressed:

- S1  whole-file ``json.load`` of ragged movie records
  (reference ``challenge.py:44-45``) → ``spark.read.json`` with
  multiLine + union-of-keys schema inference, fully distributed.
- S2  ``pd.read_csv(..., low_memory=False)`` (``challenge.py:47-48``)
  → ``spark.read.csv``; explicit schema preferred in production, header
  + inference as the exploratory path.
- S3  chunked CSV re-read (``challenge.py:320``) → unnecessary: Spark
  splits any source into partitions; a single lazy scan replaces the
  hand-rolled 1M-row loop.

Parquet is the engine's canonical format: columnar, predicate/column
pushdown, row-group pruning — at 100 TB the scan is the dominant cost
and parquet is the only format here that prunes it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Canonical scan. Columnar + pushdown; partitioned dirs pruned."""
    return spark.read.parquet(path)


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Scan a dataset whose files were written under DIFFERENT
    (compatible) schemas — schema evolution on read. ``mergeSchema``
    unions the per-file schemas (missing columns read as NULL); it
    costs a footer read per file at planning, which is why it is NOT
    the default scan: a 100 TB table with a known schema should pay
    one catalog lookup, not a million footer merges."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic benchmark table from a scale-factor dir.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    rejects outright (PARQUET_TYPE_ILLEGAL). The portable fix — safe
    under ANY caller-provided session, including the driver's — is the
    ``nanosAsLong`` legacy read path plus an integer ns→µs conversion
    (the data is µs-aligned, so this is lossless). Integer division
    avoids the double-precision trap (ns epochs exceed 2^53).

    The legacy conf is consulted at schema-resolution time (DataFrame
    creation), so it is saved and RESTORED around the read — setting it
    session-wide would silently change nanos decoding for every later
    read in a caller-owned session. NOT thread-safe: a concurrent read
    in the same session during the set/restore window would see the
    legacy decoding. Fine for this single-driver harness; if the
    session is ever shared across threads, serialize calls or read
    events under a dedicated session.
    """
    if name == "events":
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read several benchmark tables at once (default: all of them)."""
    use = names or TPCH_TABLES
    return {n: read_table(spark, sf_dir, n) for n in use}


def read_json_records(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    multi_line: bool = True,
) -> DataFrame:
    """S1: ragged JSON → DataFrame with union-of-keys schema.

    The reference loads the whole file on the driver
    (``challenge.py:44-45``); Spark's JSON source infers the same
    union schema but scans distributed. Pass ``schema`` to skip the
    inference pass on big inputs (inference reads the data twice).
    """
    reader = spark.read.option("multiLine", "true" if multi_line else "false")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer_schema: bool | None = None,
) -> DataFrame:
    """S2: CSV scan.

    ``low_memory=False`` in the reference (``challenge.py:47``) exists
    because pandas infers dtypes chunk-by-chunk; Spark's two-pass
    inference has no such failure mode, and an explicit schema skips
    the extra pass entirely (the production default here).
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema is not False:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same predicate/column pushdown contract as parquet
    (pinned by test_orc_roundtrip_pushdown)."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file scan: the ingest path for multimodal blobs (images,
    audio) sitting as FILES rather than as a column in a table —
    yields (path, modificationTime, length, content) with ``content``
    as the opaque binary column the multimodal stages consume
    (operators.multimodal). Partition parallelism is per-file;
    ``spark.sql.files.maxPartitionBytes`` governs batching of small
    files into tasks."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: T.StructType | None = None,
) -> DataFrame:
    """S1-adjacent: XML scan via Spark 4's NATIVE xml source (the
    spark-xml package folded into core) — the third semi-structured
    ingest beside ragged JSON and VARIANT. Schema inference unions
    element structures like the JSON path; pass ``schema`` to skip
    the inference pass on large inputs. Row boundaries come from
    ``rowTag``, so files split cleanly across executors.
    """
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
