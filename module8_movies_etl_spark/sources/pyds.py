"""Spark 4 Python DataSource API — the custom-connector extension
point (SURVEY.md §2.12, beside the UDTF and grouped-map escape
hatches).

The reference's only "connector" is ``pd.read_csv``/``to_sql``
(challenge.py:47,320); Spark-side, real formats go through the
built-in scans (``readers.py``). What the built-ins cannot do is read
a source Spark has no driver for — an internal service, a bespoke
tape format, a synthetic generator. Spark 4's ``DataSource`` API is
the sanctioned way to plug one in from Python: the reader declares
PARTITIONS (so the scan parallelizes like any file source) and yields
plain tuples per partition; Catalyst sees an ordinary relation and
applies column pruning on top.

The shipped implementation is a deterministic synthetic-documents
generator (``graftgen``): row content is pure md5 arithmetic of the
row id, so — like every other extension point in this engine — the
custom connector is pinned by a FULL value oracle (DuckDB replays the
generator from ``range()``), not just a smoke test.

Three surfaces ship: the partitioned batch READER (``graftgen``),
the committing batch WRITER (``graftsink``), and — round 7 — a
STREAMING reader (``grafttick``, SimpleDataSourceStreamReader):
offset management, admission batching, and replay-between-offsets in
Python, value-verified through a real micro-batch aggregation.

Policy note: a Python data source pays one Python worker per
partition, like a Pandas UDF stage — it is the integration escape
hatch, not a fast path. Bulk columnar data belongs in parquet/ORC via
the JVM scans.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class GraftGenReader(DataSourceReader):
    """Yields (doc_id, shard, payload, score) rows; all content derives
    from md5(doc_id) so any engine can replay it."""

    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):  # noqa: D102 - interface method
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):  # noqa: D102
        import hashlib

        for i in range(partition.start, partition.end):
            h = hashlib.md5(str(i).encode()).hexdigest()
            # score stays UNROUNDED: the raw dyadic fraction is the
            # same double in any engine; rounding happens query-side
            # with SQL semantics so Python's bankers-rounding never
            # enters the parity surface
            yield (
                i,
                int(h[:2], 16) % 8,
                h[:16],
                int(h[16:24], 16) / float(1 << 32),
            )


class GraftGenDataSource(DataSource):
    """``spark.read.format("graftgen").option("rows", N)`` source."""

    @classmethod
    def name(cls) -> str:  # noqa: D102
        return "graftgen"

    def schema(self) -> str:  # noqa: D102
        return "doc_id bigint, shard int, payload string, score double"

    def reader(self, schema: StructType) -> DataSourceReader:  # noqa: D102
        return GraftGenReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(GraftGenDataSource)


# ---------------------------------------------------------------------------
# Python DataSource WRITER — the sink half of the §2.12 connector
# surface (the reader half is graftgen above).
# ---------------------------------------------------------------------------


class _ManifestCommit(WriterCommitMessage):
    """Per-task commit payload: row count and an exact integer
    checksum (Python ints — arbitrary precision, so the driver-side
    merge is order-free)."""

    def __init__(self, n_rows: int, checksum: int):
        self.n_rows = n_rows
        self.checksum = checksum


class ManifestWriter(DataSourceWriter):
    """Counts and checksums each partition's rows, then commits ONE
    manifest JSON from the driver — the two-phase-commit shape every
    real sink (JDBC batches, object-store multipart, Iceberg
    manifests) follows: tasks do idempotent work and return a
    message; only the driver's ``commit`` makes results visible, and
    ``abort`` leaves nothing behind.

    Expects rows with a ``f`` (hex fingerprint) column; the checksum
    is Σ int(f[:15], 16) mod 2⁶⁰ — the same fold the observability
    snapshot uses, replayable in any engine.
    """

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator):  # noqa: D102 - interface method
        n = 0
        acc = 0
        for row in iterator:
            n += 1
            acc += int(row["f"][:15], 16)
        return _ManifestCommit(n, acc)

    def commit(self, messages):  # noqa: D102
        import json
        import os

        done = [m for m in messages if m is not None]
        total = sum(m.n_rows for m in done)
        checksum = sum(m.checksum for m in done) % (1 << 60)
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, "manifest.json"), "w") as fh:
            json.dump(
                {
                    "n_rows": total,
                    "checksum": checksum,
                    "n_tasks": len(done),
                },
                fh,
            )

    def abort(self, messages):  # noqa: D102
        import os
        import shutil

        if os.path.isdir(self.path):
            shutil.rmtree(self.path, ignore_errors=True)


class ManifestSinkDataSource(DataSource):
    """``df.write.format("graftsink").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:  # noqa: D102
        return "graftsink"

    def writer(self, schema: StructType, overwrite: bool):  # noqa: D102
        return ManifestWriter(self.options)


def register_sink(spark) -> None:
    """Idempotently register the sink on a session."""
    spark.dataSource.register(ManifestSinkDataSource)


# --------------------------------------------------------------------------
# Python DataSource STREAMING reader (Spark 4 SimpleDataSourceStreamReader)
# — completes the §2.12 connector surface: batch read (graftgen),
# batch write (graftsink), and now an offset-tracked stream.
# --------------------------------------------------------------------------


class GraftTickStreamReader(SimpleDataSourceStreamReader):
    """Deterministic micro-batch tick stream: offsets are row
    positions, each ``read(start)`` serves the next ``batch`` rows of
    a fixed ``rows``-long sequence and advances the offset; at the
    end it reports no progress, so ``availableNow`` replay drains and
    terminates. Row values are pure integer arithmetic of the row id
    (``v = (i·2654435761) mod 1000003`` — Knuth's multiplicative
    hash), so a DuckDB oracle replays the WHOLE stream from
    ``range()``: the custom streaming connector is value-verified,
    not just smoke-tested. ``readBetweenOffsets`` re-serves any
    offset window exactly (the recovery/replay contract)."""

    def __init__(self, options: dict):
        self.rows_total = int(options.get("rows", 4000))
        self.batch = int(options.get("batch", 500))

    def initialOffset(self):  # noqa: D102 - interface method
        return {"pos": 0}

    def _rows(self, start: int, end: int):
        return iter(
            [(i, (i * 2654435761) % 1000003) for i in range(start, end)]
        )

    def read(self, start):  # noqa: D102 - interface method
        pos = int(start["pos"])
        end = min(pos + self.batch, self.rows_total)
        return self._rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start, end):  # noqa: D102
        return self._rows(int(start["pos"]), int(end["pos"]))


class GraftTickDataSource(DataSource):
    """``spark.readStream.format("grafttick")`` — a from-scratch
    Python STREAMING source (offset management, replay, admission
    batching all in Python)."""

    @classmethod
    def name(cls) -> str:  # noqa: D102
        return "grafttick"

    def schema(self) -> str:  # noqa: D102
        return "id bigint, v bigint"

    def simpleStreamReader(self, schema):  # noqa: D102
        return GraftTickStreamReader(self.options)


def register_stream(spark) -> None:
    """Idempotently register the grafttick streaming source."""
    spark.dataSource.register(GraftTickDataSource)
