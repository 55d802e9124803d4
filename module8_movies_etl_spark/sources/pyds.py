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

Policy note: a Python data source pays one Python worker per
partition, like a Pandas UDF stage — it is the integration escape
hatch, not a fast path. Bulk columnar data belongs in parquet/ORC via
the JVM scans.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
