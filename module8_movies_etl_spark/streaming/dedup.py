"""Streaming deduplication with bounded state.

``dropDuplicates`` on an unbounded stream keeps every key seen — state
grows forever. ``dropDuplicatesWithinWatermark`` bounds it: a key's
state is evicted once the event-time watermark passes its last-seen
timestamp plus the delay, so the state store holds only the keys of
the trailing window. The trade: a duplicate arriving AFTER its key was
evicted is emitted again — the standard at-least-once dedup contract
for infinite streams (exact global dedup over 100 TB of history is the
batch ``exact_dedup`` operator's job; this one serves the ingest path).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import (
    read_event_stream,
    run_to_memory,
    scoped_shuffle_partitions,
)

_SINK_SEQ = itertools.count()


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """First occurrence per key within the watermark horizon; state is
    evicted ``delay`` past each key's event time."""
    return (
        events.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )


def run_dedup_over_events(
    spark: SparkSession,
    sf_dir: str,
    keys: list[str] | None = None,
    delay: str = "240 hours",
) -> DataFrame:
    """Replay the streaming dedup over the finite events table with
    ``trigger(availableNow)`` and return the emitted key set.

    The default ``delay`` exceeds the table's event-time span, so no
    key is ever evicted mid-replay and no row is late — the emitted
    rows are then EXACTLY the distinct keys, which is what makes this
    real streaming execution (state store + watermark eviction logic
    engaged) hash-verifiable against a plain ``SELECT DISTINCT``
    oracle. Production callers pass a short delay and accept
    re-emission past the horizon.
    """
    from ..sources.readers import read_table
    from ..sources.scratch import mkscratch, register

    keys = keys or ["user_id", "event_type"]
    # The file-stream source needs a DIRECTORY (events.parquet is a
    # single file), and a vanilla session (inferTimestampNTZ on)
    # infers parquet timestamps as TIMESTAMP_NTZ, which watermarks
    # reject — so snapshot the needed columns to scratch and declare
    # ts as TIMESTAMP (decodes the same micros; same trick as
    # streaming.stateful).
    scratch = mkscratch("stream_dedup_")
    register(scratch)
    batch = read_table(spark, sf_dir, "events").select(
        *keys, F.col("ts").cast("timestamp").alias("ts")
    )
    batch.coalesce(1).write.mode("overwrite").parquet(scratch)
    # batch.schema already carries ts as TIMESTAMP (the cast), so use
    # it as the declared stream schema — re-inference over the INT96
    # parquet output would flip it back to NTZ under a vanilla session.
    stream = read_event_stream(spark, scratch, schema=batch.schema)
    deduped = dedup_stream(stream, keys, delay=delay)
    # Stateful streams commit one state-store partition per shuffle
    # partition per micro-batch; a default-conf session (200) spends
    # more time on store commits than on data (same scoping as
    # streaming.stateful). The conf is read at query start — scope it.
    sink = f"stream_dedup_events_{next(_SINK_SEQ)}"
    with scoped_shuffle_partitions(spark, 16):
        run_to_memory(deduped, sink, output_mode="append")
    return spark.table(sink).select(*[F.col(k) for k in keys])
