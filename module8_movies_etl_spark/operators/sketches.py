"""Mergeable frequency sketches (SURVEY.md §2.13 extension).

Count-min (Cormode & Muthukrishnan 2005): a depth×width counter grid;
each item increments one counter per row (bucket = hash_i(item) mod
width); the frequency estimate is the MIN over its depth counters —
always ≥ the true count, with overestimate bounded by
``e/width · total_count`` per row w.p. ``1 − e^{-depth}``.

Like the KMV sketch (``aggregates.kmv_distinct_sketch``), all hashing
is public md5 arithmetic, so the ESTIMATES — not just the exact
counts — are bit-for-bit reproducible by any SQL engine and the
driver hash-verifies them.

Scale shape (the reason a 100 TB pipeline carries one): the counter
grid is ``depth × width`` rows REGARDLESS of input size — here 4×256
= ≤1,024 groups. Building it is one hash aggregate whose map-side
partials collapse to ≤1,024 rows per task before the shuffle; probing
it is a broadcast join. The grid is mergeable (counters add), so
per-day / per-partition sketches combine without re-reading history —
the streaming-friendly property exact counts lack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(item: F.Column, row: int, width: int) -> F.Column:
    """Row ``row``'s bucket for ``item``: top-60-bit md5 of the salted
    item, mod width — portable to any engine with md5."""
    h = F.conv(
        F.substring(F.md5(F.concat(item, F.lit(f"#{row}"))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width)).cast("int")


def cms_build(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min counter grid over an item stream (one input row = one
    occurrence). Returns (row, bucket, cnt) — ≤ depth·width rows.

    One narrow projection fans each occurrence into ``depth`` (row,
    bucket) pairs, then a single hash aggregate builds the grid; with
    ≤ depth·width distinct groups the map-side partials do almost all
    of the counting before the (tiny) shuffle.
    """
    pairs = items.select(
        F.posexplode(
            F.array(*[_bucket(F.col(item_col), r, width) for r in range(depth)])
        ).alias("row", "bucket")
    )
    return pairs.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    grid: DataFrame, probes: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query the sketch: estimate = min over rows of the item's
    counter. ``grid`` is ≤ depth·width rows → broadcast; the probe
    side streams. Adds ``cms_estimate`` (long) to ``probes``.
    """
    fan = probes.select(
        "*",
        F.posexplode(
            F.array(*[_bucket(F.col(item_col), r, width) for r in range(depth)])
        ).alias("row", "bucket"),
    )
    keep = [c for c in probes.columns]
    return (
        fan.join(F.broadcast(grid), ["row", "bucket"])
        .groupBy(*keep)
        .agg(F.min("cnt").alias("cms_estimate"))
    )
