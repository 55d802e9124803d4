"""Row slices / tails / samples (SURVEY.md §2.8 L1-L2).

The reference inspects data positionally — ``df.head()``, ``df.tail()``,
``wiki_movies_raw[3600:3605]``, ``df.sample(n=5)`` (``Data
Cleaning.ipynb:831,1075,1320,1410,1500,1590``). Pandas positions are
free; a distributed table has no intrinsic order, so every operator
here takes an explicit ``order_by`` — the Spark-honest contract.
PRECONDITION: ``order_by`` must be a TOTAL order (include a unique
tiebreak column, e.g. the row id). With ties at a slice/tail
boundary, ``limit`` keeps an arbitrary subset of the tied rows that
can change with partitioning — determinism is only as strong as the
order the caller supplies. (Every catalog query passes a unique key.)

Scale shape: a naive global ``row_number()`` window sorts the ENTIRE
table in one partition. Instead, bounded slices ride on
``orderBy().limit(end)`` — Spark plans TakeOrderedAndProject (each
partition keeps its top-``end``, the driver merges k·partitions rows,
no full sort) — and only the ≤``end`` surviving rows see a window.
That holds at 100 TB for the inspection-sized slices these model; an
unbounded slice (end ~ table size) would need range partitioning +
partition-prefix sums, which nothing in the reference requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def slice_rows(
    df: DataFrame, order_by: list[str], start: int, end: int
) -> DataFrame:
    """Rows [start, end] (1-indexed, inclusive) of the total order,
    with their 1-based position as ``rn`` (reference
    ``wiki_movies_raw[3600:3605]``, ``Data Cleaning.ipynb:1410``).

    ``orderBy().limit(end)`` → TakeOrderedAndProject; the row_number
    window then orders only ``end`` rows, so the single-partition
    window is bounded by the slice, not the table.
    """
    top = df.orderBy(*order_by).limit(end)
    w = Window.orderBy(*order_by)
    return top.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") >= start
    )


def tail_rows(df: DataFrame, order_by: list[str], n: int) -> DataFrame:
    """Last ``n`` rows of the total order, returned in ascending order
    (reference ``df.tail()``, ``Data Cleaning.ipynb:1075``). Top-n on
    the REVERSED order (TakeOrderedAndProject again), re-sorted — the
    table itself is never globally sorted.
    """
    last = df.orderBy(*[F.desc(c) for c in order_by]).limit(n)
    return last.orderBy(*order_by)


def sample_rows(
    df: DataFrame, n: int, fraction: float, seed: int = 42
) -> DataFrame:
    """~``n`` pseudo-random rows: seeded Bernoulli ``sample`` then
    ``limit(n)`` (reference ``df.sample(n=5)``, ``Data
    Cleaning.ipynb:1320,1590``). ``fraction`` must oversample enough
    that ≥``n`` rows survive w.h.p. (the caller knows its table size);
    the sample predicate is pushed into the scan, so the full table is
    never materialized. Deterministic for a fixed seed AND fixed input
    partitioning — cross-engine value checks don't apply (the driver
    records a rows-only check for the catalog entry).
    """
    return df.sample(withReplacement=False, fraction=fraction, seed=seed).limit(n)
