"""Filters & data-dependent pruning (SURVEY.md §2.2).

Most reference filters (P1-P7, P10-P11) are plain ``df.filter``
expressions — declared inline by callers so Catalyst pushes them into
the scan. The two operators that genuinely need engine code are here:

- P8  statistics-driven column pruning (two-phase, data-dependent)
- P9  deterministic keep-first dedup (pandas ``drop_duplicates`` parity)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def null_prune(df: DataFrame, threshold: float = 0.9) -> list[str]:
    """P8 phase one: columns with < ``threshold`` null fraction.

    The reference prunes 191 → 21 columns by comparing per-column null
    counts to ``0.9 * len(df)`` (reference ``challenge.py:110-111``).
    Data-dependent → cannot be a Catalyst rule (plan-time schema);
    instead ONE aggregate computes every null count in a single pass
    (partial aggregation map-side, one row shuffled), then the driver
    builds the keep-list.
    """
    n = df.count()
    if n == 0:
        return list(df.columns)
    counts = df.select(
        *[
            F.sum(F.col(f"`{c}`").isNull().cast("long")).alias(c)
            for c in df.columns
        ]
    ).first()
    return [c for c in df.columns if counts[c] < threshold * n]


def prune_mostly_null_columns(df: DataFrame, threshold: float = 0.9) -> DataFrame:
    """P8 phase two: project to the kept columns."""
    kept = null_prune(df, threshold)
    return df.select(*[F.col(f"`{c}`") for c in kept])


def dedup_by_key(
    df: DataFrame, keys: list[str], order_by: list[str] | None = None
) -> DataFrame:
    """P9: duplicate elimination, first-occurrence-kept.

    pandas ``drop_duplicates(subset='imdb_id')`` keeps the FIRST row in
    file order (reference ``Data Cleaning.ipynb:3696``); Spark's
    ``dropDuplicates`` keeps an arbitrary row. For deterministic parity
    the engine ranks within each key by ``order_by`` (a stable tiebreak
    the caller supplies — e.g. a monotonically increasing load id) and
    keeps rank 1. With no ``order_by`` it falls back to
    ``dropDuplicates`` (cheaper: partial agg, no full sort per key).

    Scale: one hash shuffle on ``keys`` either way; the window variant
    sorts only within each key group.
    """
    if not order_by:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
