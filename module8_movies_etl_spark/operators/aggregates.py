"""Aggregations & profiling (SURVEY.md §2.4 A1-A6).

The notebook's human-in-the-loop QA (value_counts / describe / null
profiling / distinct probes) becomes a first-class profiling module:
every operator is a single-pass aggregate with map-side partials —
the shapes that stay cheap when the input is 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_count(df: DataFrame, keys: list[str], name: str = "count") -> DataFrame:
    """A1: multi-key group-by count (reference ``challenge.py:293``:
    26M ratings → 239,381 (movieId, rating) groups). Partial+final hash
    aggregate; shuffle only carries one long per group per mapper.
    """
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(name))


def null_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """A2: per-column null counts in ONE pass (reference
    ``challenge.py:110``; notebook ``Data Cleaning.ipynb:3767``).
    Output: single row, one column per input column.
    """
    cols = columns or df.columns
    return df.select(
        *[F.sum(F.col(f"`{c}`").isNull().cast("long")).alias(c) for c in cols]
    )


def value_counts(
    df: DataFrame, column: str, dropna: bool = False, name: str = "count"
) -> DataFrame:
    """A3: frequency table, count-descending (pandas ``value_counts``;
    notebook ``Data Cleaning.ipynb:5123,5334,6951,6991``).
    ``dropna=False`` keeps the NULL bucket, like the notebook's calls.
    """
    out = df if not dropna else df.filter(F.col(column).isNotNull())
    return (
        out.groupBy(column)
        .agg(F.count(F.lit(1)).alias(name))
        .orderBy(F.desc(name), F.col(column))
    )


def summary_stats(df: DataFrame, column: str) -> DataFrame:
    """A4: describe() — count/mean/std/min/quartiles/max (notebook
    ``Data Cleaning.ipynb:5613``). Exact percentiles via
    ``percentile`` (interpolating, matching pandas/DuckDB
    ``quantile_cont``); swap to ``percentile_approx`` at the 100 TB
    tier where an exact sort per column is not worth it.
    """
    c = F.col(column)
    return df.agg(
        F.count(c).alias("count"),
        F.avg(c).alias("mean"),
        F.stddev(c).alias("std"),
        F.min(c).alias("min"),
        F.expr(f"percentile(`{column}`, 0.25)").alias("p25"),
        F.expr(f"percentile(`{column}`, 0.5)").alias("p50"),
        F.expr(f"percentile(`{column}`, 0.75)").alias("p75"),
        F.max(c).alias("max"),
    )


def histogram(df: DataFrame, column: str, bin_width: float) -> DataFrame:
    """A5: fixed-width histogram (notebook ``Data Cleaning.ipynb:5612``).
    Bin = floor(x / width) * width; single hash aggregate.
    """
    bin_col = (F.floor(F.col(column) / F.lit(bin_width)) * F.lit(bin_width)).alias("bin")
    return (
        df.select(bin_col)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("bin")
    )


def distinct_counts(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """A6: per-column distinct cardinality (notebook degenerate-column
    scan, ``Data Cleaning.ipynb:7675-7685``). ``approx=True`` switches
    to HyperLogLog (``approx_count_distinct``) — the only sane choice
    at 100 TB; exact mode expands to one shuffle per column.
    """
    cols = columns or df.columns

    def agg(c: str) -> Column:
        f = F.approx_count_distinct if approx else F.count_distinct
        return f(F.col(f"`{c}`")).alias(c)

    return df.select(*[agg(c) for c in cols])
