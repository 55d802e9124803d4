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


def kmv_distinct_sketch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per group — the
    classic mergeable cardinality sketch (Bar-Yossef et al. 2002),
    built from public md5 arithmetic so the estimate is bit-for-bit
    reproducible by any SQL engine (unlike HLL registers, whose
    hashing is engine-private).

    Hash each value to U(0,1) via the top 60 bits of md5; keep each
    group's k smallest hashes; with m_k = the k-th smallest,
    estimate distinct = (k-1)/m_k. Groups with fewer than k distinct
    hashes are exact (the sketch saw everything). Relative error
    ~ 1/sqrt(k-2).

    Scale shape: the k-smallest selection is a partial_agg-friendly
    ``min_by``-style pattern — here expressed as collect of the
    per-group TOP-K via window rank over hashes, which shuffles only
    (group, hash) pairs. At 100 TB, k bounded (64) keeps state tiny
    and the sketch MERGEABLE across partitions/days: union two
    sketches = union hash sets, re-take k smallest.

    Returns (keys..., n_exactish, kmv_estimate): n_exactish is the
    number of sketch entries (== distinct count when < k).
    """
    from pyspark.sql import Window

    h = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(1 << 60))
    ).alias("_h")
    # NULLs contribute nothing (COUNT DISTINCT semantics); unfiltered,
    # a NULL hash would rank FIRST under Spark's nulls-first asc and
    # shift the k-th minimum, inflating the estimate.
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*[F.col(c) for c in keys], h)
        .dropDuplicates([*keys, "_h"])
    )
    w = Window.partitionBy(*keys).orderBy("_h")
    topk = hashed.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k
    )
    return (
        topk.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_entries"),
            F.max(F.when(F.col("_r") == k, F.col("_h"))).alias("_mk"),
        )
        .select(
            *keys,
            F.col("n_entries").cast("long").alias("n_exactish"),
            F.round(
                F.when(
                    F.col("_mk").isNotNull(), F.lit(float(k - 1)) / F.col("_mk")
                ).otherwise(F.col("n_entries").cast("double")),
                2,
            ).alias("kmv_estimate"),
        )
    )
