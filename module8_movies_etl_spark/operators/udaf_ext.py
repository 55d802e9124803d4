"""Pandas UDAF extension point (Arrow-vectorized grouped aggregation).

The last of the engine's four Python escape hatches, completing the
§2.12 surface: scalar Pandas UDFs / ``mapInPandas``
(``operators.multimodal``), grouped-map ``applyInPandas``
(``operators.stats.trend_slope_grouped_map``), Python UDTFs
(``operators.udtf_ext``), and — here — a GROUPED-AGG ``pandas_udf``:
one Arrow batch of column Series in, ONE scalar out per group, usable
inside an ordinary ``groupBy().agg(...)`` next to native aggregates.

Policy unchanged: UDFs are the slow path, and an aggregate UDF has a
scale caveat the others don't — Spark materializes EACH GROUP's
column values in memory to evaluate it (no partial aggregation /
map-side combine, unlike native aggregates), so it is only a sound
plan when per-group cardinality is bounded (here: line items per
supplier). The shipped example is deliberately chosen so a NATIVE
formulation exists (``weighted_median_native``, two window passes) and
the test suite pins the two paths row-for-row equal — the extension
point is *validated against* the native path, and the catalog entry
carries a full DuckDB oracle like any other operator.

Weighted median (lower): the smallest value v whose cumulative weight
(including ties on v) reaches half the total weight — selection, not
accumulation, so the result is an actual data value and the answer is
EXACT and order-independent (integer weight comparisons; no float
summation order to drift across engines or partitionings).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# DoubleType() object, not the "double" DDL string: parsing a DDL
# string requires an ACTIVE SparkSession at decoration time, and this
# module must stay importable session-free (catalog tooling imports
# the query registry without starting a JVM).
@pandas_udf(DoubleType())
def _weighted_median_agg(v: pd.Series, w: pd.Series) -> float:  # type: ignore[misc]
    """Lower weighted median of ``v`` under integer weights ``w``.

    Sort by value, accumulate weights, return the first value whose
    doubled cumulative weight reaches the total — ``2*cw >= tot`` in
    integers, so no division and no float comparison. Ties on v are
    safe with an element-wise cumsum: the threshold crossing can only
    land inside or at the end of a tie run, and every element of the
    run carries the same v.
    """
    import numpy as np

    vv = v.to_numpy(dtype="float64")
    ww = w.to_numpy(dtype="int64")
    if len(vv) == 0:
        return None
    order = np.argsort(vv, kind="mergesort")
    cw = np.cumsum(ww[order])
    tot = cw[-1]
    idx = int(np.searchsorted(2 * cw, tot, side="left"))
    return float(vv[order][idx])


def weighted_median_udaf(
    df: DataFrame, key_col: str, value_col: Column, weight_col: Column
) -> DataFrame:
    """Per-key lower weighted median via the GROUPED-AGG pandas UDF —
    the grouped-aggregate Python extension point, exercised end to end.

    Returns (key, wmedian). Weights must be integral (cast upstream);
    NULL values/weights are dropped before aggregation so the Python
    side never sees NaN (pandas would silently sort NaN last and
    corrupt the cumulative weight).
    """
    prepared = df.select(
        F.col(key_col),
        value_col.cast("double").alias("_v"),
        weight_col.cast("long").alias("_w"),
    ).filter(F.col("_v").isNotNull() & F.col("_w").isNotNull())
    return prepared.groupBy(key_col).agg(
        _weighted_median_agg(F.col("_v"), F.col("_w")).alias("wmedian")
    )


def weighted_median_native(
    df: DataFrame, key_col: str, value_col: Column, weight_col: Column
) -> DataFrame:
    """The native twin: two windows over one shuffle on the key —
    peer-inclusive cumulative weight (RANGE frame over the value
    order) and the per-key total — then min(v) where 2*cum >= total.
    This is the formulation the DuckDB oracle replays, and what a
    100 TB plan should use (native partial aggregation, no per-group
    materialization); the UDAF exists to validate the extension
    point against it.
    """
    vv = value_col.cast("double")
    ww = weight_col.cast("long")
    base = df.select(
        F.col(key_col), vv.alias("_v"), ww.alias("_w")
    ).filter(F.col("_v").isNotNull() & F.col("_w").isNotNull())
    # RANGE frame: rows tied on _v all see the run's full weight
    cum_w = (
        Window.partitionBy(key_col)
        .orderBy("_v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy(key_col)
    flagged = base.select(
        F.col(key_col),
        "_v",
        (F.sum("_w").over(cum_w) * 2 >= F.sum("_w").over(tot_w)).alias("_hit"),
    )
    return (
        flagged.filter("_hit")
        .groupBy(key_col)
        .agg(F.min("_v").alias("wmedian"))
    )
