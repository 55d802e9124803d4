"""Robust statistics: percentile clipping and rank bucketing.

Training-data and analytics pipelines routinely clip heavy-tailed
numeric features before aggregation (winsorization) and bucket
entities into quantile bands (deciles) for cohorting and rebalancing.
Both are thin compositions of exact percentile aggregates and rank
windows — no UDFs, everything JVM-side — and both replay exactly in
ANSI SQL (``quantile_cont`` / ``NTILE``), so the driver hash-verifies
them end to end.

Reference seed: the exploratory notebook's distribution QA
(``Data Cleaning.ipynb:5612-5613`` — describe/hist before trusting a
column) is the manual form of this; winsorize/deciles are the
productionized, scale-safe versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` to its exact [lo, hi] percentile band.

    The thresholds are ONE exact-percentile aggregate (a single scalar
    row — ``percentile`` uses the same linear interpolation as ANSI
    ``quantile_cont``, parity pinned by ``quantiles_by_status``),
    broadcast back over the table with a cross join. At 100 TB the
    threshold pass is a full scan but reduces to 16 bytes; the clip
    itself is a narrow projection. Thresholds are rounded to 4 decimals
    on BOTH engine and oracle sides so a last-ulp interpolation
    difference can never flip a comparison at the clip boundary.
    """
    out_col = out_col or f"{value_col}_w"
    v = F.col(value_col).cast("double")
    bounds = df.agg(
        F.round(F.percentile(v, F.lit(lo)), 4).alias("_lo"),
        F.round(F.percentile(v, F.lit(hi)), 4).alias("_hi"),
    )
    clipped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, clipped)
        .drop("_lo", "_hi")
    )


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    n: int = 10,
    out_col: str = "bucket",
) -> DataFrame:
    """Assign each row an ``NTILE(n)`` bucket over a deterministic
    total order (``value_col`` desc, ``tie_col`` asc — the tie column
    must be unique so engines cannot disagree on equal values).

    NTILE is rank arithmetic, not value interpolation — floor-based
    group sizes per the SQL standard, identical across engines. The
    global order is a single-axis sort; at scale the input to this is
    an already-aggregated entity table (customers, domains), orders of
    magnitude smaller than the fact table that produced it, so the one
    range-partitioned sort is bounded.
    """
    w = Window.orderBy(F.desc(value_col), F.asc(tie_col))
    return df.withColumn(out_col, F.ntile(n).over(w).cast("long"))
