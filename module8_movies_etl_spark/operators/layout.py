"""Data-layout keys: Z-order (Morton) interleaving for multi-column
clustering.

At 100 TB, scan pruning is the cheapest optimization there is: files
sorted by ONE column prune only on that column, while writing files
clustered by the Z-value of two (or more) columns gives every file a
tight min/max envelope on BOTH — point/range predicates on either
column skip most files (the Delta/Iceberg OPTIMIZE ZORDER idea,
reimplemented as a plain column expression + range repartition).

The code is a flat bit-interleave expression — pure codegen, no UDF,
and bit-exact replayable in any engine with integer shifts.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def minmax_scale(x: Column, xmin: Column, xmax: Column, bits: int = 10) -> Column:
    """Scale an integer column to [0, 2^bits) over its [min, max]
    range with pure integer arithmetic (exact in any engine):
    ``(x - min) * (2^bits - 1) div max(max - min, 1)``.

    Z-ordering REQUIRES this normalization: raw columns with
    mismatched magnitudes (an 8-bit key vs 14-bit epoch-days) put one
    column's high bits above all of the other's, and the interleave
    degenerates to a single-column sort (measured: zero custkey
    locality on the orders table before scaling).
    """
    top = F.lit((1 << bits) - 1)
    span = F.greatest(xmax.cast("long") - xmin.cast("long"), F.lit(1))
    num = (x.cast("long") - xmin.cast("long")) * top
    # exact floor division in Column algebra: (n - n mod s) is
    # divisible by s, so the double division is exact and the cast
    # cannot cross an integer boundary (n stays far below 2^52)
    return ((num - F.pmod(num, span)) / span).cast("long")


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative integer
    columns into a Z-value: x's bit i lands at position 2i, y's at
    2i+1. Build-time loop, flat codegen'd expression at runtime.
    Inputs should be comparably scaled — see ``minmax_scale``.
    """
    xm = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_by(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    n_files: int = 32,
    bits: int = 10,
) -> DataFrame:
    """Range-repartition by the normalized Morton code of (x, y) —
    the write-side layout step: each output partition (→ file) covers
    a compact Z range, i.e. a small rectangle in (x, y) space, so
    min/max file stats prune on both columns. Sort-within-partitions
    tightens row-group stats too.

    Column stats (min/max for the normalization) come from one
    aggregate broadcast back onto the stream — the same
    stats-then-rewrite pass any OPTIMIZE ZORDER job runs.
    """
    from pyspark.sql.functions import broadcast

    stats = df.select(
        F.min(x_col).alias("_xmin"),
        F.max(x_col).alias("_xmax"),
        F.min(y_col).alias("_ymin"),
        F.max(y_col).alias("_ymax"),
    )
    z = morton_code(
        minmax_scale(x_col, F.col("_xmin"), F.col("_xmax"), bits),
        minmax_scale(y_col, F.col("_ymin"), F.col("_ymax"), bits),
        bits=bits,
    )
    return (
        df.crossJoin(broadcast(stats))
        .withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_xmin", "_xmax", "_ymin", "_ymax")
    )


def compaction_plan(
    files: DataFrame,
    part_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction planner: assign each file to an output
    bin of ~``target_bytes`` within its partition — the OPTIMIZE /
    bin-pack step every lakehouse table service runs, expressed as a
    pure window computation.

    Assignment is FIXED-QUOTA CUMULATIVE BINNING in deterministic
    ``file_col`` order: ``bin = floor(cumsum_before / target)`` — the
    bin index is which target-sized quota the file's running offset
    falls in. This folds into one window (true next-fit carries
    per-bin fill state — a sequential recurrence no window
    expresses) and matches next-fit exactly while every file is
    ≤ target. The deviation: a file larger than k·target consumes k
    quotas, so its SUCCESSOR can land in a fresh under-filled bin
    that next-fit would have merged forward (e.g. sizes [5,20,5,20]
    at target 10 → bins 0,0,2,3: bin 2 holds one 5-byte file).
    Oversized files are already single-file bins under any policy, so
    the cost is bounded at one fragmented bin per oversized file —
    acceptable for a table service whose inputs are SMALL files by
    definition; a service with many over-target inputs should split
    them upstream, not bin-pack them.

    All integer arithmetic — exact in any engine. One shuffle on the
    partition key; at 100 TB the row count is the FILE count (millions,
    not billions), and each partition's plan is independent.

    Returns (part, file, size, bin, bin_files, bin_bytes).
    """
    w = Window.partitionBy(part_col).orderBy(file_col)
    before = F.coalesce(
        F.sum(size_col).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("long")
    # keep the ORIGINAL column names through both windows: renaming
    # between them breaks alias-aware partitioning propagation and
    # costs a third exchange; partitioning by part_col satisfies the
    # (part_col, bin) window's clustering, so the second window rides
    # the first's shuffle
    binned = files.select(
        F.col(part_col),
        F.col(file_col),
        F.col(size_col).cast("long").alias("_sz"),
        F.floor(before / F.lit(target_bytes)).cast("long").alias("bin"),
    )
    wb = Window.partitionBy(part_col, "bin")
    return binned.select(
        F.col(part_col).alias("part"),
        F.col(file_col).alias("file"),
        F.col("_sz").alias("size"),
        "bin",
        F.count(F.lit(1)).over(wb).cast("long").alias("bin_files"),
        F.sum("_sz").over(wb).cast("long").alias("bin_bytes"),
    )


# --------------------------------------------------------------------------
# Physical layout features: bucketed (co-located) joins and
# partition-pruned scans — cached one build per process per sf_dir.
# --------------------------------------------------------------------------

_BUCKETED_CACHE: dict = {}
_MONTH_PART_CACHE: dict = {}


def bucketed_pair(spark, sf_dir: str, n_buckets: int = 16):
    """Create ONCE per (process, sf_dir) a pair of managed tables —
    orders and customer projected to the join key — both
    ``bucketBy(n_buckets, cust_id)`` + ``sortBy`` on write. Returns
    the two table names.

    Bucketing is THE shuffle eliminator for repeated big joins: both
    sides land in co-located, pre-sorted buckets, so a sort-merge
    join over them needs NO Exchange on either side (pinned by
    ``test_bucketed_join_has_no_join_exchange``) — at 100 TB that is
    the difference between re-shuffling petabytes per join and
    streaming matched buckets. The warehouse dir is process-scratch
    (in-memory catalog; files overwritten on rebuild).
    """
    from pyspark.sql import functions as F

    from ..sources.readers import read_table

    key = (sf_dir, n_buckets)
    if key in _BUCKETED_CACHE:
        # liveness check (the windows.py _scratch_has_data discipline):
        # a new Spark session's in-memory catalog forgets the tables,
        # and external warehouse cleanup can orphan the entry — verify
        # both tables still resolve before trusting the cache
        cached = _BUCKETED_CACHE[key]
        if all(spark.catalog.tableExists(t) for t in cached):
            return cached
        del _BUCKETED_CACHE[key]
    import hashlib

    tag = hashlib.md5(f"{sf_dir}:{n_buckets}".encode()).hexdigest()[:8]
    names = (f"b_orders_{tag}", f"b_customer_{tag}")
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust_id"), "o_totalprice"
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"), "c_mktsegment"
    )
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path
    for df, name in ((o, names[0]), (c, names[1])):
        # DROP alone is not enough: a PREVIOUS process's in-memory
        # catalog died with its tables, but the warehouse directories
        # survive and saveAsTable refuses the location — clear both.
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
        (
            df.write.bucketBy(n_buckets, "cust_id")
            .sortBy("cust_id")
            .mode("overwrite")
            .saveAsTable(name)
        )
    _BUCKETED_CACHE[key] = names
    return names


def month_partitioned_orders(spark, sf_dir: str) -> str:
    """Write ONCE per (process, sf_dir) the orders table
    hive-partitioned by order month (``order_month=yyyy-MM`` dirs) to
    scratch and return the path. A month-predicated read then prunes
    at PLANNING time — the scan never opens non-matching partitions
    (``PartitionFilters`` in the plan, pinned by test) — the
    time-travel-free version of what every 100 TB fact table does
    with its date partition column.
    """
    from pyspark.sql import functions as F

    from ..sources.readers import read_table
    from ..sources.scratch import mkscratch, register

    if sf_dir in _MONTH_PART_CACHE:
        # liveness check: scratch.release()/external cleanup can delete
        # the partition dirs out from under the cache — rebuild on miss
        # instead of failing the read (hive layout: data files live
        # under order_month=* subdirs, so walk rather than listdir)
        cached = _MONTH_PART_CACHE[sf_dir]
        if any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(cached)
            for f in fs
        ):
            return cached
        del _MONTH_PART_CACHE[sf_dir]
    path = mkscratch("orders_bymonth_")
    register(path)
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
    )
    o.write.partitionBy("order_month").mode("overwrite").parquet(path)
    _MONTH_PART_CACHE[sf_dir] = path
    return path
