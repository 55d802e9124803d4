"""Data-quality audit (Deequ-style constraint checking).

The reference eyeballs its data with ``df.isnull().sum()`` /
``value_counts`` (Data Cleaning.ipynb throughout); this is the
systematized form a production pipeline runs as a gate: a fixed set
of constraints evaluated in one pass each, emitted as a tidy
(metric, value) table a monitor can diff across runs.

Scale shape: each metric is a scan+aggregate; referential checks are
anti-joins whose dimension side broadcasts. Metrics union into one
result — Spark runs the branches as independent stages, so a
1000-executor cluster evaluates them concurrently; none shuffles more
than its own aggregation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _metric(name: str, value_col: F.Column, df: DataFrame) -> DataFrame:
    return df.agg(value_col.cast("long").alias("value")).select(
        F.lit(name).alias("metric"), "value"
    )


def dq_audit(
    orders: DataFrame, lineitem: DataFrame, customer: DataFrame
) -> DataFrame:
    """Constraint audit over the order fact tables → (metric, value):

    - ``orders_rows`` — row count (volume monitor);
    - ``null_custkey`` — completeness of the FK column;
    - ``dup_orderkeys`` — primary-key uniqueness violations;
    - ``fk_orphan_orders`` — orders whose customer is missing
      (referential integrity, anti-join with broadcast dim);
    - ``fk_orphan_lineitems`` — lineitems whose order is missing;
    - ``nonpositive_price`` — domain constraint on o_totalprice.
    """
    dup_keys = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
    )
    orphan_orders = orders.join(
        broadcast(customer.select("c_custkey")),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    orphan_lineitems = lineitem.join(
        orders.select("o_orderkey"),
        lineitem.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    )
    metrics = [
        _metric("orders_rows", F.count(F.lit(1)), orders),
        _metric(
            "null_custkey",
            F.count(F.lit(1)) - F.count("o_custkey"),
            orders,
        ),
        _metric("dup_orderkeys", F.count(F.lit(1)), dup_keys),
        _metric("fk_orphan_orders", F.count(F.lit(1)), orphan_orders),
        _metric("fk_orphan_lineitems", F.count(F.lit(1)), orphan_lineitems),
        _metric(
            "nonpositive_price",
            # coalesce: sum over an EMPTY table is NULL where every
            # other metric (and the oracle's coalesce) reports 0
            F.coalesce(
                F.sum((F.col("o_totalprice") <= 0).cast("long")),
                F.lit(0).cast("long"),
            ),
            orders,
        ),
    ]
    return reduce(DataFrame.unionByName, metrics)
