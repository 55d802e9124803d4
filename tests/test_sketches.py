"""KMV sketch quality and exactness-mode tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import aggregates
from module8_movies_etl_spark.sources import read_table

SF = "/root/testdata/sf0.01"


def test_kmv_estimate_within_error_bound(spark):
    """k=64 → σ ≈ 1/√(k−2) ≈ 12.7%; assert within 4σ of the exact
    distinct count for every group that saturates the sketch."""
    e = read_table(spark, SF, "events")
    sk = {
        r.event_type: (r.n_exactish, r.kmv_estimate)
        for r in aggregates.kmv_distinct_sketch(
            e, ["event_type"], "user_id", k=64
        ).collect()
    }
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(sk) == set(exact)
    for t, (n_entries, est) in sk.items():
        if n_entries < 64:  # unsaturated → exact by construction
            assert est == exact[t]
        else:
            rel = abs(est - exact[t]) / exact[t]
            assert rel < 0.51, (t, est, exact[t])


def test_kmv_exact_mode_below_k(spark):
    """Groups with fewer than k distinct values are reported exactly."""
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i) for i in range(30)],
        "g string, v int",
    )
    got = {
        r.g: (r.n_exactish, r.kmv_estimate)
        for r in aggregates.kmv_distinct_sketch(df, ["g"], "v", k=64).collect()
    }
    assert got["a"] == (7, 7.0)
    assert got["b"] == (30, 30.0)


def test_kmv_merge_property(spark):
    """Sketching the union equals sketching all rows at once (the
    sketch is a pure function of the distinct hash set)."""
    e = read_table(spark, SF, "events")
    half1 = e.filter(F.col("event_id") % 2 == 0)
    half2 = e.filter(F.col("event_id") % 2 == 1)
    merged = aggregates.kmv_distinct_sketch(
        half1.unionByName(half2), ["event_type"], "user_id", k=64
    )
    whole = aggregates.kmv_distinct_sketch(e, ["event_type"], "user_id", k=64)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }
