"""As-of join golden tests: merge-sorted implementation vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import asof
from module8_movies_etl_spark.sources import read_table

SF = "/root/testdata/sf0.001"


def test_asof_backward_matches_bruteforce(spark):
    e = read_table(spark, SF, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    got = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in asof.asof_join_backward(
            purchases,
            clicks,
            ["user_id"],
            "ts",
            "ts",
            payload_cols=["value"],
            # make equal-ts winners deterministic, matching the tuple
            # max below (fixture ts are µs-distinct, but don't rely on it)
            tiebreak_cols=["value"],
        ).collect()
    }

    # brute force: for each purchase, the click row with max ts <= purchase ts
    clicks_by_user: dict[int, list] = {}
    for r in clicks.collect():
        clicks_by_user.setdefault(r.user_id, []).append((r.ts, r.value))
    want = {}
    for r in purchases.collect():
        prior = [c for c in clicks_by_user.get(r.user_id, []) if c[0] <= r.ts]
        want[r.event_id] = max(prior) if prior else (None, None)
    assert len(got) == purchases.count()
    assert got == {k: (v[0], v[1]) for k, v in want.items()}
    # at least one match and one no-match should exist in the fixture
    assert any(v[0] is not None for v in got.values())


def test_asof_inclusive_tie_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 5), (3, 200, 30)],
        "id int, user_id int, ts int",
    )
    right = spark.createDataFrame(
        [(100, 10, "at"), (100, 8, "before"), (200, 31, "after")],
        "user_id int, ts int, tag string",
    )
    rows = {
        r.id: (r.asof_ts, r.asof_tag)
        for r in asof.asof_join_backward(
            left, right, ["user_id"], "ts", "ts", payload_cols=["tag"]
        ).collect()
    }
    assert rows[1] == (10, "at")  # inclusive: right AT left ts matches
    assert rows[2] == (None, None)  # all right rows are after left ts=5
    assert rows[3] == (None, None)  # right exists only after left ts


def test_asof_plan_is_single_exchange(spark):
    """The merge-sorted as-of join must shuffle ONCE (the window's
    partitionBy) — no join operator, no second exchange."""
    e = read_table(spark, SF, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    res = asof.asof_join_backward(
        purchases, clicks, ["user_id"], "ts", "ts", payload_cols=[]
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1, plan


def test_range_join_binned_matches_bruteforce(spark):
    """Bin-and-verify range join equals the naive non-equi join, for a
    window that spans bins and one fully inside a bin."""
    from module8_movies_etl_spark.operators import rangejoin

    e = read_table(spark, SF, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("es")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_timestamp("ts").alias("c_es")
    )
    for lower, upper, width in ((-600, 0, None), (-3600, 1800, 1000)):
        got = {
            (r.event_id, r.c_es)
            for r in rangejoin.range_join_binned(
                errors, clicks, ["user_id"], "es", "c_es",
                lower=lower, upper=upper, bin_width=width,
            ).collect()
        }
        want = {
            (r.event_id, r.c_es)
            for r in errors.join(
                clicks,
                (errors.user_id == clicks.user_id)
                & (clicks.c_es >= errors.es + lower)
                & (clicks.c_es < errors.es + upper),
            ).collect()
        }
        assert got == want and len(want) > 0, (lower, upper, width)


def test_range_join_rejects_empty_window(spark):
    import pytest as _pytest

    from module8_movies_etl_spark.operators import rangejoin

    df = spark.range(1).withColumnRenamed("id", "v")
    with _pytest.raises(ValueError, match="empty window"):
        rangejoin.range_join_binned(df, df, [], "v", "v", lower=5, upper=5)
