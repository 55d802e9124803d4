"""L1/L2 slice-tail-sample operators (SURVEY.md §2.8): semantics at
sf0.001 plus the plan shapes that make them 100 TB-safe (bounded
TakeOrderedAndProject, never a full global sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import slices
from module8_movies_etl_spark.sources import read_table

SF = "/root/testdata/sf0.001"


def test_slice_rows_matches_sorted_positions(spark):
    o = read_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    got = slices.slice_rows(o, ["o_orderkey"], 361, 365).collect()
    want = [
        r.o_orderkey
        for r in o.orderBy("o_orderkey").limit(365).collect()[360:365]
    ]
    assert [r.o_orderkey for r in got] == want
    assert [r.rn for r in got] == [361, 362, 363, 364, 365]


def test_slice_out_of_range_is_empty(spark):
    o = read_table(spark, SF, "orders")
    assert slices.slice_rows(o, ["o_orderkey"], 10**9, 10**9 + 4).count() == 0


def test_tail_rows_returns_last_n_ascending(spark):
    o = read_table(spark, SF, "orders").select("o_orderkey")
    got = [r.o_orderkey for r in slices.tail_rows(o, ["o_orderkey"], 5).collect()]
    all_keys = sorted(r.o_orderkey for r in o.collect())
    assert got == all_keys[-5:]


def test_sample_rows_deterministic_and_sized(spark):
    o = read_table(spark, SF, "orders").select("o_orderkey")
    a = {r.o_orderkey for r in slices.sample_rows(o, 5, 0.05, seed=42).collect()}
    b = {r.o_orderkey for r in slices.sample_rows(o, 5, 0.05, seed=42).collect()}
    assert len(a) == 5
    assert a == b, "fixed seed + fixed input must be deterministic"
    c = {r.o_orderkey for r in slices.sample_rows(o, 5, 0.05, seed=7).collect()}
    assert a != c, "different seed should (w.h.p.) pick different rows"


def test_slice_and_tail_plans_are_bounded_topk(spark):
    """Neither op may globally sort the table: both must plan
    TakeOrderedAndProject on the full scan."""
    o = read_table(spark, SF, "orders").select("o_orderkey")
    for df in (
        slices.slice_rows(o, ["o_orderkey"], 361, 365),
        slices.tail_rows(o, ["o_orderkey"], 5),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_sample_pushes_predicate_into_scan(spark):
    """The Bernoulli sample must run as a Sample node over the scan —
    no shuffle, no materialization of the unsampled table."""
    o = read_table(spark, SF, "orders").select("o_orderkey")
    plan = (
        slices.sample_rows(o, 5, 0.05, seed=42)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Sample" in plan and "Exchange" not in plan.split("Sample")[1], plan[:1500]
