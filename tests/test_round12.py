"""Round-7 pins: the distributed ``global_rank`` primitive and
plain-Python / hand-fixture references for catalog queries that only
had hash oracles (gini, funnel, transitions, RRF fusion) — each
reference derived independently of both the Spark code and the DuckDB
oracle SQL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import robust
from module8_movies_etl_spark.plans.benchmark_queries import QUERIES


def test_global_rank_matches_sorted_order(spark):
    rows = [(i, (i * 37) % 11) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long")
    ranked, total = robust.global_rank(df, "v", "id", ascending=True)
    assert total == 200
    got = {r["id"]: r["rank0"] for r in ranked.collect()}
    expect = {
        rid: i
        for i, (rid, _v) in enumerate(
            sorted(rows, key=lambda t: (t[1], t[0]))
        )
    }
    assert got == expect


def test_global_rank_descending_and_empty(spark):
    df = spark.createDataFrame([(1, 5), (2, 9), (3, 5)], "id long, v long")
    ranked, total = robust.global_rank(df, "v", "id", ascending=False)
    assert total == 3
    assert {r["id"]: r["rank0"] for r in ranked.collect()} == {
        2: 0,
        1: 1,
        3: 2,
    }
    empty, n = robust.global_rank(
        df.filter(F.col("id") > 99), "v", "id"
    )
    assert n == 0 and empty.count() == 0


def test_gini_matches_mean_absolute_difference_reference(spark, sf_dir):
    # Independent definition: G = sum_ij |x_i - x_j| / (2 n^2 mu) —
    # the O(n^2) textbook form, nothing shared with the rank identity
    # the operator uses or the oracle's SQL.
    [r] = QUERIES["gini_customer_spend"](spark, sf_dir).collect()
    xs = [
        int(row["x"] * 100)  # exact cents from the DECIMAL(18,2) sum
        for row in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
        .collect()
    ]
    n, sx = len(xs), sum(xs)
    mad = sum(abs(a - b) for a in xs for b in xs)  # exact int
    ref = mad / (2.0 * n * n * (sx / n))
    assert r["n_customers"] == n
    assert abs(float(r["total_spend"]) - sx / 100.0) < 0.5
    assert abs(r["gini"] - ref) < 1e-6
    assert 0.0 <= r["gini"] < 1.0


def test_gini_known_values(spark):
    # Perfect equality -> 0; one-takes-all over n=4 -> (n-1)/n = 0.75.
    import tempfile

    d = tempfile.mkdtemp(prefix="gini_fix_")
    eq = spark.createDataFrame(
        [(i, 10.0) for i in range(4)], "o_custkey long, o_totalprice double"
    )
    eq.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    [r] = QUERIES["gini_customer_spend"](spark, d).collect()
    assert r["gini"] == 0.0
    one = spark.createDataFrame(
        [(0, 40.0), (1, 0.0), (2, 0.0), (3, 0.0)],
        "o_custkey long, o_totalprice double",
    )
    one.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    [r] = QUERIES["gini_customer_spend"](spark, d).collect()
    assert r["gini"] == 0.75


def test_funnel_hand_fixture(spark):
    # u1 completes in order; u2 clicks BEFORE viewing (strict order
    # blocks it at stage 1 even though a later purchase exists); u3
    # views only; u4 never views (not in the funnel at all).
    import tempfile

    rows = [
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        (2, "click", 100), (2, "view", 200), (2, "purchase", 300),
        (3, "view", 100),
        (4, "click", 100), (4, "purchase", 200),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, sec long"
    ).select(
        "user_id",
        "event_type",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
    )
    d = tempfile.mkdtemp(prefix="funnel_fix_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        r["user_id"]: (
            r["t_view_s"], r["t_click_s"], r["t_purchase_s"],
            r["stage_reached"],
        )
        for r in QUERIES["funnel_user_conversion"](spark, d).collect()
    }
    assert got == {
        1: (100, 200, 300, 3),
        # u2's purchase follows a click that PRECEDES its first view:
        # click-after-view never happens, so stages 2-3 stay NULL
        2: (200, None, None, 1),
        3: (100, None, None, 1),
    }
    assert 4 not in got


def test_transition_counts_hand_fixture(spark):
    import tempfile

    rows = [
        (1, "a", 1, 10), (1, "b", 2, 11), (1, "a", 3, 12),
        (2, "a", 1, 20), (2, "b", 2, 21),
        # same-timestamp tie broken by event_id: c(30) before a(31)
        (3, "c", 5, 30), (3, "a", 5, 31),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, sec long, event_id long"
    ).select(
        "user_id",
        "event_type",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        "event_id",
    )
    d = tempfile.mkdtemp(prefix="markov_fix_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in QUERIES["event_transition_counts"](spark, d).collect()
    }
    # u1: a->b, b->a; u2: a->b; u3: c->a (tie order by event_id)
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("c", "a"): 1}


def test_rrf_fusion_python_reference(spark, sf_dir):
    # Replay the fusion arithmetic from the two shortlists the query
    # itself is built on — independent join/sort/tie/round handling
    # (decimal HALF_UP like SQL round, never Python's banker round).
    from decimal import ROUND_HALF_UP, Decimal

    from module8_movies_etl_spark.operators import curation, similarity
    from module8_movies_etl_spark.sources.readers import read_table

    got = QUERIES["hybrid_search_rrf"](spark, sf_dir).collect()
    d = read_table(spark, sf_dir, "documents")
    sc = curation.bm25_scores(
        d, "doc_id", "text", terms=("spark", "join", "window")
    ).collect()
    b = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(sc, key=lambda r: (-r["score"], r["doc_id"]))[:50]
        )
    }
    emb = read_table(spark, sf_dir, "embeddings")
    cos = similarity.cosine_topk(
        emb,
        emb.filter(F.col("vec_id") == 0),
        id_col="vec_id",
        vec_col="embedding",
        k=50,
    ).collect()
    v = {r["neighbor_id"]: r["rank"] for r in cos}

    def term(rank):
        return Decimal(repr(1.0 / (60.0 + rank))).quantize(
            Decimal("1.00000000"), rounding=ROUND_HALF_UP
        )

    fused = {
        doc: (term(b[doc]) if doc in b else Decimal(0))
        + (term(v[doc]) if doc in v else Decimal(0))
        for doc in set(b) | set(v)
    }
    top = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:20]
    assert [r["doc_id"] for r in got] == [doc for doc, _s in top]
    for r, (doc, s) in zip(got, top):
        assert r["rank_lex"] == b.get(doc)
        assert r["rank_vec"] == v.get(doc)
        assert abs(r["rrf_score"] - float(s)) < 1e-9


def test_bucketed_join_has_no_join_exchange(spark, sf_dir):
    # The whole point of the bucketed layout: the sort-merge join
    # must consume both bucketed scans WITHOUT an Exchange on the
    # join key (the post-join groupBy exchange is expected and fine).
    df = QUERIES["bucketed_join_revenue"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    cut = plan.find("== Initial Plan ==")
    if cut >= 0:
        plan = plan[:cut]
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(cust_id" not in plan
    # and values must match the plain unbucketed join
    import re

    from module8_movies_etl_spark.sources.readers import read_table

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    ref = {
        r["c_mktsegment"]: r["n"]
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r["segment"]: r["n_orders"] for r in df.collect()} == ref


def test_partition_pruned_scan_has_partition_filters(spark, sf_dir):
    import re

    df = QUERIES["partition_pruned_revenue"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    cut = plan.find("== Initial Plan ==")
    if cut >= 0:
        plan = plan[:cut]
    # the month equality must be a PLANNING-time partition filter on
    # the scan, not a post-scan row filter
    assert re.search(r"PartitionFilters: \[[^\]]*order_month", plan), plan[
        :2000
    ]
    # pruning actually dropped the other months' files: the pruned
    # scan reads strictly fewer partitions than exist
    from module8_movies_etl_spark.operators import layout

    path = layout.month_partitioned_orders(spark, sf_dir)
    import os

    n_months = sum(
        1 for e in os.scandir(path) if e.name.startswith("order_month=")
    )
    assert n_months > 1


def test_global_rank_broadcast_offset_path(spark):
    # num_partitions > 256 exercises the broadcast-offsets join path
    # (a literal array of 10k+ offsets would explode codegen on a
    # real cluster); ranks must be identical to the inline path.
    rows = [(i, (i * 53) % 17) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    ranked, total = robust.global_rank(
        df, "v", "id", ascending=True, num_partitions=300
    )
    assert total == 500
    got = {r["id"]: r["rank0"] for r in ranked.collect()}
    expect = {
        rid: i
        for i, (rid, _v) in enumerate(
            sorted(rows, key=lambda t: (t[1], t[0]))
        )
    }
    assert got == expect
