"""Round-4 operators: deterministic sampling, CMS sketch, semi/anti,
grouping sets, window analytics — property and plan tests. (Oracle
parity for each catalog entry is covered by test_oracle_parity.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import sampling, sketches
from module8_movies_etl_spark.plans import benchmark_queries as bq


def test_hash_sample_stable_under_repartitioning(spark, sf_dir):
    """The md5 decision depends only on the key — unlike df.sample,
    whose per-partition RNG changes membership with partitioning."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = sampling.hash_sample(o, "o_orderkey", 0.2).select("o_orderkey")
    b = sampling.hash_sample(o.repartition(17), "o_orderkey", 0.2).select(
        "o_orderkey"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hash_sample_rate_and_nesting(spark, sf_dir):
    """Membership nests across rates (a 10% sample is a subset of the
    20% sample — the property that makes progressive sampling cheap),
    and the realized rate is near the nominal one."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = o.count()
    s10 = sampling.hash_sample(o, "o_orderkey", 0.1).select("o_orderkey")
    s20 = sampling.hash_sample(o, "o_orderkey", 0.2).select("o_orderkey")
    assert s10.exceptAll(s20).count() == 0  # nested
    assert 0.05 < s10.count() / n < 0.15
    assert 0.14 < s20.count() / n < 0.26


def test_stratified_sample_rates(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = sampling.stratified_hash_sample(
        e, "event_type", "event_id", rates={"error": 1.0, "click": 0.0},
        default_rate=0.5,
    )
    got = dict(
        out.groupBy("event_type").count().collect()
    )
    truth = dict(e.groupBy("event_type").count().collect())
    assert got["error"] == truth["error"]  # rate 1.0 keeps everything
    assert "click" not in got  # rate 0.0 keeps nothing
    other = sum(v for k, v in truth.items() if k not in ("error", "click"))
    kept = sum(v for k, v in got.items() if k not in ("error", "click"))
    assert 0.4 < kept / other < 0.6


def test_cms_estimate_upper_bounds_exact(spark, sf_dir):
    """CMS never underestimates; with depth 4 × width 256 over a
    31-token vocabulary the overestimate should also be modest."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(
        F.explode(F.split(F.regexp_replace("text", r"^\s+|\s+$", ""), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    grid = sketches.cms_build(toks, "w", depth=4, width=256)
    exact = toks.groupBy("w").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = sketches.cms_estimate(grid, exact, "w", depth=4, width=256)
    rows = est.collect()
    assert rows, "no tokens probed"
    assert all(r.cms_estimate >= r.exact_cnt for r in rows)
    total = toks.count()
    # CM guarantee at eps = e/width w.p. 1-e^-4 per probe; the small
    # vocabulary makes collisions rare, so assert a tight-ish bound
    assert all(r.cms_estimate - r.exact_cnt <= 0.05 * total for r in rows)


def test_semi_anti_partition_customers(spark, sf_dir):
    """Semi + anti over the same condition partition the left side."""
    out = bq.QUERIES["semi_anti_customers"](spark, sf_dir)
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert out.count() == c.count()
    assert out.select("c_custkey").distinct().count() == c.count()


def test_grouping_sets_plan_is_single_scan(spark, sf_dir):
    """GROUPING SETS expands inside one aggregate pass — the orders
    scan must appear exactly once in the physical plan."""
    df = bq.QUERIES["grouping_sets_revenue"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan


def test_running_total_single_window_exchange(spark, sf_dir):
    """row_number + running sum + lag share one window spec → one
    shuffle on o_custkey, one Window node chain, no extra Exchange."""
    df = bq.QUERIES["running_total_by_customer"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_stream_dedup_reruns_in_one_session(spark, sf_dir):
    from module8_movies_etl_spark.streaming.dedup import run_dedup_over_events

    a = run_dedup_over_events(spark, sf_dir)
    b = run_dedup_over_events(spark, sf_dir)
    truth = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert a.count() == truth
    assert b.count() == truth


def test_text_stats_frame_matches_inline(spark, sf_dir):
    """The staged quality-stats plan is a pure restructuring — values
    must be identical to the naive inline projection."""
    from module8_movies_etl_spark.operators import text as T

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.col("text")
    inline = d.select(
        "doc_id",
        T.token_count(t).cast("long").alias("n_tokens"),
        F.round(T.punct_ratio(t), 4).alias("punct_ratio"),
        F.round(T.quality_score(t), 4).alias("quality"),
        T.approx_bpe_token_count(t).cast("long").alias("n_bpe_tokens"),
        F.round(T.stopword_ratio(t, "en"), 4).alias("stopword_ratio_en"),
    )
    staged = T.text_stats_frame(d, "text", keep_cols=("doc_id",))
    assert sorted(staged.columns) == sorted(inline.columns)
    assert staged.exceptAll(inline).count() == 0
    assert inline.exceptAll(staged).count() == 0


def test_hash_sample_plan_is_narrow(spark, sf_dir):
    """Deterministic sampling is a pure scan-side filter — the plan
    must contain no Exchange (no shuffle, no repartition)."""
    df = bq.QUERIES["hash_sample_orders"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_cms_probe_broadcasts_grid(spark, sf_dir):
    """The CMS grid is ≤ depth×width rows regardless of corpus size —
    probing must broadcast it, never shuffle the probe stream."""
    df = bq.QUERIES["cms_token_counts"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_tokenize_to_ids_vocab_rank_and_oov(spark):
    """Vocab ids are frequency-ranked (ties lexicographic), OOV maps
    to 0, and token order is preserved; empty docs get empty arrays."""
    from module8_movies_etl_spark.operators.text import tokenize_to_ids

    rows = [
        (1, "b a b c b a"),
        (2, "a zz b"),
        (3, "   "),
    ]
    df = spark.createDataFrame(rows, "id long, txt string")
    # frequencies: b=4, a=3, c=1, zz=1 → ids b=1, a=2, c=3, zz=4; with
    # max_vocab=3 zz falls out → 0
    out = {
        r.id: (r.n_tokens, r.token_ids)
        for r in tokenize_to_ids(df, "id", "txt", max_vocab=3).collect()
    }
    assert out[1] == (6, [1, 2, 1, 3, 1, 2])
    assert out[2] == (3, [2, 0, 1])
    assert out[3] == (0, [])


def test_sql_api_matches_dataframe_plan(spark, sf_dir):
    """The SQL surface builds the same Catalyst plans as the DataFrame
    API: a SQL star-join aggregates to identical results, and its
    filter still reaches the scan as a pushed filter."""
    from module8_movies_etl_spark.plans.sql_api import run_sql

    sql_df = run_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS rev
        FROM orders WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderstatus
        """,
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df_df = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    assert sorted(map(tuple, sql_df.collect())) == sorted(map(tuple, df_df.collect()))
    plan = sql_df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderpriority" in plan
