"""Batch-2 operators: rolling windows, OHLC resample, fuzzy name
reconciliation, sequence packing. Oracle parity is covered by
test_oracle_parity; these pin semantics and plan shapes."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import curation, timeseries

SF = "/root/testdata/sf0.001"


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


# --- rolling window -------------------------------------------------------


def test_rolling_stats_hand_check(spark):
    rows = [
        (1, 1, "2024-01-01 00:00:0%d" % i, float(v))
        for i, v in enumerate([10, 20, 30])
    ]
    df = spark.createDataFrame(
        [(i, u, ts, v) for i, (_, u, ts, v) in enumerate(rows)],
        ["event_id", "user_id", "ts_s", "value"],
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = {
        r["event_id"]: r
        for r in timeseries.rolling_window_stats(
            df, "user_id", "ts", "event_id", "value", frame=2
        ).collect()
    }
    assert out[0]["roll_sum"] == 10.0 and out[0]["roll_n"] == 1
    assert out[1]["roll_sum"] == 30.0 and out[1]["roll_avg"] == 15.0
    assert out[2]["roll_sum"] == 50.0 and out[2]["roll_n"] == 2


def test_rolling_window_single_shuffle(spark):
    """One hash exchange on the key — sum/count/avg share the frame."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(
        spark,
        timeseries.rolling_window_stats(e, "user_id", "ts", "event_id", "value"),
    )
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


# --- OHLC -----------------------------------------------------------------


def test_ohlc_hand_check(spark):
    df = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 10:05:00", 5.0),
            (2, "a", "2024-01-01 10:10:00", 9.0),
            (3, "a", "2024-01-01 10:20:00", 1.0),
            (4, "a", "2024-01-01 11:01:00", 7.0),
        ],
        ["event_id", "k", "ts_s", "value"],
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = {
        r["bucket_s"]: r
        for r in timeseries.ohlc_resample(
            df, "ts", "k", "event_id", "value", 3600
        ).collect()
    }
    h10 = out[min(out)]
    assert (h10["open"], h10["high"], h10["low"], h10["close"], h10["volume"]) == (
        5.0,
        9.0,
        1.0,
        1.0,
        3,
    )
    h11 = out[max(out)]
    assert h11["open"] == h11["close"] == 7.0 and h11["volume"] == 1


def test_ohlc_single_exchange(spark):
    """Both row-number windows and the final agg share the
    (bucket, key) hash partitioning — one shuffle total."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(
        spark,
        timeseries.ohlc_resample(e, "ts", "event_type", "event_id", "value"),
    )
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


# --- fuzzy name matches ---------------------------------------------------


def test_fuzzy_name_matches_basics(spark):
    df = spark.createDataFrame(
        [
            (1, "cold widget"),
            (2, "bold widget"),     # distance 1 from cold widget
            (3, "large widget"),    # distance >2 from both, len diff 1-2
            (4, "cold bolt"),       # different block (bolt)
            (5, "gold bolt"),       # distance 1 from cold bolt
        ],
        ["pid", "name"],
    )
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in curation.fuzzy_name_matches(
            df,
            "pid",
            "name",
            block_col=F.regexp_extract("name", r"(\S+)$", 1),
            max_distance=2,
        ).collect()
    }
    assert got == {(1, 2): 1, (4, 5): 1}


def test_fuzzy_name_length_filter_precedes_levenshtein(spark):
    """The length pre-filter must appear in the join condition/filter
    so most pairs die before the DP. (Plan contains the abs(length)
    predicate alongside levenshtein.)"""
    p = spark.read.parquet(f"{SF}/part.parquet")
    plan = _plan(
        spark,
        curation.fuzzy_name_matches(
            p, "p_partkey", "p_name",
            block_col=F.regexp_extract("p_name", r"(\S+)$", 1), max_distance=2,
        ),
    )
    assert "levenshtein" in plan and "abs" in plan


# --- sequence packing -----------------------------------------------------


def test_pack_sequences_hand_check(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "w " * 600),   # 600 tokens -> pack 0 (cum before: 0)
            (2, "en", "w " * 600),   # cum before 600 -> pack 0
            (3, "en", "w " * 600),   # cum before 1200 -> pack 1
            (4, "fr", "w " * 100),   # other stream restarts at pack 0
        ],
        ["doc_id", "lang", "text"],
    )
    out = {
        r["doc_id"]: r["pack_id"]
        for r in curation.pack_sequences(
            docs, "doc_id", "text", "lang", budget_tokens=1024
        ).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 0}


def test_pack_sequences_budget_roughly_respected(spark):
    """Real corpus: every pack's token total is below budget + one
    max-doc overshoot (greedy packing's invariant)."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = curation.pack_sequences(d, "doc_id", "text", "lang", budget_tokens=1024)
    per = (
        out.groupBy("lang", "pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    assert per and all(r["tot"] <= 1024 + r["mx"] for r in per)


# --- funnel ---------------------------------------------------------------


def test_funnel_strict_order(spark):
    """click BEFORE the first view must not count; the funnel requires
    strictly increasing stage times."""
    rows = [
        # user 1: full ordered funnel
        (1, 1, "2024-01-01 10:00:00", "view"),
        (2, 1, "2024-01-01 10:01:00", "click"),
        (3, 1, "2024-01-01 10:02:00", "purchase"),
        # user 2: click precedes the only view -> funnel stops at view
        (4, 2, "2024-01-01 09:00:00", "click"),
        (5, 2, "2024-01-01 09:30:00", "view"),
        (6, 2, "2024-01-01 09:10:00", "purchase"),
        # user 3: no view at all -> absent from output
        (7, 3, "2024-01-01 08:00:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts_s", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts_s"))
    from module8_movies_etl_spark.operators.timeseries import funnel_stages

    out = {r["user_id"]: r for r in funnel_stages(df, "user_id", "ts", "event_type").collect()}
    assert out[1]["stage_reached"] == 3
    assert out[2]["stage_reached"] == 1 and out[2]["t_click_s"] is None
    assert 3 not in out


# --- CDC merge ------------------------------------------------------------


def test_apply_cdc_semantics(spark):
    from module8_movies_etl_spark.operators.cdc import apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    delta = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (9, "new", "U")], ["k", "v", "op"]
    )
    got = {r["k"]: r["v"] for r in apply_cdc(base, delta, "k").collect()}
    assert got == {1: "a", 2: "B", 9: "new"}  # update, delete, insert


def test_apply_cdc_single_exchange(spark):
    """The MERGE lowering is one hash shuffle (union + window)."""
    from module8_movies_etl_spark.operators.cdc import apply_cdc

    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    d = o.filter(F.col("o_orderkey") % 100 == 0).withColumn("op", F.lit("U"))
    plan = _plan(spark, apply_cdc(o, d, "o_orderkey"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


# --- transitions & cohorts ------------------------------------------------


def test_transition_counts_hand_check(spark):
    rows = [
        (1, 1, "2024-01-01 10:00:00", "view"),
        (2, 1, "2024-01-01 10:01:00", "click"),
        (3, 1, "2024-01-01 10:02:00", "view"),
        (4, 2, "2024-01-01 10:00:00", "view"),
        (5, 2, "2024-01-01 10:05:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts_s", "event_type"]
    ).withColumn("ts", F.to_timestamp("ts_s"))
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in timeseries.transition_counts(
            df, "user_id", "ts", "event_id", "event_type"
        ).collect()
    }
    assert got == {("view", "click"): 2, ("click", "view"): 1}


def test_cohort_retention_hand_check(spark):
    week = 604800
    rows = [
        # user 1 signs up week 0, active weeks 0 and 2
        (1, 1, 0, "signup"),
        (2, 1, 10, "view"),
        (3, 1, 2 * week + 5, "click"),
        # user 2 signs up week 1, active week 1 only
        (4, 2, week + 3, "signup"),
        # user 3 never signs up -> excluded
        (5, 3, 10, "view"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "epoch", "event_type"]
    ).withColumn("ts", F.timestamp_seconds("epoch"))
    got = {
        (r["cohort_w"], r["offset_w"]): r["n_users"]
        for r in timeseries.cohort_retention(
            df, "user_id", "ts", "signup", "event_type"
        ).collect()
    }
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}
