"""Round-7 additions: distributed global rank, Gini, funnel, Markov
transitions, skew audit, RRF fusion — each pinned against either a
plain-Python reference or a hand-computed fixture, independent of
both the Spark code and the DuckDB oracles."""

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
    [r] = QUERIES["gini_spend_concentration"](spark, sf_dir).collect()
    xs = [
        row["x"]
        for row in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100, 0).cast("long"),
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("x")
        )
        .collect()
    ]
    n, sx = len(xs), sum(xs)
    mad = sum(abs(a - b) for a in xs for b in xs)  # exact int
    ref = mad / (2.0 * n * n * (sx / n)) if sx else 0.0
    assert r["n_users"] == n
    assert r["total_spend_cents"] == sx
    assert abs(r["gini"] - ref) < 1e-6
    assert 0.0 <= r["gini"] < 1.0


def test_gini_known_values(spark):
    # Perfect equality -> 0; one-takes-all over n=4 -> (n-1)/n = 0.75.
    eq = spark.createDataFrame(
        [(i, "purchase", 10.0, i) for i in range(4)],
        "user_id long, event_type string, value double, event_id long",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="gini_fix_")
    eq.write.mode("overwrite").parquet(f"{d}/events.parquet")
    [r] = QUERIES["gini_spend_concentration"](spark, d).collect()
    assert r["gini"] == 0.0
    one = spark.createDataFrame(
        [(0, "purchase", 40.0, 0)]
        + [(i, "view", None, i) for i in (1, 2, 3)],
        "user_id long, event_type string, value double, event_id long",
    )
    one.write.mode("overwrite").parquet(f"{d}/events.parquet")
    [r] = QUERIES["gini_spend_concentration"](spark, d).collect()
    assert r["gini"] == 0.75


def test_funnel_hand_fixture(spark):
    # u1 completes in order; u2 clicks BEFORE viewing (must not count
    # past stage 1); u3 views only; u4 has no view (never enters).
    import tempfile

    rows = [
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        (2, "click", 100), (2, "view", 200), (2, "purchase", 300),
        (3, "view", 100),
        (4, "click", 100), (4, "purchase", 200),
    ]
    df = spark.createDataFrame(
        [
            (u, t, s)
            for u, t, s in rows
        ],
        "user_id long, event_type string, sec long",
    ).select(
        "user_id",
        "event_type",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        F.monotonically_increasing_id().alias("event_id"),
    )
    d = tempfile.mkdtemp(prefix="funnel_fix_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        r["stage"]: (r["n_users"], r["pct_of_entry"])
        for r in QUERIES["funnel_conversion_stages"](spark, d).collect()
    }
    # stage1: u1,u2,u3 view; stage2: u1 (click>view); u2's purchase
    # follows a click that precedes its view -> blocked at stage 2
    assert got == {
        "1_view": (3, 1.0),
        "2_click": (1, round(1 / 3, 6)),
        "3_purchase": (1, round(1 / 3, 6)),
    }


def test_markov_hand_fixture(spark):
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
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["p"])
        for r in QUERIES["markov_event_transitions"](spark, d).collect()
    }
    # u1: a->b, b->a; u2: a->b; u3: c->a (tie order by event_id)
    assert got == {
        ("a", "b"): (2, 1.0),
        ("b", "a"): (1, 1.0),
        ("c", "a"): (1, 1.0),
    }


def test_skew_audit_totals(spark, sf_dir):
    rows = QUERIES["join_key_skew_audit"](spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_rows = li.count()
    n_keys = li.select("l_orderkey").distinct().count()
    assert sum(r["rows_per_key"] * r["n_keys"] for r in rows) == n_rows
    assert sum(r["n_keys"] for r in rows) == n_keys
    assert abs(sum(r["key_share"] for r in rows) - 1.0) < 1e-4
    mx = max(r["rows_per_key"] for r in rows)
    for r in rows:
        assert r["max_rows_per_key"] == mx
        assert r["skew_factor"] == round(mx * n_keys / n_rows, 4)


def test_rrf_fusion_python_reference(spark, sf_dir):
    # Replay the fusion arithmetic from the two shortlists the query
    # itself is built on — independent join/sort/tie handling.
    from module8_movies_etl_spark.operators import curation, similarity
    from module8_movies_etl_spark.sources.readers import read_table

    got = QUERIES["rrf_hybrid_search"](spark, sf_dir).collect()
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
    fused = {
        doc: (1.0 / (60 + b[doc]) if doc in b else 0.0)
        + (1.0 / (60 + v[doc]) if doc in v else 0.0)
        for doc in set(b) | set(v)
    }
    top = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:20]
    assert [(r["doc_id"], r["rrf_rank"]) for r in got] == [
        (doc, i + 1) for i, (doc, _s) in enumerate(top)
    ]
    for r, (doc, s) in zip(got, top):
        # the query emits round(rrf, 6); the reference is unrounded
        assert abs(r["rrf_score"] - s) < 5e-7
