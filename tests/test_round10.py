"""Round-10 additions: the GROUPED-AGG pandas UDAF extension point
(weighted median, pinned against its native two-window twin) and
bounded multi-source BFS (khop_distances)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- weighted median UDAF vs native twin ----------------------------------


def test_weighted_median_udaf_matches_native_on_lineitem(spark, sf_dir):
    """The extension point is validated against the native plan: both
    formulations must agree on every supplier at sf0.001."""
    from module8_movies_etl_spark.operators.udaf_ext import (
        weighted_median_native,
        weighted_median_udaf,
    )
    from module8_movies_etl_spark.sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem")
    udaf = {
        r["l_suppkey"]: r["wmedian"]
        for r in weighted_median_udaf(
            li, "l_suppkey", F.col("l_extendedprice"), F.col("l_quantity")
        ).collect()
    }
    native = {
        r["l_suppkey"]: r["wmedian"]
        for r in weighted_median_native(
            li, "l_suppkey", F.col("l_extendedprice"), F.col("l_quantity")
        ).collect()
    }
    assert udaf == native
    assert len(udaf) > 0


def test_weighted_median_udaf_golden(spark):
    """Hand-computed lower weighted median, including a tie run that
    straddles the half-weight threshold and a skipped NULL."""
    rows = [
        # group a: values 1(w3), 2(w1), 5(w2); total 6, half 3 ->
        # cum(1)=3, 2*3 >= 6 -> wmedian 1.0
        ("a", 1.0, 3), ("a", 2.0, 1), ("a", 5.0, 2),
        # group b: 10(w1), 20(w1); total 2 -> cum(10)=1, 2*1 >= 2 ->
        # lower median 10.0
        ("b", 10.0, 1), ("b", 20.0, 1),
        # group c: tie run 7,7 (w1 each) after 3(w1); total 3 ->
        # cum(3)=1 (2 < 3), cum(first 7)=2 (4 >= 3) -> 7.0
        ("c", 3.0, 1), ("c", 7.0, 1), ("c", 7.0, 1),
        # NULL value is dropped, not sorted last
        ("b", None, 9),
    ]
    from module8_movies_etl_spark.operators.udaf_ext import (
        weighted_median_native,
        weighted_median_udaf,
    )

    df = spark.createDataFrame(rows, ["k", "v", "w"])
    expected = {"a": 1.0, "b": 10.0, "c": 7.0}
    for fn in (weighted_median_udaf, weighted_median_native):
        got = {
            r["k"]: r["wmedian"]
            for r in fn(df, "k", F.col("v"), F.col("w")).collect()
        }
        assert got == expected, fn.__name__


# --- khop BFS --------------------------------------------------------------


def test_khop_distances_golden(spark):
    """Path graph 1-2-3-4-5 plus isolated seed 9: distances from
    seeds {1, 9} bounded at k=2; node 4 is 3 hops away -> absent;
    node 5 likewise."""
    from module8_movies_etl_spark.operators.graphs import khop_distances

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["id_a", "id_b"]
    )
    seeds = spark.createDataFrame([(1,), (9,)], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in khop_distances(pairs, seeds, id_col="node", k=2).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 9: 0}


def test_khop_distances_nearest_seed_wins(spark):
    """Two seeds on one path: every node takes the minimum distance,
    and a node that IS a seed reports 0 even with incident edges."""
    from module8_movies_etl_spark.operators.graphs import khop_distances

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], ["id_a", "id_b"]
    )
    seeds = spark.createDataFrame([(1,), (4,)], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in khop_distances(pairs, seeds, id_col="node", k=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 0}


def test_khop_empty_graph_seeds_survive(spark):
    from module8_movies_etl_spark.operators.graphs import khop_distances

    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    seeds = spark.createDataFrame([(7,)], ["node"])
    got = khop_distances(pairs, seeds, id_col="node", k=3).collect()
    assert [(r["node"], r["dist"]) for r in got] == [(7, 0)]


# --- oracle parity for the new catalog queries ------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "weighted_median_udaf",
        "khop_reach_dupgraph",
        "phrase_search_docs",
        "similar_user_paths",
        "lsh_recall_audit",
        "stream_interval_join_left",
    ],
)
def test_new_queries_oracle_parity(spark, sf_dir, name):
    from module8_movies_etl_spark.plans import benchmark_queries as bq

    from .oracle_check import compare, duckdb_con

    con = duckdb_con(sf_dir)
    errs = compare(
        bq.QUERIES[name](spark, sf_dir), con, bq.ORACLE[name], name
    )
    assert not errs, errs


# --- phrase search / path similarity ---------------------------------------


def test_phrase_search_counts_adjacent_occurrences(spark):
    """Window-over-filtered-stream matches exact adjacency: repeated
    first terms, doubled second terms, and separated terms behave."""
    from module8_movies_etl_spark.plans.benchmark_queries import (
        phrase_search_docs,
    )
    import os
    import tempfile

    rows = [
        (1, "a table hash b table hash"),   # 2 hits
        (2, "table table hash"),            # 1 hit (second 'table')
        (3, "table x hash"),                # 0 - separated
        (4, "hash table"),                  # 0 - wrong order
        (5, "table hash hash"),             # 1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["doc_id"]: r["n_hits"]
            for r in phrase_search_docs(spark, d).collect()
        }
    assert got == {1: 2, 2: 1, 5: 1}
