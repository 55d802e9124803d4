"""Executed-plan shape pins for the heavy / multi-consumer queries.

Two manual review passes in round 6 kept finding the same defect
class by hand: diamond-reuse scan-count violations (a DataFrame
consumed by N branches re-executes its lineage N times — Spark has no
common-subplan reuse below the exchange, so docstring claims of "one
fact scan" silently become four when a snapshot is dropped) and
single-partition stages sneaking into fact-grain paths. These tests
make that audit CI instead of judgement: each pinned query runs at
sf0.001, the AQE FINAL plan is captured after the action, and the
per-table parquet-scan counts plus the number of
``Exchange SinglePartition`` nodes must equal the documented budget.

A failure here means the plan SHAPE changed — more scans (a lost
snapshot / new diamond), fewer (a new reuse), or a new global
exchange. If the change is intentional, re-derive the budget, check
it against the query's docstring scan claims, and update the table —
never loosen a pin to "anything passes".

The counts are plan-shape, not data-shape: at sf0.001 every pinned
query's final plan is identical in structure to the sf0.1 one (AQE
may pick different join strategies at larger SF, which changes
Exchange kinds but not scan counts; SinglePartition pins hold because
every pinned single-partition input is grain-bounded by construction,
not by data size).
"""

from __future__ import annotations

import collections
import re

import pytest

from module8_movies_etl_spark.plans.benchmark_queries import QUERIES

# (table-scan counts, single-partition-exchange count) per query.
# "scratch" = any snapshot read (scratch dir), named tables = the
# source parquet under the sf dir. Budgets cross-checked against each
# query's docstring scan claims when pinned (round 7).
EXPECTED_SHAPES: dict[str, tuple[dict[str, int], int]] = {
    # core
    "flagship_order_histogram": ({"orders": 1, "lineitem": 1}, 0),
    "pricing_summary": ({"lineitem": 1}, 0),
    # capstones: lazy one-DAG compositions (documented multi-scan) or
    # snapshot-rooted (scratch only)
    "training_data_pipeline": ({"scratch": 3}, 0),
    "curation_pipeline_v2": ({"documents": 9}, 0),
    "experiment_readout_capstone": ({"scratch": 2}, 2),
    "customer360_golden": ({"scratch": 2}, 0),
    # experimentation / causal: all snapshot-rooted via
    # _user_prepost_spend (one fact scan happens at snapshot build,
    # OUTSIDE this final plan); singles are bounded moment/decile
    # grains
    "jackknife_ratio_variance": ({"scratch": 3}, 4),
    "poststrat_mean_value": ({"scratch": 4}, 2),
    "dr_policy_value": ({"events": 1, "scratch": 1}, 1),
    "qte_deciles": ({"scratch": 2}, 0),
    "qini_uplift_deciles": ({"scratch": 1}, 1),
    "hte_did_by_segment": ({"scratch": 2, "customer": 1}, 1),
    # ML eval / time series
    "theil_sen_daily_slope": ({"scratch": 3}, 0),
    "conformal_interval_events": ({"events": 2, "scratch": 1}, 0),
    # dedup / similarity / text
    "minhash_lsh_candidates": ({"documents": 2}, 0),
    "jaccard_near_dup_pairs": ({"documents": 2}, 0),
    "bm25_keyword_search": ({"scratch": 4, "documents": 1}, 2),
    "cosine_topk_lsh": ({"embeddings": 4}, 0),
    "text_stats": ({"documents": 1}, 0),
    "kmeans_diversity_sample": ({"embeddings": 1}, 0),
    # round-7 additions. TPC-H shapes: every table scanned exactly
    # once, no global exchange (top-N is TakeOrderedAndProject).
    "tpch_q3_unshipped_topn": (
        {"lineitem": 1, "orders": 1, "customer": 1},
        0,
    ),
    "tpch_q5_local_supplier": (
        {
            "lineitem": 1,
            "orders": 1,
            "customer": 1,
            "supplier": 1,
            "nation": 1,
            "region": 1,
        },
        0,
    ),
    "tpch_q18_large_orders": (
        {"lineitem": 1, "orders": 1, "customer": 1},
        0,
    ),
    # Q21 (round 8): dual correlated EXISTS lowered to existence
    # aggregation — the textbook three lineitem scans are ONE.
    "tpch_q21_waiting_supplier": (
        {"lineitem": 1, "orders": 1, "supplier": 1},
        0,
    ),
    # Q17 (round 8): correlated scalar avg lowered to a window on the
    # broadcast-filtered stream — the textbook two lineitem scans are
    # ONE; the single exchange is the 1-row final aggregate reduce.
    "tpch_q17_small_qty_revenue": ({"lineitem": 1, "part": 1}, 1),
    # Q19 (round 8): equi-key hoisted out of the OR-of-ANDs → one
    # broadcast hash join + residual filter; quantity hull pushed to
    # the fact scan. Single exchange = 1-row aggregate reduce.
    "tpch_q19_disjunctive_revenue": ({"lineitem": 1, "part": 1}, 1),
    # real-codec resize/resample: decode → box downsample → features
    # in the same two narrow Arrow stages as the decode queries.
    "bmp_resize_features": ({"documents": 1}, 0),
    "wav_resample_features": ({"documents": 1}, 0),
    # gini: the fact pass happens at global_rank's snapshot build; the
    # final plan reads the rank snapshot once; the one SinglePartition
    # exchange is the 1-row global moment aggregate's final reduce.
    "gini_customer_spend": ({"scratch": 1}, 1),
    # RRF: two shortlist windows are WindowGroupLimit-prefiltered
    # (each partition contributes <=50 rows) before their bounded
    # single-partition rank merge.
    "hybrid_search_rrf": ({"scratch": 4, "documents": 1, "embeddings": 2}, 2),
    # real-codec decode: one scan, payloads born spread, no shuffle
    # after the id repartition.
    "bmp_decode_features": ({"documents": 1}, 0),
    "wav_decode_features": ({"documents": 1}, 0),
    # compressed-codec decode (round 8): same two narrow Arrow map
    # stages as the header-parsed decodes — inflate adds CPU, never
    # a scan or shuffle.
    "png_decode_features": ({"documents": 1}, 0),
    "jpeg_decode_features": ({"documents": 1}, 0),
    "gif_decode_features": ({"documents": 1}, 0),
    # the month filter prunes at planning time; one partitioned scan.
    "partition_pruned_revenue": ({"scratch": 1}, 0),
    # round-8 TPC-H completion (Q2/4/6/7/8/9/10/11/12/13/14/15/16/
    # 20/22 — with the existing Q1/3/5/17/18/19/21 the full 22-shape
    # family). Invariant: every FACT table scans exactly once; the
    # single-partition exchanges are 1-row/grain-bounded aggregate
    # reduces or empty-frame windows ON AGGREGATES (share-of-total
    # idiom), never fact-grain. Q2's dim diamonds (part/supplier/
    # nation twice — the supply-catalog filter and the final
    # attribute join; one region broadcast is AQE-reused) and Q22's
    # customer double-scan (pool + stats, the diamond the textbook
    # SQL has too) are documented in their docstrings.
    "tpch_q2_min_cost_supplier": (
        {"lineitem": 1, "part": 2, "supplier": 2, "nation": 2, "region": 1},
        0,
    ),
    "tpch_q4_priority_check": ({"orders": 1, "lineitem": 1}, 0),
    "tpch_q6_forecast_revenue": ({"lineitem": 1}, 1),
    "tpch_q7_nation_volume": (
        {"lineitem": 1, "supplier": 1, "orders": 1, "customer": 1,
         "nation": 1},
        0,
    ),
    "tpch_q8_market_share": (
        {"lineitem": 1, "part": 1, "orders": 1, "customer": 1, "nation": 1,
         "region": 1, "supplier": 1},
        0,
    ),
    "tpch_q9_product_profit": (
        {"lineitem": 1, "part": 1, "orders": 1, "supplier": 1, "nation": 1},
        0,
    ),
    "tpch_q10_returned_topn": (
        {"lineitem": 1, "orders": 1, "customer": 1, "nation": 1},
        0,
    ),
    "tpch_q11_important_value": ({"lineitem": 1, "supplier": 1}, 1),
    "tpch_q12_ship_bands": ({"lineitem": 1, "orders": 1}, 0),
    "tpch_q13_order_distribution": ({"customer": 1, "orders": 1}, 0),
    "tpch_q14_promo_share": ({"lineitem": 1, "part": 1}, 1),
    "tpch_q15_top_supplier": ({"lineitem": 1, "supplier": 1}, 1),
    # Q16: at the sf0.001 fixture NO supplier has a negative balance,
    # so AQE's empty-relation propagation ELIMINATES the anti-join's
    # supplier scan from the final plan (at bigger SFs it appears).
    # The pin records the sf0.001 plan; if the fixture regenerates
    # with negative balances this becomes {.., supplier: 1}.
    "tpch_q16_supplier_counts": ({"lineitem": 1, "part": 1}, 0),
    "tpch_q20_half_stock_suppliers": (
        {"lineitem": 1, "part": 1, "supplier": 1},
        0,
    ),
    "tpch_q22_idle_customers": ({"customer": 2, "orders": 1}, 1),
    # retrieval MRR: one FULL-WIDTH corpus scan (vectors) + the query
    # panel + two column-pruned (vec_id,label) lookups; the single
    # exchange is the 1-row metrics reduce.
    "retrieval_mrr_audit": ({"embeddings": 4}, 1),
    # model inference is one codegen'd pass — applying the classifier
    # can never cost more than reading the corpus.
    "quality_model_score": ({"documents": 1}, 0),
    # round-10 additions. The video rung: same two narrow Arrow map
    # stages as every codec decode — demux + per-frame JPEG add CPU,
    # never a scan or shuffle.
    "video_frames_features": ({"documents": 1}, 0),
    # token-window chunking: pure codegen transform+slice, ZERO
    # exchanges of any kind (also asserted below).
    "chunk_documents_token_windows": ({"documents": 1}, 0),
    # CCNet paragraph audit: the min!=max cross-doc test rides a
    # WINDOW on the paragraph hash (a groupBy+join-back form scanned
    # documents twice — caught by this harness, rewritten round 10).
    "ccnet_paragraph_dedup": ({"documents": 1}, 0),
    # t-closeness: the fact pair scans once at the class-status
    # snapshot build (outside this plan, the gini precedent); the
    # final plan reads the tiny snapshot for its three branches.
    # Singles: the 1-row global-total broadcast + the share-of-total
    # window over the <=4-row bucket rollup.
    "t_closeness_audit": ({"scratch": 3}, 2),
    # KNN-Shapley: the quantized projection scans once per consumer
    # (panel top-k, anti-join, scored pairs) — all three column-
    # pruned; ranking partitions by panel id, no global exchange.
    "knn_shapley_values": ({"embeddings": 3}, 0),
    # nDCG: the MRR audit's 4 scans + one more (vec_id,label) pruned
    # pass for the corpus label counts; the single is the 1-row
    # metrics reduce.
    "retrieval_ndcg_audit": ({"embeddings": 5}, 1),
}

_SCAN_RE = re.compile(
    r"Scan parquet[^\n]*?InMemoryFileIndex\(\d+ paths?\)\[file:([^\],\n]*)"
)
_TABLE_RE = re.compile(r"/([a-z_0-9]+)\.parquet")


def executed_plan_shape(df) -> tuple[dict[str, int], int]:
    """Run ``df`` and return (per-table scan counts, # of
    SinglePartition exchanges) from the AQE FINAL executed plan.
    ``collect()`` (never ``count()``) forces execution without
    column-pruning the aggregates out of the plan; the plan string's
    trailing ``== Initial Plan ==`` section is cut so pre-AQE nodes
    are not double-counted."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    cut = plan.find("== Initial Plan ==")
    if cut >= 0:
        plan = plan[:cut]
    tables: collections.Counter = collections.Counter()
    for m in _SCAN_RE.finditer(plan):
        path = m.group(1)
        if "/testdata/" in path or "/.scratch/" in path:
            name = _TABLE_RE.search(path)
            tables[name.group(1) if name else "unknown"] += 1
        else:
            tables["scratch"] += 1
    single = len(re.findall(r"Exchange SinglePartition", plan))
    return dict(tables), single


@pytest.mark.parametrize("name", sorted(EXPECTED_SHAPES))
def test_plan_shape_budget(spark, sf_dir, name):
    exp_tables, exp_single = EXPECTED_SHAPES[name]
    if name == "tpch_q16_supplier_counts":
        # the pinned shape (no supplier scan) encodes AQE's
        # empty-relation elimination, which holds only while the
        # fixture has zero negative-balance suppliers — fail loudly
        # on the precondition instead of opaquely on the shape if
        # the fixture is ever regenerated with arrears suppliers
        from module8_movies_etl_spark.sources.readers import read_table

        n_bad = (
            read_table(spark, sf_dir, "supplier")
            .filter("s_acctbal < 0")
            .count()
        )
        assert n_bad == 0, (
            "sf0.001 fixture now has suppliers with s_acctbal < 0; "
            "AQE will keep the anti-join's supplier scan — repin "
            "tpch_q16_supplier_counts to {'lineitem': 1, 'part': 1, "
            "'supplier': 1}"
        )
    got_tables, got_single = executed_plan_shape(QUERIES[name](spark, sf_dir))
    assert got_tables == exp_tables, (
        f"{name}: parquet-scan budget changed "
        f"(expected {exp_tables}, executed plan has {got_tables}) — "
        "a multi-consumer DataFrame likely lost its snapshot (or "
        "gained an undocumented scan); fix the plan or re-document "
        "the budget"
    )
    assert got_single == exp_single, (
        f"{name}: SinglePartition-exchange count changed "
        f"(expected {exp_single}, got {got_single}) — a global "
        "sort/window/limit entered (or left) the plan; verify its "
        "input is grain-bounded before repinning"
    )


def test_token_chunking_has_zero_exchanges(spark, sf_dir):
    # the docstring claims ZERO shuffles of any kind — stronger than
    # the SinglePartition budget above, so pin it explicitly
    from module8_movies_etl_spark.plans.benchmark_queries import (
        chunk_documents_token_windows,
    )

    df = chunk_documents_token_windows(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    cut = plan.find("== Initial Plan ==")
    if cut >= 0:
        plan = plan[:cut]
    assert "Exchange" not in plan, plan
