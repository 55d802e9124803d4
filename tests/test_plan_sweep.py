"""Catalog-WIDE structural plan sweep (round 9; SinglePartition
budget round 11).

The per-query pins in ``test_plan_shapes.py`` guard 50+ named plans;
this sweep mechanically enforces three anti-pattern bans across EVERY
catalog entry by compiling (never executing) each query's physical
plan at sf0.001:

- **no row-at-a-time Python UDFs** (``BatchEvalPython`` scalar
  nodes): the Python surface must be Arrow-vectorized (mapInPandas /
  applyInPandas / grouped-agg pandas UDF) or the documented UDTF
  node (``BatchEvalPythonUDTF`` — Spark's table-function evaluator,
  a distinct surface, not the scalar slow path);
- **no Cartesian products** (``CartesianProduct`` nodes): every
  cross join must be a broadcast of a provably bounded side
  (1-row aggregates, driver-bounded grids), which plans as
  BroadcastNestedLoopJoin and states the boundedness in the plan;
- **no undocumented SinglePartition exchanges** (VERDICT r10 task
  #4): every ``Exchange SinglePartition`` — the plan node behind
  global sorts/windows/1-row reduces — must match the
  ``SINGLE_PARTITION_BUDGET`` whitelist below, which records the
  expected count AND the grain that bounds the exchanged rows. A new
  query that global-windows ROW-grain data fails here by name; the
  fix is either a distributed form (``robust.global_rank``,
  TakeOrderedAndProject) or a justified whitelist entry.

A new catalog entry that slips any of these in fails here by name —
no per-query pin needed. Plan compilation for all entries costs a few
minutes; nothing runs (``executedPlan()`` before any action is the
prepared-but-unexecuted plan — ``sparkPlan()`` is pre-EnsureRequirements
and carries NO exchanges at all, so it cannot see SinglePartition).
"""

from __future__ import annotations

from module8_movies_etl_spark.plans.benchmark_queries import QUERIES

# name -> reason; additions require the same justification discipline
# as the bench MACHINERY list
UDTF_SURFACE = {
    "udtf_chunk_profile": (
        "the §2.12 UDTF surface itself — plans as BatchEvalPythonUDTF"
    ),
}

# Grain tags for the SinglePartition budget — what bounds the rows
# crossing the single-partition exchange:
#   scalar  — 1-row global reduces: test statistics, sketch merges,
#             corpus-constant broadcasts (N, avgdl, totals)
#   group   — rollups/share-of-total windows over a BOUNDED group
#             domain (statuses, deciles, digits, languages, QI
#             classes — dozens of rows, not data rows)
#   report  — multi-section audit/capstone unions; each section is a
#             scalar or group reduce (count = section count)
# name -> (expected Exchange SinglePartition count, grain tag).
# Queries not listed must compile to ZERO SinglePartition exchanges.
SINGLE_PARTITION_BUDGET = {
    "ab_power_mde": (1, "scalar"),
    "abtest_conversion_z": (2, "scalar"),
    "align_recall_audit": (1, "scalar"),
    "annotator_agreement_alpha": (3, "scalar"),
    "average_precision_purchase": (1, "scalar"),
    "basket_pairs_lift": (1, "scalar"),
    "benford_first_digit": (1, "group"),
    "bloom_filter_vip_orders": (2, "scalar"),
    "bm25_keyword_search": (2, "scalar"),
    # final MM round's mean-1 renormalization window (item-grain —
    # suppliers/annotators, thousands of rows; replaced the two 1-row
    # broadcast cross-joins that re-executed the round subtree, r11)
    "bradley_terry_suppliers": (1, "group"),
    "calibration_bins_purchase": (1, "group"),
    "chi2_status_priority": (2, "scalar"),
    "corpus_topics_capstone": (1, "report"),
    "decontamination_recall_audit": (2, "scalar"),
    "cuped_adjusted_ab": (3, "scalar"),
    "diff_in_diff_spend": (2, "scalar"),
    "distinct_counts_orders": (1, "scalar"),
    "dq_audit_orders": (6, "report"),
    "dr_policy_value": (1, "scalar"),
    "dsir_importance_select": (2, "scalar"),
    "equidepth_hist_totalprice": (1, "group"),
    "experiment_readout_capstone": (2, "report"),
    "fk_discovery_profile": (10, "report"),
    "gains_by_score_decile": (1, "group"),
    "gini_customer_spend": (1, "scalar"),
    "hll_distinct_users": (2, "scalar"),
    "hte_did_by_segment": (1, "scalar"),
    "hybrid_search_rrf": (2, "scalar"),
    "ips_policy_value": (1, "scalar"),
    "isotonic_calibration_score": (2, "scalar"),
    "iv_wald_estimate": (1, "scalar"),
    "ivf_recall_audit": (3, "scalar"),
    "jackknife_ratio_variance": (4, "scalar"),
    "join_skew_advisor": (1, "report"),
    "json_corrupt_audit": (1, "report"),
    "k_anonymity_audit": (1, "group"),
    "km_click_to_purchase": (1, "group"),
    "kmv_setops_click_view": (1, "scalar"),
    "ks_test_click_view": (1, "scalar"),
    "l_diversity_audit": (1, "group"),
    "leakage_safe_split_audit": (2, "group"),
    "lorenz_customer_deciles": (2, "group"),
    "lsh_recall_audit": (3, "scalar"),
    "mannwhitney_click_view": (1, "scalar"),
    "mixture_rebalance_docs": (1, "group"),
    "mixture_temperature_lang": (1, "group"),
    "morton_cluster_orders": (1, "scalar"),
    "null_profile_orders": (1, "scalar"),
    "observability_snapshot": (2, "report"),
    "ols_value_by_time": (1, "scalar"),
    "poststrat_mean_value": (2, "scalar"),
    "psi_drift_totalprice": (3, "group"),
    "psm_att_strata": (2, "scalar"),
    "qini_uplift_deciles": (1, "group"),
    "qq_compare_status": (1, "group"),
    "random_sample_orders": (1, "scalar"),
    "ratio_metric_delta_ab": (1, "scalar"),
    "release_gate_capstone": (4, "report"),
    "retrieval_mrr_audit": (1, "scalar"),
    "retrieval_ndcg_audit": (1, "scalar"),
    "revenue_share_by_nation": (1, "group"),
    "roc_auc_purchase_score": (1, "scalar"),
    "rolling_distinct_kmv": (1, "scalar"),
    "selfjoin_size_estimate_cms": (2, "scalar"),
    "snapshot_diff_orders": (1, "report"),
    "srm_check_ab": (1, "scalar"),
    "summary_stats_quantity": (1, "scalar"),
    "t_closeness_audit": (2, "group"),
    "table_checksum_orders": (1, "report"),
    "tfidf_top_terms": (1, "scalar"),
    "tpch_q11_important_value": (1, "group"),
    "tpch_q14_promo_share": (1, "scalar"),
    "tpch_q15_top_supplier": (1, "group"),
    "tpch_q17_small_qty_revenue": (1, "scalar"),
    "tpch_q19_disjunctive_revenue": (1, "scalar"),
    "tpch_q22_idle_customers": (1, "scalar"),
    "tpch_q6_forecast_revenue": (1, "scalar"),
    "triangle_count_dupgraph": (4, "scalar"),
    "vocab_drift_tokens": (1, "scalar"),
    "winsorize_totalprice": (1, "scalar"),
    "woe_iv_totalprice": (3, "group"),
}


def test_no_row_udfs_or_cartesian_products_anywhere(spark, sf_dir):
    offenders: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        qe = fn(spark, sf_dir)._jdf.queryExecution()
        plan = qe.sparkPlan().toString()
        bad = []
        # strip the UDTF node's prints before testing for the scalar
        # node: "BatchEvalPythonUDTF" contains "BatchEvalPython"
        if "BatchEvalPython" in plan.replace("BatchEvalPythonUDTF", ""):
            if name not in UDTF_SURFACE:
                bad.append("BatchEvalPython (row-at-a-time Python UDF)")
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct (unbounded cross join)")
        # SinglePartition budget: exchanges only exist in the PREPARED
        # plan (EnsureRequirements has run), so read executedPlan()
        # before any action — plans, never executes
        prepared = qe.executedPlan().toString()
        cut = prepared.find("== Initial Plan ==")
        if cut >= 0:
            prepared = prepared[:cut]
        got_single = prepared.count("Exchange SinglePartition")
        allowed = SINGLE_PARTITION_BUDGET.get(name, (0, None))[0]
        if got_single != allowed:
            bad.append(
                f"Exchange SinglePartition x{got_single} (budget "
                f"{allowed}) — a global sort/window/limit entered or "
                "left the plan; verify its input is grain-bounded, "
                "then update SINGLE_PARTITION_BUDGET with a grain tag"
            )
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "catalog queries with banned plan nodes (vectorize the UDF, "
        "broadcast the bounded side, or distribute the global "
        f"sort/window): {offenders}"
    )
    stale = sorted(set(SINGLE_PARTITION_BUDGET) - set(QUERIES))
    assert not stale, f"budget names unknown queries: {stale}"
