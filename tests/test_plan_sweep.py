"""Catalog-WIDE structural plan sweep (round 9).

The per-query pins in ``test_plan_shapes.py`` guard 50+ named plans;
this sweep mechanically enforces two anti-pattern bans across EVERY
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
  BroadcastNestedLoopJoin and states the boundedness in the plan.

A new catalog entry that slips either in fails here by name — no
per-query pin needed. Plan compilation for all entries costs a few
minutes; nothing runs.
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


def test_no_row_udfs_or_cartesian_products_anywhere(spark, sf_dir):
    offenders: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().sparkPlan().toString()
        bad = []
        # strip the UDTF node's prints before testing for the scalar
        # node: "BatchEvalPythonUDTF" contains "BatchEvalPython"
        if "BatchEvalPython" in plan.replace("BatchEvalPythonUDTF", ""):
            if name not in UDTF_SURFACE:
                bad.append("BatchEvalPython (row-at-a-time Python UDF)")
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct (unbounded cross join)")
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "catalog queries with banned plan nodes (vectorize the UDF or "
        f"broadcast the bounded side): {offenders}"
    )
