#!/usr/bin/env python3
"""Three-point scaling fit for the output-volume-bound queries
(VERDICT r6 "Next round" #4): two datapoints (sf0.1, sf1.0) cannot
separate linear from n^1.3, so this runner measures the 8 queries the
round-6 analysis justified by driving-cardinality ratios at THREE
scales — sf0.1, sf0.3 (3 key-offset replicas), sf1.0 (10) — counts
each query's driving volume at each scale, and fits the
time-vs-driving-volume exponent by least squares on the log-log
points.

Reading the exponents: e <= ~1.1 in driving volume = the operator
does work proportional to what it must emit (linear modulo constant
factors); well above that = a superlinear term hiding behind the
clone structure. Fixed per-query overhead (job scheduling, snapshot
round-trips, bounded driver fetches) inflates the SMALL-scale time,
which FLATTENS the fitted slope — so the fit is reported both over
all 3 points and over the top segment (sf0.3 → sf1.0), where
overhead matters least; the top-segment number is the honest
at-scale exponent.

Driving volumes:
- pair emitters (minhash/jaccard/containment/winnowing): the query's
  own output-pair count;
- iterative graph ops (fuzzy-CC, pagerank): the edge count of the
  graph they iterate over (their outputs are node-grain);
- capstones (customer360, training pipeline): input entity rows —
  their internal pair stages are volume-bound, but entity rows are
  the contract a user scales by, and sublinear-in-rows is the
  stronger claim.

Usage: python tools/bench_scale3.py [out_json] [query ...]
       (~25 min full; name queries to run a subset — the subset's
       rows MERGE into an existing out_json instead of replacing it)
Prereq: tools/make_scaled_sf.py 3  -> .scratch/sf0.3
        tools/make_scaled_sf.py 10 -> .scratch/sf1.0
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

# query -> how to count its driving volume ("output" = count the
# query's own result; otherwise a named edge/row source, built below)
TARGETS = {
    "minhash_lsh_candidates": "output",
    "jaccard_near_dup_pairs": "output",
    "containment_dup_pairs": "output",
    "winnow_fingerprint_pairs": "output",
    "fuzzy_dedup_clusters": "jaccard_edges",
    "pagerank_dupgraph": "embedding_edges",
    "customer360_golden": "customer_rows",
    "training_data_pipeline": "document_rows",
    # round-8 additions (VERDICT r7 #4): the 5-6 s tier that only had
    # two-point evidence. Bitext align + ngram-jaccard are pair
    # emitters (own output = driving volume); AA emits a FIXED top-100
    # so its driving volume is the dup-graph edge set it wedge-joins
    # (same convention as pagerank); BPE's output is a constant
    # per-language table, so its driving volume is the corpus rows
    # the merge applier must re-tokenize.
    "adamic_adar_missing_links": "embedding_edges",
    # align emits one k-bounded row per probe, but every SCORED
    # candidate pair costs a 64-dim rescore — and on this corpus's
    # weak matches (median top-1 cos ~0.34) the recall-driven coarse
    # bands admit most of the cross product, so candidates are the
    # honest work unit (see bipartite_align_ann's sizing note).
    "align_embeddings_bipartite": "align_scored_pairs",
    "jaccard_ngram_pairs": "output",
    "bpe_compression_by_lang": "document_rows",
    # round-9 additions (VERDICT r8 task #4): the 2.5-4 s tier that
    # only had two-point (or no) scale evidence. semantic dedup
    # iterates the same embedding near-dup graph as pagerank (edges =
    # driving volume); incremental dedup's contract is |new batch| ∝
    # corpus rows; bpe-learn's per-round pair aggregate scans the
    # corpus; interpolation and bootstrap are row-bound over their
    # input tables.
    "semantic_dedup_clusters": "embedding_edges",
    # the matcher's work unit is band-bucket COLLISIONS, not corpus
    # rows: the scaled corpora carry 10-way replica cliques whose
    # members share a MinHash signature, so candidates grow with
    # clique size × batch share by design — fitting against rows
    # would misread that data property as operator superlinearity
    "incremental_dedup_newbatch": "incr_candidates",
    "bpe_learn_merges": "document_rows",
    "interpolate_gaps_linear": "events_rows",
    "bootstrap_ci_price": "orders_rows",
    # round-10 additions (VERDICT r9 task #2): the two newest
    # iterative ops, previously two-point-only. LPA iterates the same
    # embedding near-dup graph as pagerank (doubled edges = driving
    # volume — pagerank's convention); Bradley-Terry's per-round work
    # is the comparison-matrix join, so its driving volume is the
    # distinct (i, j) comparison cells (item-pair grain — the whole
    # point of the operator's scale shape is that this is decoupled
    # from fact rows).
    "lpa_communities": "embedding_edges",
    "bradley_terry_suppliers": "bt_comparison_cells",
    # round-10: the cluster-keyed split iterates the STRICTER 0.5
    # near-dup graph (many small cliques); its closure work scales
    # with those verified edges, the post-closure split/rollup with
    # cluster rows — edges are the driving volume, the CC convention
    "leakage_safe_split_audit": "embedding_edges_05",
    # round-11 additions (VERDICT r10 task #6): the CONSTANT-DEGREE
    # ring+chord fixture twins. The dup-graph fixture's edges densify
    # ~quadratically with sf, so its fitted exponents conflate fixture
    # densification with engine scaling; these run the same three ops
    # on an edges ∝ n graph (degree ≈ 6 at every scale), pinning the
    # row-grain scaling directly.
    "pagerank_ring_lattice": "edges_linear",
    "lpa_ring_lattice": "edges_linear",
    "adamic_adar_ring_lattice": "edges_linear",
    # round-11 wave 2: the remaining >5x-at-sf1.0 movers from the
    # BENCH_SF1 cohort sweep. Triangle census and k-hop BFS iterate
    # the dup graph (edges = driving volume, the graph-op
    # convention); the two pair emitters' own output is their cost.
    "triangle_count_dupgraph": "embedding_edges",
    "khop_reach_dupgraph": "embedding_edges",
    "embedding_near_dups": "output",
    "minhash_ngram_candidates": "output",
    # round-11 continuation: k-core peels the same dup graph (edges =
    # driving volume, the graph-op convention; the fixpoint
    # early-exit makes dense-regime rounds cheap, but the edge scan +
    # first-round degree aggregate still scale in edges).
    "kcore_dupgraph": "embedding_edges",
    # trustrank iterates the same dup graph as pagerank — identical
    # per-round join shape, so edges are the driving volume.
    "trustrank_quality": "embedding_edges",
}


def fit_exponent(vols: list[float], times: list[float]) -> float:
    """Least-squares slope of log(time) on log(volume)."""
    xs = [math.log(v) for v in vols]
    ys = [math.log(t) for t in times]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    return sxy / sxx if sxx else float("nan")


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    scales = {
        "sf0.1": "/root/testdata/sf0.1",
        "sf0.3": os.path.join(repo, ".scratch", "sf0.3"),
        "sf1.0": os.path.join(repo, ".scratch", "sf1.0"),
    }
    args = sys.argv[1:]
    out_path = (
        args.pop(0)
        if args and args[0].endswith(".json")
        else os.path.join(repo, "BENCH_SCALE3.json")
    )
    run_names = args or list(TARGETS)
    unknown = [n for n in run_names if n not in TARGETS]
    if unknown:
        raise SystemExit(f"no driving-volume rule for: {unknown}")

    import module8_movies_etl_spark.plans.benchmark_queries as bq
    from module8_movies_etl_spark.operators import dedup, similarity
    from module8_movies_etl_spark.session import get_spark
    from module8_movies_etl_spark.sources.readers import read_table

    spark = get_spark(
        "bench-scale3",
        extra_conf={"spark.sql.codegen.cache.maxEntries": "4096"},
    )
    # many-split scan shape, as tools/bench_scale.py (see its notes)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    spark.conf.set("spark.sql.files.openCostInBytes", "1m")
    spark.range(1000).selectExpr("sum(id)").collect()

    def driving_volume(name: str, sf_dir: str) -> int:
        kind = TARGETS[name]
        if kind == "output":
            return bq.QUERIES[name](spark, sf_dir).count()
        if kind == "jaccard_edges":
            d = read_table(spark, sf_dir, "documents")
            return dedup.jaccard_similar_pairs(
                d, "doc_id", "text", block_cols=["lang"], threshold=0.5
            ).count()
        if kind == "embedding_edges":
            emb = read_table(spark, sf_dir, "embeddings")
            return similarity.embedding_near_dups(
                emb, threshold=0.2, n_planes=12, dim=64, n_bands=3
            ).count()
        if kind == "align_scored_pairs":
            emb = read_table(spark, sf_dir, "embeddings")
            from pyspark.sql import functions as F

            return similarity.bipartite_align_scored_pairs(
                emb.filter(F.pmod(F.col("label"), F.lit(2)) == 0),
                emb.filter(F.pmod(F.col("label"), F.lit(2)) == 1),
            ).count()
        if kind == "edges_linear":
            return bq._ring_pairs(spark, sf_dir).count()
        if kind == "customer_rows":
            return read_table(spark, sf_dir, "customer").count()
        if kind == "document_rows":
            return read_table(spark, sf_dir, "documents").count()
        if kind == "events_rows":
            return read_table(spark, sf_dir, "events").count()
        if kind == "incr_candidates":
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            d = read_table(spark, sf_dir, "documents")
            new = dedup.minhash_band_table(
                d.filter(F.pmod(F.col("doc_id"), F.lit(7)) == 0),
                "doc_id", "text",
            ).select(F.col("doc_id").alias("_n"), "_bi", "_bv")
            idx = dedup.minhash_band_table(
                d.filter(F.pmod(F.col("doc_id"), F.lit(7)) != 0),
                "doc_id", "text",
            ).select(F.col("doc_id").alias("_i"), "_bi", "_bv")
            # replay the operator's hot-bucket cap: its work unit is
            # the candidates the CAPPED join emits
            idx = (
                idx.withColumn(
                    "_bc",
                    F.count(F.lit(1)).over(Window.partitionBy("_bi", "_bv")),
                )
                .filter(F.col("_bc") <= 64)
                .drop("_bc")
            )
            return new.join(idx, ["_bi", "_bv"]).count()
        if kind == "orders_rows":
            return read_table(spark, sf_dir, "orders").count()
        if kind == "embedding_edges_05":
            emb = read_table(spark, sf_dir, "embeddings")
            return similarity.embedding_near_dups(
                emb, threshold=0.5, n_planes=12, dim=64, n_bands=3
            ).count()
        if kind == "bt_comparison_cells":
            from pyspark.sql import functions as F

            # replay the catalog entry's preference derivation and
            # count the distinct comparison-matrix cells its MM
            # rounds join over (see bradley_terry_suppliers)
            li = read_table(spark, sf_dir, "lineitem")
            key = (
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                * F.lit(1073741824).cast("long")
                + F.col("l_linenumber").cast("long") * 134217728
                + F.col("l_suppkey").cast("long")
            )
            prefs = (
                li.select("l_orderkey", "l_suppkey", key.alias("_k"))
                .groupBy("l_orderkey")
                .agg(
                    F.max_by("l_suppkey", F.col("_k")).alias("_w"),
                    F.min_by("l_suppkey", F.col("_k")).alias("_l"),
                )
                .filter(F.col("_w") != F.col("_l"))
            )
            return (
                prefs.select(F.col("_w").alias("i"), F.col("_l").alias("j"))
                .unionAll(
                    prefs.select(
                        F.col("_l").alias("i"), F.col("_w").alias("j")
                    )
                )
                .distinct()
                .count()
            )
        raise ValueError(kind)

    results: dict[str, dict] = {}
    if run_names != list(TARGETS) and os.path.exists(out_path):
        # subset run: keep the other CURRENT targets' existing rows.
        # The read happens BEFORE the ~25-min measurement loop so a
        # torn prior file fails fast, and rows for queries no longer
        # in TARGETS (renames/removals) are dropped rather than
        # carried forward as stale "current" measurements.
        with open(out_path) as f:
            prior_rows = json.load(f).get("queries", {})
        results.update(
            {k: v for k, v in prior_rows.items() if k in TARGETS}
        )
    for name in run_names:
        fn = bq.QUERIES[name]
        times, vols = {}, {}
        for label, sf_dir in scales.items():
            run = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                run.append(round(time.time() - t0, 2))
            times[label] = min(run)
            vols[label] = driving_volume(name, sf_dir)
            print(
                f"{name} @ {label}: {run} vol={vols[label]}",
                file=sys.stderr,
                flush=True,
            )
        order = ["sf0.1", "sf0.3", "sf1.0"]
        tv = [times[k] for k in order]
        vv = [float(vols[k]) for k in order]
        results[name] = {
            "times_s": times,
            "driving_volume": vols,
            "volume_kind": TARGETS[name],
            "exponent_all3": round(fit_exponent(vv, tv), 3),
            "exponent_top_segment": round(
                fit_exponent(vv[1:], tv[1:]), 3
            ),
        }

    doc = {
        "metric": "time_vs_driving_volume_exponent",
        "scales": {k: os.path.basename(v) for k, v in scales.items()},
        "note": (
            "min of 2 runs per scale, shared session, 8MB split size; "
            "exponent_all3 fits all three log-log points (flattened by "
            "fixed overhead at sf0.1), exponent_top_segment fits "
            "sf0.3->sf1.0 where overhead matters least. <=~1.1 in "
            "driving volume = linear-or-better in what the operator "
            "must emit/iterate."
        ),
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(
        json.dumps(
            {
                k: (v["exponent_all3"], v["exponent_top_segment"])
                for k, v in results.items()
            }
        )
    )


if __name__ == "__main__":
    main()
