#!/usr/bin/env python3
"""Adamic-Adar hub-cap trade sweep (VERDICT r10 task #7).

``graphs.adamic_adar_links``'s ``max_hub_degree`` (default 10^4)
never fires at bench scale, and the dup-graph AA run is the
catalog's largest single number (295.7 s at sf1.0 in round 10's
BENCH_SF1). This runner measures, at sf1.0 on the embedding dup
graph, time + top-k agreement for cap ∈ {100, 1000, 10000} against
the uncapped reference (the graph's max degree is printed; 10^4 is
uncapped whenever it exceeds the max) — the minhash bucket-cap
playbook applied to wedge centers.

Usage: python tools/bench_aa_cap.py [out_json]
Writes BENCH_AA_CAP.json at the repo root by default.
"""

from __future__ import annotations

import json
import os
import sys
import time

CAPS = [100, 1_000, 10_000]


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "BENCH_AA_CAP.json"
    )
    sf_dir = os.environ.get(
        "AA_CAP_SF_DIR", os.path.join(repo, ".scratch", "sf1.0")
    )

    from pyspark.sql import functions as F

    from module8_movies_etl_spark.operators import graphs, similarity
    from module8_movies_etl_spark.session import get_spark
    from module8_movies_etl_spark.sources.readers import read_table
    from module8_movies_etl_spark.sources.scratch import snapshot

    spark = get_spark("bench-aa-cap")
    emb = read_table(spark, sf_dir, "embeddings")
    pairs = snapshot(
        similarity.embedding_near_dups(
            emb, threshold=0.2, n_planes=12, dim=64, n_bands=3
        ).select("id_a", "id_b"),
        prefix="aacap_pairs_",
    )
    n_edges = pairs.count()
    dbl = graphs._doubled_edges(pairs)
    deg = dbl.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    stats = deg.agg(
        F.max("d").alias("max_d"),
        F.expr("percentile(d, 0.99D)").alias("p99_d"),
        F.count(F.lit(1)).alias("n_nodes"),
    ).collect()[0]
    print(
        f"edges={n_edges} nodes={stats['n_nodes']} "
        f"max_deg={stats['max_d']} p99_deg={stats['p99_d']}",
        file=sys.stderr,
    )

    results = {}
    ref_set: set | None = None
    for cap in sorted(CAPS, reverse=True):  # reference (largest) first
        t0 = time.time()
        rows = graphs.adamic_adar_links(
            pairs, top_k=100, max_hub_degree=cap
        ).collect()
        dt = round(time.time() - t0, 2)
        top = [(r["id_a"], r["id_b"]) for r in rows]
        if ref_set is None:
            ref_set = set(top)
        overlap = len(set(top) & ref_set) / max(len(ref_set), 1)
        results[str(cap)] = {
            "time_s": dt,
            "n_rows": len(rows),
            "top100_overlap_vs_uncapped": round(overlap, 3),
            "cap_fires": bool(cap < (stats["max_d"] or 0)),
        }
        print(f"cap={cap}: {dt}s overlap={overlap:.3f}", file=sys.stderr)

    doc = {
        "metric": "adamic_adar_hub_cap_trade",
        "sf_dir": sf_dir,
        "graph": {
            "edges": n_edges,
            "nodes": stats["n_nodes"],
            "max_degree": stats["max_d"],
            "p99_degree": stats["p99_d"],
        },
        "note": (
            "top-100 overlap measured against the largest cap (10^4 is "
            "uncapped whenever max_degree < 10^4); cap_fires records "
            "whether any node exceeded the cap at this scale"
        ),
        "caps": results,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v["time_s"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
