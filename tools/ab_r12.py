#!/usr/bin/env python
"""Round-12 same-session alternating A/B harness.

For each target, builds the OLD (pre-r12, inlined below from git
HEAD) and NEW (module) DataFrames from identical inputs, asserts the
results are IDENTICAL once, then alternates old/new noop-sink runs in
one warm session — the only drift-proof comparison on this host
(r11's measurement discipline).

Usage:
    python tools/ab_r12.py pagerank lpa ppr align jaccard containment kmeans
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "4"))


# ---------------------------------------------------------------- old impls
def old_pagerank(pairs, damping=0.85, n_iters=5):
    from module8_movies_etl_spark.sources.scratch import snapshot
    from module8_movies_etl_spark.operators.graphs import _doubled_edges

    e = _doubled_edges(pairs)
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    edges = snapshot(e.join(deg, "s"), prefix="ab_pr_edges_")
    n = edges.select("s").distinct().count()
    base = (1.0 - damping) / n
    ranks = edges.select("s").distinct().select(
        F.col("s").alias("node"), F.lit(1.0 / n).alias("p")
    )
    for _ in range(n_iters):
        contrib = (
            edges.join(ranks, edges.s == ranks.node)
            .select("t", (F.col("p") / F.col("d")).alias("_c"))
            .groupBy("t")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = contrib.select(
            F.col("t").alias("node"),
            (F.lit(base) + F.lit(damping) * F.col("_in")).alias("p"),
        )
    return ranks.select("node", F.round("p", 6).alias("rank"))


def old_lpa(pairs, n_rounds=4):
    from module8_movies_etl_spark.sources.scratch import snapshot
    from module8_movies_etl_spark.operators.graphs import _doubled_edges

    edges = snapshot(_doubled_edges(pairs), prefix="ab_lpa_edges_")
    labels = edges.select("s").distinct().select(
        F.col("s").alias("node"), F.col("s").alias("label")
    )
    pick = Window.partitionBy("t").orderBy(F.desc("_c"), F.asc("label"))
    for _ in range(n_rounds):
        labels = (
            edges.join(labels, edges.s == labels.node)
            .groupBy("t", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
            .withColumn("_rn", F.row_number().over(pick))
            .filter(F.col("_rn") == 1)
            .select(F.col("t").alias("node"), "label")
        )
    size_w = Window.partitionBy("label")
    return labels.select(
        "node",
        F.col("label").alias("community"),
        F.count(F.lit(1)).over(size_w).cast("long").alias("community_size"),
    )


def old_ppr(pairs, seeds, damping=0.85, n_iters=5):
    from module8_movies_etl_spark.sources.scratch import snapshot
    from module8_movies_etl_spark.operators.graphs import _doubled_edges

    e = _doubled_edges(pairs)
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    edges = snapshot(e.join(deg, "s"), prefix="ab_ppr_edges_")
    nodes = edges.select(F.col("s").alias("node")).distinct()
    seed_nodes = nodes.join(
        seeds.select(F.col(seeds.columns[0]).alias("node")).distinct(), "node"
    )
    n_seeds = seed_nodes.count()
    t_val = 1.0 / n_seeds
    base = nodes.join(
        seed_nodes.withColumn("_t", F.lit(t_val)), "node", "left"
    ).select("node", F.coalesce("_t", F.lit(0.0)).alias("t"))
    base = snapshot(base, prefix="ab_ppr_base_")
    ranks = base.select("node", F.col("t").alias("p"))
    for _ in range(n_iters):
        contrib = (
            edges.join(ranks, edges.s == ranks.node)
            .select("t", (F.col("p") / F.col("d")).alias("_c"))
            .groupBy("t")
            .agg(F.sum("_c").alias("_in"))
            .select(F.col("t").alias("node"), "_in")
        )
        ranks = base.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping) * F.col("t")
                + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
            ).alias("p"),
        )
    return ranks.select("node", F.round("p", 6).alias("trust"))


def old_ann_candidate_pairs(
    left, right, id_col, vec_col, n_planes, dim, n_bands,
    bucket_cap=128, coverage_min=2,
):
    from module8_movies_etl_spark.operators.similarity import (
        hyperplane_bucket_table,
    )

    band_bits = n_planes // n_bands
    mask = (1 << band_bits) - 1

    def bands(df, out_id):
        b = hyperplane_bucket_table(
            df, id_col, vec_col, n_planes, dim, tables=(0,)
        ).withColumnRenamed("_b0", "_bucket")
        return b.select(
            F.col(id_col).alias(out_id),
            F.explode(
                F.array(
                    *[
                        F.concat(
                            F.lit(f"{i}:"),
                            F.shiftright(
                                F.col("_bucket"), (n_bands - 1 - i) * band_bits
                            )
                            .bitwiseAND(F.lit(mask))
                            .cast("string"),
                        )
                        for i in range(n_bands)
                    ]
                )
            ).alias("bk"),
        )

    lb = bands(left, "_a")
    rb = bands(right, "_b")
    if bucket_cap is not None:
        rb = (
            rb.withColumn(
                "_rk",
                F.row_number().over(Window.partitionBy("bk").orderBy("_b")),
            )
            .filter(F.col("_rk") <= bucket_cap)
            .drop("_rk")
        )
    cand = lb.join(rb, "bk").select("_a", "_b").distinct()
    if coverage_min <= 0:
        return cand
    l_ids = left.select(F.col(id_col).alias("_a"))
    r_ids = right.select(F.col(id_col).alias("_b"))
    covered = (
        cand.groupBy("_a")
        .agg(F.count(F.lit(1)).alias("_nc"))
        .filter(F.col("_nc") >= coverage_min)
        .select("_a")
    )
    missed = l_ids.join(covered, "_a", "left_anti")
    return cand.unionByName(missed.crossJoin(r_ids)).distinct()


def old_align(left, right, id_col="vec_id", vec_col="embedding",
              n_planes=36, dim=64, n_bands=12, bucket_cap=128):
    from module8_movies_etl_spark.operators.similarity import (
        _prep_side, dot,
    )

    left = _prep_side(left, id_col, vec_col)
    right = _prep_side(right, id_col, vec_col)
    all_cand = old_ann_candidate_pairs(
        left, right, id_col, vec_col, n_planes, dim, n_bands, bucket_cap
    )
    lv = left.select(
        F.col(id_col).alias("_a"),
        F.col(vec_col).alias("_av"),
        F.col("_n").alias("_an"),
    )
    rv = right.select(
        F.col(id_col).alias("_b"),
        F.col(vec_col).alias("_bv"),
        F.col("_n").alias("_bn"),
    )
    scored = (
        all_cand.join(lv, "_a")
        .join(rv, "_b")
        .select(
            "_a",
            "_b",
            (
                dot(F.col("_av"), F.col("_bv"))
                / (F.col("_an") * F.col("_bn"))
            ).alias("_sim"),
        )
    )
    w = Window.partitionBy("_a").orderBy(F.desc("_sim"), F.col("_b"))
    top2 = scored.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= 2
    )
    return top2.groupBy(F.col("_a").alias(id_col)).agg(
        F.max(F.when(F.col("_r") == 1, F.col("_b"))).alias("match_id"),
        F.round(F.max(F.when(F.col("_r") == 1, F.col("_sim"))), 6).alias(
            "cosine_sim"
        ),
        F.round(
            F.max(F.when(F.col("_r") == 1, F.col("_sim")))
            - F.max(F.when(F.col("_r") == 2, F.col("_sim"))),
            6,
        ).alias("margin"),
    )


def old_jaccard_word(d, threshold=0.5):
    """Old = prefix path on UN-snapshotted word postings."""
    from module8_movies_etl_spark.operators.dedup import (
        _distinct_tokens, _jaccard_prefix_pairs,
    )

    base = d.filter(F.col("lang").isNotNull())
    docs = base.select(
        F.col("doc_id").alias("_id"),
        F.col("lang"),
        _distinct_tokens("text", 1).alias("_words"),
    ).withColumn("sz", F.size("_words"))
    postings = docs.select("_id", "lang", "sz", F.explode("_words").alias("w"))
    pairs = _jaccard_prefix_pairs(postings, ["lang"], threshold)
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def old_containment(df, id_col, text_col, block_cols, threshold=0.9):
    from module8_movies_etl_spark.operators.dedup import _distinct_tokens

    base = df
    for c in block_cols:
        base = base.filter(F.col(c).isNotNull())
    docs = base.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in block_cols],
        _distinct_tokens(text_col, 1).alias("_words"),
    ).withColumn("sz", F.size("_words"))
    postings = docs.select(
        "_id", *block_cols, "sz", F.explode("_words").alias("w")
    )
    dfreq = postings.groupBy("w").agg(F.count(F.lit(1)).alias("_df"))
    ranked = postings.join(dfreq, "w").withColumn(
        "_r",
        F.row_number().over(
            Window.partitionBy("_id").orderBy(F.col("_df").asc(), F.col("w").asc())
        ),
    )
    prefix_len = F.col("sz") - F.ceil(F.lit(float(threshold)) * F.col("sz")) + 1
    probe = ranked.filter(F.col("_r") <= prefix_len).select(
        F.col("_id").alias("_id_s"),
        *[F.col(c) for c in block_cols],
        F.col("sz").alias("sz_s"),
        F.col("_r").alias("_rs"),
        "w",
    )
    build = ranked.select(
        F.col("_id").alias("_id_l"),
        *[F.col(c) for c in block_cols],
        F.col("sz").alias("sz_l"),
        F.col("_r").alias("_rl"),
        "w",
    )
    smaller = (F.col("sz_s") < F.col("sz_l")) | (
        (F.col("sz_s") == F.col("sz_l")) & (F.col("_id_s") < F.col("_id_l"))
    )
    alpha = F.ceil(F.lit(float(threshold)) * F.col("sz_s"))
    ubound = 1 + F.least(
        F.col("sz_s") - F.col("_rs"), F.col("sz_l") - F.col("_rl")
    )
    cand = (
        probe.join(build, [*block_cols, "w"])
        .filter(smaller)
        .filter(ubound >= alpha)
        .select("_id_s", "_id_l")
        .distinct()
    )
    ws = docs.select(
        F.col("_id").alias("_id_s"),
        F.col("_words").alias("_ws"),
        F.col("sz").alias("sz_s"),
    )
    wl = docs.select(
        F.col("_id").alias("_id_l"),
        F.col("_words").alias("_wl"),
        F.col("sz").alias("sz_l"),
    )
    pairs = (
        cand.join(ws, "_id_s")
        .join(wl, "_id_l")
        .select(
            F.least("_id_s", "_id_l").alias("id_a"),
            F.greatest("_id_s", "_id_l").alias("id_b"),
            F.size(F.array_intersect("_ws", "_wl")).cast("double").alias("_inter"),
            F.least("sz_s", "sz_l").cast("double").alias("_minsz"),
        )
    )
    return (
        pairs.withColumn("containment", F.col("_inter") / F.col("_minsz"))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def old_kmeans_diversity(emb, k=8, n_rounds=2, per_cluster=16):
    from module8_movies_etl_spark.operators.clustering import (
        _half_up_div, _quantize,
    )

    id_col, vec_col = "vec_id", "embedding"

    def dist_cols(centroids):
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        F.col("_q"),
                        F.array(*[F.lit(int(c)) for c in cen]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
                for cen in centroids
            ]
        )
        dd = F.array_min(dists)
        cluster = (F.array_position(dists, dd) - 1).cast("int")
        return dd, cluster

    q = _quantize(emb, id_col, vec_col)
    seeds = (
        q.select(F.md5(F.col(id_col).cast("string")).alias("_m"), F.col(id_col), "_q")
        .orderBy("_m", id_col)
        .limit(k)
    )
    centroids = [
        list(r["_q"])
        for r in sorted(seeds.collect(), key=lambda r: (r["_m"], r[id_col]))
    ]
    k = len(centroids)
    dim = len(centroids[0])
    for _ in range(n_rounds - 1):
        d, cluster = dist_cols(centroids)
        assigned = q.select(cluster.alias("_c"), "_q")
        stats = (
            assigned.select("_c", F.posexplode("_q").alias("_p", "_x"))
            .groupBy("_c", "_p")
            .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
        )
        by_cluster = {}
        for r in stats.collect():
            by_cluster.setdefault(r["_c"], {})[r["_p"]] = (int(r["_s"]), int(r["_n"]))
        centroids = [
            [
                _half_up_div(*by_cluster[c][p]) if c in by_cluster else centroids[c][p]
                for p in range(dim)
            ]
            for c in range(k)
        ]
    d, cluster = dist_cols(centroids)
    a = q.select(F.col(id_col), cluster.alias("cluster"), d.alias("dist_q"))
    cw = Window.partitionBy("cluster")
    rw = Window.partitionBy("cluster").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return a.select(
        id_col,
        "cluster",
        "dist_q",
        F.count(F.lit(1)).over(cw).alias("n_cluster"),
        F.row_number().over(rw).alias("samp_rank"),
        (F.row_number().over(rw) <= per_cluster).alias("is_sampled"),
    )


# ------------------------------------------------------------------ harness
def noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def check_equal(a: DataFrame, b: DataFrame, name: str) -> None:
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb, f"{name}: OLD and NEW results differ! ({len(ra)} vs {len(rb)} rows)"
    print(f"{name}: results IDENTICAL ({len(ra)} rows)", flush=True)


def run_ab(name: str, mk_old, mk_new) -> None:
    check_equal(mk_old(), mk_new(), name)
    olds, news = [], []
    for _ in range(REPS):
        olds.append(noop(mk_old()))
        news.append(noop(mk_new()))
    import statistics

    print(
        f"AB {name}: old min {min(olds)} med {statistics.median(olds)} {olds} | "
        f"new min {min(news)} med {statistics.median(news)} {news}",
        flush=True,
    )


def main() -> int:
    targets = sys.argv[1:] or [
        "pagerank", "lpa", "ppr", "align", "jaccard", "containment", "kmeans"
    ]
    from module8_movies_etl_spark.session import get_spark
    from module8_movies_etl_spark.sources.readers import read_table
    from module8_movies_etl_spark.operators import (
        clustering, dedup, graphs, similarity,
    )

    spark = get_spark(
        "ab_r12", extra_conf={"spark.sql.codegen.cache.maxEntries": "4096"}
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    def _idpdf(it):
        yield from it

    spark.range(256).repartition(32).mapInPandas(_idpdf, "id long").count()

    emb = read_table(spark, SF, "embeddings")
    docs = read_table(spark, SF, "documents")

    def dup_pairs():
        return similarity.embedding_near_dups(
            emb, threshold=0.2, n_planes=12, dim=64, n_bands=3
        )

    if "pagerank" in targets:
        run_ab(
            "pagerank",
            lambda: old_pagerank(dup_pairs()),
            lambda: graphs.pagerank(dup_pairs(), damping=0.85, n_iters=5),
        )
    if "lpa" in targets:
        run_ab(
            "lpa",
            lambda: old_lpa(dup_pairs()),
            lambda: graphs.label_propagation(dup_pairs(), n_rounds=4),
        )
    if "ppr" in targets:
        seeds = emb.filter(F.pmod(F.col("vec_id"), F.lit(41)) == 0).select("vec_id")
        run_ab(
            "ppr",
            lambda: old_ppr(dup_pairs(), seeds),
            lambda: graphs.personalized_pagerank(
                dup_pairs(), seeds, damping=0.85, n_iters=5
            ),
        )
    if "align" in targets:
        left = emb.filter(F.pmod(F.col("label"), F.lit(2)) == 0)
        right = emb.filter(F.pmod(F.col("label"), F.lit(2)) == 1)
        run_ab(
            "align",
            lambda: old_align(left, right),
            lambda: similarity.bipartite_align_ann(left, right),
        )
    if "jaccard" in targets:
        run_ab(
            "jaccard",
            lambda: old_jaccard_word(docs),
            lambda: dedup.jaccard_similar_pairs(
                docs, "doc_id", "text", block_cols=["lang"], threshold=0.5
            ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard")),
        )
    if "containment" in targets:
        run_ab(
            "containment",
            lambda: old_containment(docs, "doc_id", "text", ["lang"], 0.9),
            lambda: dedup.containment_pairs(
                docs, "doc_id", "text", ["lang"], 0.9
            ),
        )
    if "jaccard_prefix" in targets:
        run_ab(
            "jaccard_prefix",
            lambda: old_jaccard_word(docs),
            lambda: dedup.jaccard_similar_pairs(
                docs, "doc_id", "text", block_cols=["lang"], threshold=0.5,
                strategy="prefix",
            ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard")),
        )
    if "containment_postings" in targets:
        run_ab(
            "containment_postings",
            lambda: old_containment(docs, "doc_id", "text", ["lang"], 0.9),
            lambda: dedup.containment_pairs(
                docs, "doc_id", "text", ["lang"], 0.9, strategy="postings"
            ),
        )
    if "kmeans" in targets:
        run_ab(
            "kmeans",
            lambda: old_kmeans_diversity(emb),
            lambda: clustering.kmeans_diversity_sample(
                emb, k=8, n_rounds=2, per_cluster=16
            ),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
