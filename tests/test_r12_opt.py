"""Round-12 optimization equivalence pins.

Each r12 rewrite changed an operator's INTERNALS while claiming
identical results; these tests pin the claim on hand-checkable
fixtures (the oracle replay at catalog scale is the other half of
the evidence).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import clustering, graphs, similarity


# --------------------------------------------------------------- kmeans


def test_kmeans_arrow_assign_matches_python_reference(spark):
    """The Arrow int64 argmin (``_assign_table``) must reproduce the
    exact-integer distance and the ties→lowest-centroid rule. The
    fixture forces a TIE: (3, 0) is equidistant from centroids
    (0,0) and (6,0) — quantized 30000² each way — and must take
    cluster 0 (first minimum)."""
    rows = [
        (1, [0.0, 0.0]),
        (2, [6.0, 0.0]),
        (3, [3.0, 0.0]),  # equidistant tie
        (4, [5.9, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = clustering._quantize(df, "vec_id", "embedding")
    cents = [[0, 0], [60000, 0]]
    out = {
        r["vec_id"]: (r["cluster"], r["dist_q"])
        for r in clustering._assign_table(q, "vec_id", cents).collect()
    }
    # python reference, first-min ties
    def ref(v):
        d = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents]
        m = min(d)
        return d.index(m), m

    qv = {1: [0, 0], 2: [60000, 0], 3: [30000, 0], 4: [59000, 1000]}
    for vid, v in qv.items():
        assert out[vid] == ref(v), f"vec {vid}: {out[vid]} != {ref(v)}"
    assert out[3][0] == 0  # the tie takes the FIRST centroid


def test_kmeans_arrow_update_stats_are_exact_sums(spark):
    """``_update_stats``'s per-batch partial aggregation must produce
    the exact per-(cluster, position) integer sums and counts the old
    posexplode aggregate produced."""
    rows = [(i, [float(i), float(-i)]) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = clustering._quantize(df, "vec_id", "embedding")
    cents = [[0, 0], [80000, -80000]]
    got = {
        (r["_c"], r["_p"]): (r["_s"], r["_n"])
        for r in clustering._update_stats(q, cents).collect()
    }
    # reference assignment: i<=4 -> cluster 0 (1..4 quantized 1e4*i),
    # i>=5 -> cluster 1; sums are exact integers
    c0 = [i * 10000 for i in range(1, 5)]
    c1 = [i * 10000 for i in range(5, 9)]
    assert got[(0, 0)] == (sum(c0), 4)
    assert got[(0, 1)] == (-sum(c0), 4)
    assert got[(1, 0)] == (sum(c1), 4)
    assert got[(1, 1)] == (-sum(c1), 4)


# ----------------------------------------------------- ANN candidate set


def test_ann_candidates_disjoint_split_equals_union_distinct(spark):
    """The r12 disjoint split (kept covered candidates ∪ full
    right-side fallback for uncovered probes) must equal the pre-r12
    ``distinct(banded ∪ missed×right)`` formula, and carry NO
    duplicate pairs (a duplicate would zero a margin downstream)."""
    import random

    rng = random.Random(7)
    mk = lambda n, off: [  # noqa: E731
        (off + i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(n)
    ]
    left = spark.createDataFrame(
        mk(40, 0), "vec_id long, embedding array<double>"
    )
    right = spark.createDataFrame(
        mk(25, 1000), "vec_id long, embedding array<double>"
    )
    lp = similarity._prep_side(left, "vec_id", "embedding")
    rp = similarity._prep_side(right, "vec_id", "embedding")
    args = ("vec_id", "embedding", 12, 8, 4)  # n_planes, dim, n_bands
    new = similarity._ann_candidate_pairs(lp, rp, *args, bucket_cap=4)
    rows = [tuple(r) for r in new.collect()]
    assert len(rows) == len(set(rows)), "duplicate candidate pair emitted"

    # pre-r12 reference formula, rebuilt from the same band tables
    cand = (
        similarity._ann_candidate_pairs(
            lp, rp, *args, bucket_cap=4, coverage_min=0
        )
    )  # banded-only (distinct) — the coverage_min=0 path is unchanged
    covered = (
        cand.groupBy("_a")
        .agg(F.count(F.lit(1)).alias("_nc"))
        .filter(F.col("_nc") >= 2)
        .select("_a")
    )
    l_ids = lp.select(F.col("vec_id").alias("_a"))
    r_ids = rp.select(F.col("vec_id").alias("_b"))
    old = (
        cand.unionByName(
            l_ids.join(covered, "_a", "left_anti").crossJoin(r_ids)
        ).distinct()
    )
    assert set(rows) == {tuple(r) for r in old.collect()}


# ------------------------------------------------------ graph round-1 folds


def test_pagerank_round1_fold_matches_reference(spark):
    """One-iteration PageRank on a hand graph must equal the explicit
    p₁(v) = (1−d)/N + d·Σ (1/N)/deg(u) formula the fold compiles to."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    out = {
        r["node"]: r["rank"]
        for r in graphs.pagerank(pairs, damping=0.85, n_iters=1).collect()
    }
    n = 4
    deg = {1: 1, 2: 2, 3: 2, 4: 1}
    nbr = {1: [2], 2: [1, 3], 3: [2, 4], 4: [3]}
    for v in deg:
        expect = round(
            (1 - 0.85) / n + 0.85 * sum((1.0 / n) / deg[u] for u in nbr[v]), 6
        )
        assert abs(out[v] - expect) < 1e-9, (v, out[v], expect)


def test_lpa_round1_fold_is_min_neighbor(spark):
    """Round 1 of identity-init LPA: every neighbor label is distinct
    (count 1), so the (count DESC, label ASC) pick degenerates to MIN
    neighbor — the fold's aggregate. Star graph: center 5 takes min
    leaf 1, every leaf takes 5."""
    pairs = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3)][::-1], "id_a long, id_b long"
    )
    out = {
        r["node"]: r["community"]
        for r in graphs.label_propagation(pairs, n_rounds=1).collect()
    }
    assert out == {5: 1, 1: 5, 2: 5, 3: 5}


def test_lpa_round2_after_fold_keeps_frequency_rule(spark):
    """Rounds AFTER the fold must still apply the most-frequent rule
    (not min): triangle 1-2-3 plus pendant 4 on node 1. Round 1:
    1→2? No — min neighbor: 1 gets min(2,3,4)=2, 2 gets 1, 3 gets 1,
    4 gets 1. Round 2 for node 4 (nbr {1}): label of 1 = 2 → 4 takes
    2; node 2 (nbrs 1,3): labels {2,1} tie → min 1; node 1
    (nbrs 2,3,4): labels {1,1,1} → 1; node 3 (nbrs 1,2): {2,1} → 1."""
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], "id_a long, id_b long"
    )
    out = {
        r["node"]: r["community"]
        for r in graphs.label_propagation(pairs, n_rounds=2).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 2}
