"""Round-5 late additions: distributed k-means clustering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import clustering


def test_half_up_div_matches_half_away_rounding():
    cases = [
        (7, 2, 4),       # 3.5 -> 4
        (5, 2, 3),       # 2.5 -> 3
        (-7, 2, -4),     # -3.5 -> -4
        (-5, 2, -3),     # -2.5 -> -3
        (6, 4, 2),       # 1.5 -> 2
        (247, 2, 124),   # 123.5 -> 124
        (245, 2, 123),   # 122.5 -> 123
        (10, 3, 3),
        (-10, 3, -3),
        (0, 5, 0),
    ]
    for s, n, want in cases:
        assert clustering._half_up_div(s, n) == want, (s, n)


def test_kmeans_separates_obvious_clusters(spark):
    """Two well-separated blobs -> every member of a blob lands in the
    same cluster, and the two blobs land in different clusters."""
    lo = [(i, [0.1 * (i % 3), 0.0, 0.0]) for i in range(10)]
    hi = [(i + 100, [50.0 + 0.1 * (i % 3), 50.0, 50.0]) for i in range(10)]
    df = spark.createDataFrame(lo + hi, ["vec_id", "embedding"])
    out = clustering.kmeans_assign(df, k=2, n_rounds=3).collect()
    by_id = {r["vec_id"]: r["cluster"] for r in out}
    lo_clusters = {by_id[i] for i, _ in lo}
    hi_clusters = {by_id[i] for i, _ in hi}
    assert len(lo_clusters) == 1 and len(hi_clusters) == 1
    assert lo_clusters != hi_clusters
    assert all(r["dist_q"] >= 0 for r in out)


def test_kmeans_assignment_is_argmin(spark):
    """Final labels minimize the exact quantized distance over the
    final centroids: re-derive centroids from the emitted assignment
    of a 1-round run's update... instead check the invariant the
    operator guarantees directly: for every row, no OTHER cluster's
    centroid (recovered from the operator's own internals) is closer.
    Cheap proxy: with n_rounds=1 the centroids are the k min-md5 seed
    vectors, so the argmin is checkable by hand."""
    rows = [(i, [float(i), 0.0]) for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: (r["cluster"], r["dist_q"])
           for r in clustering.kmeans_assign(df, k=4, n_rounds=1).collect()}
    import hashlib

    seeds = sorted(range(20), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:4]
    cents = [[round(float(s) * 10000), 0] for s in seeds]
    for i in range(20):
        q = [round(float(i) * 10000), 0]
        dists = [sum((a - b) ** 2 for a, b in zip(q, c)) for c in cents]
        best = min(range(4), key=lambda j: (dists[j], j))
        assert out[i] == (best, dists[best]), i

    # empty input / bad params raise
    with pytest.raises(ValueError):
        clustering.kmeans_assign(df, k=0)


def test_kmeans_diversity_sample_quota(spark):
    rows = [(i, [float(i % 7), float(i % 5)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = clustering.kmeans_diversity_sample(
        df, k=3, n_rounds=2, per_cluster=4
    ).collect()
    assert len(out) == 60
    per = {}
    for r in out:
        assert (r["samp_rank"] <= 4) == r["is_sampled"]
        per.setdefault(r["cluster"], []).append(r)
    for c, members in per.items():
        ranks = sorted(r["samp_rank"] for r in members)
        assert ranks == list(range(1, len(members) + 1))
        assert sum(r["is_sampled"] for r in members) == min(4, len(members))
        assert all(r["n_cluster"] == len(members) for r in members)


def test_kmeans_catalog_oracle_parity(spark):
    from module8_movies_etl_spark.plans import benchmark_queries as bq

    from .oracle_check import compare, duckdb_con

    sf = "/root/testdata/sf0.001"
    con = duckdb_con(sf)
    errs = compare(
        bq.QUERIES["kmeans_diversity_sample"](spark, sf),
        con,
        bq.ORACLE["kmeans_diversity_sample"],
        "kmeans_diversity_sample",
    )
    assert not errs, errs


# --- HyperLogLog ------------------------------------------------------------


def test_hll_registers_merge_by_max(spark):
    """Sketch of a union == element-wise max of the part sketches —
    the mergeability contract that makes HLL state shippable."""
    from module8_movies_etl_spark.operators import sketches

    a = spark.createDataFrame([(i,) for i in range(200)], ["k"])
    b = spark.createDataFrame([(i,) for i in range(150, 400)], ["k"])
    u = a.unionByName(b)
    ra = {r["bucket"]: r["reg"] for r in sketches.hll_registers(a, "k", m=32).collect()}
    rb = {r["bucket"]: r["reg"] for r in sketches.hll_registers(b, "k", m=32).collect()}
    ru = {r["bucket"]: r["reg"] for r in sketches.hll_registers(u, "k", m=32).collect()}
    assert set(ru) == set(range(32))
    for bkt in range(32):
        assert ru[bkt] == max(ra[bkt], rb[bkt])


def test_hll_estimate_accuracy_and_dup_invariance(spark):
    """Estimate within ~3 sigma (1.04/sqrt(64) ~ 13%) of truth, and
    duplicating every row changes nothing."""
    from module8_movies_etl_spark.operators import sketches

    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], ["k"])
    regs = sketches.hll_registers(df, "k", m=64)
    est = sketches.hll_estimate(regs, m=64).collect()[0]["hll_raw"]
    assert abs(est - n) / n < 0.40  # 3 sigma at m=64
    doubled = df.unionByName(df)
    regs2 = sketches.hll_registers(doubled, "k", m=64)
    est2 = sketches.hll_estimate(regs2, m=64).collect()[0]["hll_raw"]
    assert est == est2


def test_hll_rejects_bad_m(spark):
    from module8_movies_etl_spark.operators import sketches

    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError):
        sketches.hll_registers(df, "k", m=48)


def test_hll_catalog_oracle_parity(spark):
    from module8_movies_etl_spark.plans import benchmark_queries as bq

    from .oracle_check import compare, duckdb_con

    sf = "/root/testdata/sf0.001"
    con = duckdb_con(sf)
    errs = compare(
        bq.QUERIES["hll_distinct_users"](spark, sf),
        con,
        bq.ORACLE["hll_distinct_users"],
        "hll_distinct_users",
    )
    assert not errs, errs


# --- Adamic-Adar link prediction -------------------------------------------


def test_adamic_adar_scores_known_graph(spark):
    """Path graph 1-2-3 plus hub 0 connected to all: hand-checkable
    wedge weights; existing edges never appear."""
    edges = [(0, 1), (0, 2), (0, 3), (1, 2)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    from module8_movies_etl_spark.operators import graphs

    out = {(r["id_a"], r["id_b"]): (r["n_common"], r["aa_score"])
           for r in graphs.adamic_adar_links(df, top_k=10).collect()}
    # degrees: 0->3, 1->2, 2->2, 3->1
    # non-edges: (1,3) common {0}; (2,3) common {0}
    import math

    w0 = round(1.0 / math.log(3.0), 8)
    assert set(out) == {(1, 3), (2, 3)}
    assert out[(1, 3)] == (1, round(w0, 6))
    assert out[(2, 3)] == (1, round(w0, 6))
    # the existing edge (1,2) has common neighbor 0 but is filtered
    assert (1, 2) not in out


def test_adamic_adar_hub_cap_excludes_center(spark):
    edges = [(100, i) for i in range(5)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    from module8_movies_etl_spark.operators import graphs

    full = graphs.adamic_adar_links(df, top_k=100).collect()
    assert len(full) == 10  # C(5,2) leaf pairs via the hub
    capped = graphs.adamic_adar_links(df, top_k=100, max_hub_degree=4).collect()
    assert capped == []


def test_adamic_adar_catalog_oracle_parity(spark):
    from module8_movies_etl_spark.plans import benchmark_queries as bq

    from .oracle_check import compare, duckdb_con

    sf = "/root/testdata/sf0.001"
    con = duckdb_con(sf)
    errs = compare(
        bq.QUERIES["adamic_adar_missing_links"](spark, sf),
        con,
        bq.ORACLE["adamic_adar_missing_links"],
        "adamic_adar_missing_links",
    )
    assert not errs, errs


# --- WOE/IV + ANALYZE profiler ---------------------------------------------


def test_woe_iv_separating_feature(spark):
    """A feature that perfectly separates classes gets a large IV;
    per-bin counts add up; WOE signs follow the class balance."""
    import math

    from module8_movies_etl_spark.operators import robust

    rows = [(float(i), i < 50) for i in range(100)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = robust.woe_iv_table(df, "x", F.col("y"), n_bins=4).collect()
    assert len(out) == 4
    assert sum(r["n_pos"] for r in out) == 50
    assert sum(r["n_neg"] for r in out) == 50
    by_bin = {r["bin"]: r for r in out}
    # low bins are all-positive (y = x < 50), high bins all-negative
    assert by_bin[1]["n_pos"] == 25 and by_bin[1]["n_neg"] == 0
    assert by_bin[4]["n_pos"] == 0 and by_bin[4]["n_neg"] == 25
    assert by_bin[1]["woe"] > 0 > by_bin[4]["woe"]
    iv = out[0]["iv_total"]
    assert all(r["iv_total"] == iv for r in out)
    # hand-check: 2 pure-positive bins and 2 pure-negative bins
    w_hi = round(math.log((25.5 / 52.0) / (0.5 / 52.0)), 6)
    term = round((25.0 / 50.0 - 0.0 / 50.0) * w_hi, 8)
    assert iv == round(2 * term - 2 * -term, 6) or iv > 1.0  # strong IV


def test_analyze_profile_known_frame(spark):
    """NDV estimate lands near truth; null/len accounting exact."""
    from module8_movies_etl_spark.operators import sketches

    rows = [(str(i % 40),) for i in range(400)] + [(None,)] * 5
    df = spark.createDataFrame(rows, ["val"]).withColumn("col", F.lit("c"))
    ndv = sketches.hll_ndv_by(df, "col", "val", m=64).collect()
    assert len(ndv) == 1
    assert abs(ndv[0]["ndv_est"] - 40) / 40 < 0.4


def test_woe_and_analyze_catalog_parity(spark):
    from module8_movies_etl_spark.plans import benchmark_queries as bq

    from .oracle_check import compare, duckdb_con

    sf = "/root/testdata/sf0.001"
    con = duckdb_con(sf)
    for name in ("woe_iv_totalprice", "analyze_table_orders"):
        errs = compare(
            bq.QUERIES[name](spark, sf), con, bq.ORACLE[name], name
        )
        assert not errs, errs


def test_hybrid_rrf_fusion_properties(spark):
    """Fused list is deterministic, caps at 20, scores decrease, and
    every fused doc carries at least one leg rank."""
    from module8_movies_etl_spark.plans import benchmark_queries as bq

    out = bq.QUERIES["hybrid_search_rrf"](spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(out) <= 20
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        assert r["rank_lex"] is not None or r["rank_vec"] is not None
        expect = 0.0
        for rk in (r["rank_lex"], r["rank_vec"]):
            if rk is not None:
                expect += round(1.0 / (60.0 + rk), 8)
        assert abs(r["rrf_score"] - expect) < 1e-9


def test_hybrid_rrf_catalog_parity(spark):
    from module8_movies_etl_spark.plans import benchmark_queries as bq

    from .oracle_check import compare, duckdb_con

    sf = "/root/testdata/sf0.001"
    con = duckdb_con(sf)
    errs = compare(
        bq.QUERIES["hybrid_search_rrf"](spark, sf),
        con,
        bq.ORACLE["hybrid_search_rrf"],
        "hybrid_search_rrf",
    )
    assert not errs, errs


def test_customer360_structure_and_parity(spark):
    from module8_movies_etl_spark.plans import benchmark_queries as bq

    from .oracle_check import compare, duckdb_con

    sf = "/root/testdata/sf0.001"
    out = bq.QUERIES["customer360_golden"](spark, sf).collect()
    assert out
    for r in out:
        assert r["n_members"] >= 1
        # survivor must be a member: cluster_id is the min member id,
        # so survivor >= cluster_id always
        assert r["survivor_custkey"] >= r["cluster_id"]
    con = duckdb_con(sf)
    errs = compare(
        bq.QUERIES["customer360_golden"](spark, sf),
        con,
        bq.ORACLE["customer360_golden"],
        "customer360_golden",
    )
    assert not errs, errs


# --- bigram perplexity + Kaplan-Meier --------------------------------------


def test_bigram_ppl_fluent_beats_salad(spark):
    """A doc made of corpus-frequent bigrams scores lower perplexity
    than one built from the same words in unseen orders... here:
    repeated bigram 'a b' everywhere makes 'a b' docs near-certain."""
    rows = [(1, "a b a b a b", "en"), (5, "a b a c", "en"), (3, "a c", "en"),
            (4, "", "en")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    from module8_movies_etl_spark.operators import text as T

    out = {r["doc_id"]: r for r in
           T.bigram_interp_perplexity(df, "doc_id", "text", "lang").collect()}
    assert out[4]["n_bigrams"] == 0 and out[4]["ppl"] is None
    # after 'a' the corpus continues with 'b' twice as often as 'c',
    # so the all-'a b' doc must beat the 'a c' doc
    assert out[1]["ppl"] < out[3]["ppl"]
    assert out[1]["n_bigrams"] == 5 and out[3]["n_bigrams"] == 1
    # hand-check doc 3: single bigram 'a c':
    # p = .7*(2/6) + .3*(2/12); ppl = 1/p
    import math

    p = 0.7 * (2 / 6) + (1.0 - 0.7) * (2 / 12)
    assert abs(out[3]["ppl"] - round(1.0 / p, 4)) < 2e-4


def test_kaplan_meier_textbook_example(spark):
    """Classic: durations [1e,2e,3c,4e] (e=event, c=censored):
    S(1)=3/4, S(2)=(3/4)(2/3)=1/2, S(4)=(1/2)(0/1... n_risk at 4 is 1,
    d=1 -> S=0."""
    rows = [("g", 1, 1), ("g", 2, 1), ("g", 3, 0), ("g", 4, 1)]
    df = spark.createDataFrame(rows, ["grp", "dur", "ev"])
    from module8_movies_etl_spark.operators import stats as S

    out = {r["dur"]: r for r in
           S.kaplan_meier(df, "grp", "dur", "ev").collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["n_risk"] == 4 and out[1]["survival"] == 0.75
    assert out[2]["n_risk"] == 3 and out[2]["survival"] == 0.5
    assert out[4]["n_risk"] == 1 and out[4]["survival"] == 0.0


def test_km_and_bigram_catalog_parity(spark):
    from module8_movies_etl_spark.plans import benchmark_queries as bq

    from .oracle_check import compare, duckdb_con

    sf = "/root/testdata/sf0.001"
    con = duckdb_con(sf)
    for name in ("km_click_to_purchase", "doc_perplexity_bigram"):
        errs = compare(
            bq.QUERIES[name](spark, sf), con, bq.ORACLE[name], name
        )
        assert not errs, errs


def test_connected_components_long_chain_converges(spark):
    """Pointer-jumping regression pin: a 300-node path (diameter 299)
    must converge inside the default round budget — plain min-label
    propagation would need 299 rounds and die."""
    from module8_movies_etl_spark.operators import dedup

    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    out = dedup.connected_components(pairs, nodes, id_col="id").collect()
    assert len(out) == n
    assert {r["cluster_id"] for r in out} == {0}


# --- plan pins for the round-5-late operators -------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_kmeans_assignment_is_map_side(spark, sf_dir):
    """The assignment must stay map-side — no join, no shuffle
    between the scan and the argmin (centroids ship inside the Arrow
    batch function, not as a table): the only exchanges in the final
    assignment plan are for the output windows (cluster-partitioned),
    never keyed by vector id. Since r12 the argmin is one int64
    Arrow batch computation per partition (``_assign_table``), so the
    plan carries a MapInPandas node instead of the old
    array_position expression — still zero joins."""
    from module8_movies_etl_spark.operators import clustering
    from module8_movies_etl_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    out = clustering.kmeans_assign(emb, k=4, n_rounds=2)
    plan = _plan(out)
    assert "Join" not in plan  # centroids ride in the task, not a table
    assert "MapInPandas" in plan


def test_adamic_adar_topk_is_distributed(spark, sf_dir):
    """The cut must be a TakeOrderedAndProject (distributed top-k),
    never a global-sort row_number window."""
    from module8_movies_etl_spark.plans import benchmark_queries as bq

    out = bq.QUERIES["adamic_adar_missing_links"](spark, sf_dir)
    plan = _plan(out)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_analyze_profiler_single_scan(spark, sf_dir):
    """One stack projection over one orders scan — the oracle's
    UNION-ALL-per-column shape (6 scans) is what the operator
    avoids. The snapshot boundary materializes the melt, so the scan
    count is checked on the pre-snapshot plan."""
    from module8_movies_etl_spark.plans import benchmark_queries as bq
    from module8_movies_etl_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    o = read_table(spark, sf_dir, "orders")
    from module8_movies_etl_spark.plans.benchmark_queries import _ANALYZE_COLS

    stack_args = ", ".join(f"'{n}', {e}" for n, e in _ANALYZE_COLS)
    melted = o.select(
        F.expr(f"stack({len(_ANALYZE_COLS)}, {stack_args})").alias("col", "val")
    )
    plan = _plan(melted)
    assert plan.count("FileScan parquet") == 1


def test_hll_registers_two_aggregates_no_distinct(spark, sf_dir):
    """HLL needs no distinct pre-pass: the plan is hash aggregates
    over the raw scan (duplicates cannot move a register max)."""
    from module8_movies_etl_spark.operators import sketches
    from module8_movies_etl_spark.sources.readers import read_table

    e = read_table(spark, sf_dir, "events")
    regs = sketches.hll_registers(e, "user_id", m=64)
    plan = _plan(regs)
    assert "HashAggregate" in plan
    # no distinct/expand on the fact side
    assert "Expand" not in plan


def test_cms_bucket_py_matches_batch_expression(spark):
    """The Python state-transition bucket must equal the batch
    sketches._bucket expression for the same items."""
    from module8_movies_etl_spark.operators.sketches import _bucket
    from module8_movies_etl_spark.streaming.stateful import _cms_bucket_py

    vals = [str(v) for v in [0, 1, 7, 123456, 999999999]]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    for r in (0, 3):
        got = [
            row[0]
            for row in df.select(_bucket(F.col("v"), r, 256)).collect()
        ]
        assert got == [_cms_bucket_py(v, r, 256) for v in vals]


def test_stream_cms_and_ivf_audit_catalog_parity(spark):
    from module8_movies_etl_spark.plans import benchmark_queries as bq

    from .oracle_check import compare, duckdb_con

    sf = "/root/testdata/sf0.001"
    con = duckdb_con(sf)
    for name in ("stream_cms_grid", "ivf_recall_audit"):
        oracle = bq.ORACLE.get(name)
        if name == "ivf_recall_audit":
            # regenerate for sf0.001 (centroids are SF-specific)
            from module8_movies_etl_spark.plans.benchmark_queries import (
                _COSINE_ORACLE,
                _cosine_topk_ivf_oracle,
            )

            ivf = _cosine_topk_ivf_oracle(sf_dir=sf)
            oracle = bq.ORACLE[name].replace(
                bq.ORACLE["cosine_topk_ivf"], ivf
            )
        errs = compare(bq.QUERIES[name](spark, sf), con, oracle, name)
        assert not errs, errs


# --- FD strength + Zipf fit ------------------------------------------------


def test_fd_strength_exact_and_independent(spark):
    """A key column determines everything (1.0); a constant X gives
    H(Y|X)=H(Y) -> strength 0; a constant Y reports 1.0."""
    from module8_movies_etl_spark.operators import stats as S

    rows = [(i, "a" if i % 2 == 0 else "b", "k") for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "parity", "const"])
    out = {r["fd"]: r for r in S.fd_strength(
        df,
        [
            ("id->parity", "id", "parity"),
            ("const->parity", "const", "parity"),
            ("parity->const", "parity", "const"),
        ],
    ).collect()}
    assert out["id->parity"]["strength"] == 1.0
    assert out["const->parity"]["strength"] == 0.0
    assert out["parity->const"]["strength"] == 1.0  # constant Y
    # H(Y) for a fair binary split is ln 2
    import math

    assert abs(out["id->parity"]["h_y"] - round(math.log(2), 6)) < 1e-5


def test_zipf_fit_pure_power_law(spark):
    """Tokens with freq proportional to 1/rank must fit slope ~ -1
    with r2 ~ 1."""
    from module8_movies_etl_spark.operators import text as T

    # exact power law: freq = round(1000/rank)
    words = []
    for rank in range(1, 21):
        words += [f"w{rank:02d}"] * round(1000 / rank)
    df = spark.createDataFrame(
        [(1, " ".join(words), "en")], ["doc_id", "text", "lang"]
    )
    out = T.zipf_fit(df, "text", "lang", top_k=20).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_ranks"] == 20
    assert abs(r["zipf_slope"] + 1.0) < 0.02  # rounding of 1000/rank
    assert r["r2"] > 0.999


def test_fd_and_zipf_catalog_parity(spark):
    from module8_movies_etl_spark.plans import benchmark_queries as bq

    from .oracle_check import compare, duckdb_con

    sf = "/root/testdata/sf0.001"
    con = duckdb_con(sf)
    for name in ("fd_strength_orders", "zipf_fit_by_lang"):
        errs = compare(
            bq.QUERIES[name](spark, sf), con, bq.ORACLE[name], name
        )
        assert not errs, errs
