"""Round-4 additions vs independent Python models: EWMA closed form,
multi-touch attribution, compaction binning, rolling KMV merge,
Poisson bootstrap."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from pyspark.sql import functions as F


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, minutes=m, seconds=s)


# ------------------------------------------------------------------ ewma


def test_ewma_matches_recurrence(spark):
    from module8_movies_etl_spark.operators.timeseries import ewma_smooth

    rows = [("a", _ts(h), float(v)) for h, v in enumerate([10, 20, 5, 0, 40, 7])]
    rows += [("b", _ts(2 * h), float(h)) for h in range(4)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        (r["k"], r["bucket_start"]): (r["x"], r["ewma"])
        for r in ewma_smooth(df, "k", "ts", "v", 3600, 0.5).collect()
    }
    for key in ("a", "b"):
        series = sorted(
            (int(t.timestamp()) // 3600 * 3600, v) for kk, t, v in rows if kk == key
        )
        e = None
        for b, x in series:
            e = x if e is None else 0.5 * e + 0.5 * x
            gx, ge = got[(key, b)]
            assert gx == x
            # closed form == recurrence mathematically; with α=0.5 both
            # are exact binary scalings, so equality is tight
            assert math.isclose(ge, e, rel_tol=1e-12), (key, b, ge, e)


def test_ewma_skips_empty_buckets(spark):
    from module8_movies_etl_spark.operators.timeseries import ewma_smooth

    # observations 3 hours apart: smoothing treats them as ADJACENT steps
    rows = [("a", _ts(0), 8.0), ("a", _ts(3), 4.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = sorted(
        (r["bucket_start"], r["ewma"])
        for r in ewma_smooth(df, "k", "ts", "v", 3600, 0.5).collect()
    )
    assert len(out) == 2
    assert out[1][1] == 0.5 * 8.0 + 0.5 * 4.0


# ----------------------------------------------------------- attribution


def test_multitouch_attribution_model(spark):
    from module8_movies_etl_spark.operators.timeseries import (
        multitouch_attribution,
    )

    rows = [
        # user 1: two clicks then purchase, another click then purchase
        (1, _ts(0), 10, "click"),
        (1, _ts(1), 11, "click"),
        (1, _ts(2), 12, "purchase"),
        (1, _ts(3), 13, "click"),
        (1, _ts(5), 14, "purchase"),
        # user 2: click with no purchase → no attribution
        (2, _ts(0), 20, "click"),
        # user 3: purchase with no clicks → appears nowhere
        (3, _ts(0), 30, "purchase"),
        # noise event types are ignored
        (1, _ts(1, 30), 99, "view"),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, id long, t string")
    out = multitouch_attribution(df, "u", "ts", "id", "t")
    got = {
        (r["conv_id"], r["touch_id"]): (
            r["n_touches"],
            r["credit_linear"],
            r["credit_decay"],
        )
        for r in out.collect()
    }
    assert set(got) == {(12, 10), (12, 11), (14, 13)}
    # conversion 12: touches at Δ2h and Δ1h → weights 2^-2, 2^-1
    n, lin, dec = got[(12, 10)]
    assert n == 2 and lin == 0.5
    assert math.isclose(dec, 0.25 / 0.75, rel_tol=1e-12)
    n, lin, dec = got[(12, 11)]
    assert math.isclose(dec, 0.5 / 0.75, rel_tol=1e-12)
    # single-touch conversion gets full credit under both models
    assert got[(14, 13)] == (1, 1.0, 1.0)
    # per-conversion credits sum to 1
    assert math.isclose(
        got[(12, 10)][2] + got[(12, 11)][2], 1.0, rel_tol=1e-12
    )


def test_multitouch_decay_cap(spark):
    from module8_movies_etl_spark.operators.timeseries import (
        multitouch_attribution,
    )

    # a touch 2000h before conversion: weight floors at 2^-40, never 0
    rows = [(1, _ts(0), 1, "click"), (1, _ts(2000), 2, "purchase")]
    df = spark.createDataFrame(rows, "u long, ts timestamp, id long, t string")
    r = multitouch_attribution(df, "u", "ts", "id", "t").collect()[0]
    assert r["credit_decay"] == 1.0  # sole touch — normalized to 1 even at cap


# ------------------------------------------------------------ compaction


def test_compaction_plan_matches_next_fit(spark):
    from module8_movies_etl_spark.operators.layout import compaction_plan

    sizes = [5, 9, 1, 14, 2, 2, 30, 1, 1, 1]
    rows = [("p", i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "part string, f long, sz long")
    target = 10
    got = {
        r["file"]: (r["bin"], r["bin_files"], r["bin_bytes"])
        for r in compaction_plan(df, "part", "f", "sz", target).collect()
    }
    # python model: bin = floor(cumsum_before / target)
    cum, expect = 0, {}
    for i, s in enumerate(sizes):
        expect[i] = cum // target
        cum += s
    assert {f: b for f, (b, _, _) in got.items()} == expect
    # per-bin aggregates are consistent
    for f, (b, nf, nb) in got.items():
        members = [i for i in expect if expect[i] == b]
        assert nf == len(members)
        assert nb == sum(sizes[i] for i in members)


# ------------------------------------------------------------ rolling kmv


def test_kmv_rolling_exact_when_k_large(spark):
    from module8_movies_etl_spark.operators.sketches import kmv_rolling_distinct

    # 30 users over 30 hours; k=64 > distinct count → every window
    # estimate is the EXACT trailing-24h distinct count
    rows = [
        (_ts(h), (h * 7) % 30) for h in range(30) for _ in range(2)
    ] + [(_ts(h), (h * 3) % 30) for h in range(30)]
    df = spark.createDataFrame(rows, "ts timestamp, uid long")
    got = {
        r["bucket_start"]: r["est_window"]
        for r in kmv_rolling_distinct(df, "ts", "uid", 3600, 24, 64).collect()
    }
    by_hour = {}
    for t, u in rows:
        b = int(t.timestamp()) // 3600 * 3600
        by_hour.setdefault(b, set()).add(u)
    for b in by_hour:
        exact = set().union(
            *[s for bb, s in by_hour.items() if b - 23 * 3600 <= bb <= b]
        )
        assert got[b] == float(len(exact)), b


def test_kmv_rolling_estimate_quality(spark):
    from module8_movies_etl_spark.operators.sketches import kmv_rolling_distinct

    # 2000 distinct users in one bucket, k=64 → estimate within ~4 std
    # errors (1/sqrt(62) ≈ 12.7%) of truth; deterministic, so pinned
    rows = [(_ts(0), u) for u in range(2000)]
    df = spark.createDataFrame(rows, "ts timestamp, uid long")
    est = kmv_rolling_distinct(df, "ts", "uid", 3600, 24, 64).collect()[0][
        "est_window"
    ]
    assert abs(est - 2000) / 2000 < 0.5, est


# -------------------------------------------------------------- bootstrap


def test_bootstrap_ci_model(spark):
    from module8_movies_etl_spark.operators.stats import bootstrap_mean_ci

    rows = [("g", i, 100.0 + (i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    r = bootstrap_mean_ci(df, "k", "v", "id", n_replicates=50).collect()[0]
    assert r["n_rows"] == 500
    mean = sum(100.0 + (i % 7) for i in range(500)) / 500
    assert math.isclose(r["mean_full"], round(mean, 4), abs_tol=1e-4)
    # deterministic CI brackets the sample mean for this symmetric data
    assert r["ci_lo"] <= r["mean_full"] <= r["ci_hi"]
    # interval width is plausible: sd/sqrt(n) ≈ 0.09 → ~4·se wide max
    assert 0.0 < r["ci_hi"] - r["ci_lo"] < 1.0


def test_bootstrap_weights_match_hex_thresholds(spark):
    """The engine's hex-literal compares implement the documented
    md5(id#chunk) → four 28-bit slices → U(0,1) → Poisson(1) inverse
    CDF (replicate b = 4·chunk + slot draws hex chars
    [7·slot, 7·slot+7))."""
    from module8_movies_etl_spark.operators.stats import _POISSON1_HEX

    cdf = (
        0.36787944117144233,
        0.7357588823428847,
        0.9196986029286058,
        0.9810118431238462,
    )
    for c, hx in zip(cdf, _POISSON1_HEX):
        assert int(c * (1 << 28)) == int(hx, 16)
    # spot-check classification parity on real md5 draws, all 4 slots
    for i in range(50):
        digest = hashlib.md5(f"{i}#0".encode()).hexdigest()
        for slot in range(4):
            h = digest[slot * 7:slot * 7 + 7]
            u = int(h, 16) / (1 << 28)
            w_hex = sum(1 for hx in _POISSON1_HEX if h >= hx)
            w_u = sum(1 for c in cdf if u >= c)
            assert w_hex == w_u, (i, slot, h)


# ---------------------------------------------------------- python ds api


def test_pyds_graftgen_partitions_and_rows(spark):
    from module8_movies_etl_spark.sources import pyds

    pyds.register(spark)
    df = (
        spark.read.format("graftgen")
        .option("rows", 100)
        .option("partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == 100
    # replay row 7 independently
    h = hashlib.md5(b"7").hexdigest()
    r = rows[7]
    assert r["shard"] == int(h[:2], 16) % 8
    assert r["payload"] == h[:16]
    assert math.isclose(r["score"], int(h[16:24], 16) / float(1 << 32))


# ------------------------------------------------------------ kmv set ops


def test_kmv_set_ops_exact_when_small(spark):
    from module8_movies_etl_spark.operators.sketches import kmv_set_ops

    # A = {0..29}, B = {20..49}: union 50, intersection 10 — all < k,
    # so every estimate degrades to EXACT
    rows = [("a", u) for u in range(30)] + [("b", u) for u in range(20, 50)]
    df = spark.createDataFrame(rows, "l string, v long")
    r = kmv_set_ops(df, "l", "v", "a", "b", k=64).collect()[0]
    assert r["n_a_sketch"] == 30 and r["n_b_sketch"] == 30
    assert r["est_a"] == 30.0 and r["est_b"] == 30.0
    assert r["est_union"] == 50.0
    assert r["est_intersection"] == 10.0
    assert r["est_jaccard"] == 0.2


def test_kmv_set_ops_estimates_at_scale(spark):
    from module8_movies_etl_spark.operators.sketches import kmv_set_ops

    # A = 0..999, B = 500..1499: true union 1500, intersection 500,
    # J = 1/3; k=64 → deterministic estimates within sketch error
    rows = [("a", u) for u in range(1000)] + [("b", u) for u in range(500, 1500)]
    df = spark.createDataFrame(rows, "l string, v long")
    r = kmv_set_ops(df, "l", "v", "a", "b", k=64).collect()[0]
    assert abs(r["est_union"] - 1500) / 1500 < 0.5
    assert 0.05 < r["est_jaccard"] < 0.7


# ----------------------------------------------------------------- bloom


def test_bloom_no_false_negatives_and_fp_bounded(spark):
    from module8_movies_etl_spark.operators.sketches import bloom_build_probe

    build = spark.createDataFrame([(i,) for i in range(100)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(1000)], "p long")
    r = bloom_build_probe(build, "k", probe, "p", 4096, 3).collect()[0]
    assert r["n_build"] == 100 and r["n_probe"] == 1000
    assert r["n_members"] == 100
    # Bloom guarantee: every member is flagged (no false negatives)
    assert r["n_flagged"] >= 100
    assert r["n_false_pos"] == r["n_flagged"] - 100
    # theoretical fp ≈ (1 - e^(-3*100/4096))^3 ≈ 0.00035 — allow 20x
    assert r["fp_rate"] < 0.01


# ------------------------------------------------------------ es sampling


def test_es_weighted_sample_deterministic_and_biased(spark):
    from module8_movies_etl_spark.operators.sampling import weighted_sample_es

    rows = [(i, "g", 5 if i < 100 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, g string, w int")
    out1 = weighted_sample_es(df, "id", "w", group_col="g", n=100)
    got1 = sorted(r["id"] for r in out1.collect())
    # repartition-stable: same sample regardless of physical layout
    out2 = weighted_sample_es(df.repartition(13), "id", "w", group_col="g", n=100)
    assert got1 == sorted(r["id"] for r in out2.collect())
    # weight bias: the 10% of ids with weight 5 should be >2x
    # over-represented vs uniform (expected ~34 of 100 under ES)
    heavy = sum(1 for i in got1 if i < 100)
    assert heavy > 20, heavy


# ------------------------------------------------------- interval coverage


def test_interval_union_coverage_model(spark):
    from module8_movies_etl_spark.operators.timeseries import (
        interval_union_coverage,
    )

    ivs = [(0, 10), (5, 15), (20, 30), (30, 35), (40, 41), (40, 41)]
    df = spark.createDataFrame(
        [("k", s, e) for s, e in ivs], "k string, s long, e long"
    )
    r = interval_union_coverage(df, "k", F.col("s"), F.col("e")).collect()[0]
    # islands: [0,15], [20,35] (touching merges: 30 > running max 30
    # is FALSE → same island), [40,41]
    assert r["n_intervals"] == 6
    assert r["n_islands"] == 3
    assert r["covered"] == 15 + 15 + 1
    assert r["span"] == 41
    assert r["coverage"] == round(31 / 41, 6)  # operator rounds to 6


# ------------------------------------------------------- streaming kmv


def test_merge_kmins_pure():
    from module8_movies_etl_spark.streaming.stateful import _merge_kmins

    assert _merge_kmins([], [0.5, 0.2], 4) == [0.2, 0.5]
    assert _merge_kmins([0.1, 0.3], [0.2, 0.3, 0.9], 4) == [0.1, 0.2, 0.3, 0.9]
    # k-truncation keeps the smallest
    assert _merge_kmins([0.1, 0.3], [0.05, 0.9], 3) == [0.05, 0.1, 0.3]


def test_stream_kmv_equals_batch_sketch(spark, sf_dir):
    """The streaming state-store path must reproduce the batch sketch
    row for row — the strongest streaming-correctness statement."""
    from module8_movies_etl_spark.operators.aggregates import (
        kmv_distinct_sketch,
    )
    from module8_movies_etl_spark.sources.readers import read_table
    from module8_movies_etl_spark.streaming.stateful import run_kmv_over_events

    got = sorted(
        tuple(r) for r in run_kmv_over_events(spark, sf_dir, k=64).collect()
    )
    e = read_table(spark, sf_dir, "events")
    want = sorted(
        tuple(r)
        for r in kmv_distinct_sketch(e, ["event_type"], "user_id", k=64)
        .collect()
    )
    assert got == want


# -------------------------------------------------- incremental dedup


def test_incremental_minhash_matches_model(spark):
    from module8_movies_etl_spark.operators.dedup import (
        incremental_minhash_matches,
        minhash_lsh_pairs,
    )

    docs = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),     # dup of 1
        (3, "totally different words here"),
        (10, "alpha beta gamma delta"),    # new: dup of 1 and 2
        (11, "nothing like the corpus x"),  # new: no match
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = df.filter(F.col("doc_id") < 10)
    new = df.filter(F.col("doc_id") >= 10)
    got = {
        r["doc_id"]: (r["n_index_matches"], r["first_match_id"])
        for r in incremental_minhash_matches(idx, new, "doc_id", "text").collect()
    }
    assert got == {10: (2, 1)}
    # consistency with the self-join variant: pairs (10, 1) and (10, 2)
    all_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, "doc_id", "text").collect()
    }
    assert (1, 10) in all_pairs and (2, 10) in all_pairs


# ------------------------------------------------- negatives / mixture


def test_negative_samples_properties(spark):
    from module8_movies_etl_spark.operators.curation import negative_samples

    rows = [(i, "g" if i < 20 else "h") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = negative_samples(df, "id", "grp", k=4).collect()
    by_anchor = {}
    grp = dict(rows)
    for r in out:
        by_anchor.setdefault(r["id"], []).append(r["neg_id"])
        # negative is never the anchor and stays in-group
        assert r["neg_id"] != r["id"]
        assert grp[r["neg_id"]] == grp[r["id"]]
    # every doc got k distinct negatives (groups are big enough)
    for anchor, negs in by_anchor.items():
        assert len(negs) == 4 and len(set(negs)) == 4, (anchor, negs)
    assert len(by_anchor) == 30
    # deterministic under repartitioning
    out2 = negative_samples(df.repartition(7), "id", "grp", k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_mixture_rebalance_equalizes_tokens(spark):
    from module8_movies_etl_spark.operators.curation import mixture_rebalance

    # group a: 10x the tokens of group b → a is downsampled ~10x
    rows = [(i, "a", 100) for i in range(1000)] + [
        (i, "b", 10) for i in range(1000, 2000)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, t long")
    out = mixture_rebalance(df, "id", "grp", F.col("t"), budget_frac=0.5)
    kept = out.groupBy("grp").sum("n_tokens").collect()
    toks = {r["grp"]: r["sum(n_tokens)"] for r in kept}
    # target per group = 0.5 * 110000 / 2 = 27500
    assert abs(toks["a"] - 27500) / 27500 < 0.2, toks
    # group b can't reach the target (only 10k tokens) → keep all
    assert toks["b"] == 10000
    rates = {r["grp"]: r["rate"] for r in out.select("grp", "rate").distinct().collect()}
    assert rates["b"] == 1.0 and 0.2 < rates["a"] < 0.35


# ---------------------------------------------------- histogram sketch


def test_histsketch_close_to_exact(spark):
    from module8_movies_etl_spark.operators.sketches import (
        histogram_sketch_quantiles,
    )

    vals = [float(i) for i in range(1, 1001)]  # uniform 1..1000
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v double")
    r = histogram_sketch_quantiles(df, "k", "v", n_bins=64).collect()[0]
    assert r["n"] == 1000
    # bin width ≈ 15.6 → estimates within ~2 bins of truth (the rank
    # interpolation can straddle a bin boundary)
    assert abs(r["est_q50"] - 500.5) < 32
    assert abs(r["est_q95"] - 950.05) < 32
    assert abs(r["est_q99"] - 990.01) < 32


def test_histsketch_degenerate_single_value(spark):
    from module8_movies_etl_spark.operators.sketches import (
        histogram_sketch_quantiles,
    )

    df = spark.createDataFrame([("g", 7.0)] * 5, "k string, v double")
    r = histogram_sketch_quantiles(df, "k", "v", n_bins=64).collect()[0]
    assert r["est_q50"] == 7.0 and r["est_q99"] == 7.0


# ----------------------------------------------------------- skyline


def test_skyline_matches_brute_force(spark):
    from module8_movies_etl_spark.operators.robust import skyline_2d

    pts = [
        (1, 5, 10), (2, 3, 20), (3, 3, 15), (4, 8, 5), (5, 8, 5),
        (6, 1, 30), (7, 9, 4), (8, 2, 25), (9, 3, 15),
    ]
    df = spark.createDataFrame(
        [("k", i, x, y) for i, x, y in pts], "k string, id long, x long, y long"
    )
    got = sorted(r["id"] for r in skyline_2d(df, "k", F.col("x"), F.col("y"), "id").collect())

    def dominated(a, b):  # b dominates a
        return b[1] <= a[1] and b[2] <= a[2] and (b[1] < a[1] or b[2] < a[2])

    want = sorted(
        i for (i, x, y) in pts
        if not any(dominated((i, x, y), p) for p in pts if p[0] != i)
    )
    assert got == want, (got, want)
    # duplicates on the frontier tie and both survive
    assert 4 in got and 5 in got


# ----------------------------------------------------------- alignment


def test_bipartite_align_model(spark):
    from module8_movies_etl_spark.operators.similarity import bipartite_align

    left = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    right = spark.createDataFrame(
        [(10, [2.0, 0.1]), (11, [0.1, 3.0]), (12, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["match_id"], r["cosine_sim"], r["margin"])
        for r in bipartite_align(left, right).collect()
    }
    # vector (1,0) aligns to (2,0.1); (0,1) aligns to (0.1,3)
    assert got[1][0] == 10 and got[2][0] == 11
    for vid in (1, 2):
        m, sim, margin = got[vid]
        assert 0.9 < sim <= 1.0
        assert margin is not None and margin > 0
    # margin = top1 - top2, spot-check vec 1: runner-up is (1,1)
    import math as _m

    sim1 = 2.0 / _m.sqrt(1) / _m.sqrt(4.01)
    sim2 = 1.0 / _m.sqrt(1) / _m.sqrt(2)
    assert abs(got[1][2] - round(sim1 - sim2, 6)) < 1e-6


# --------------------------------------------------------------- snm


def test_sorted_neighborhood_model(spark):
    from module8_movies_etl_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    names = [
        (1, "acme corp"),
        (2, "acme corp."),      # dist 1 from 1, adjacent in sort
        (3, "acme corpse"),     # dist 2 from 1
        (4, "zzz unrelated"),
        (5, "beta llc"),
    ]
    df = spark.createDataFrame(names, "id long, nm string")
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in sorted_neighborhood_pairs(
            df, "id", F.col("nm"), F.substring(F.col("nm"), 1, 1), 5, 2
        ).collect()
    }
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 2 or got[(2, 3)] == 1
    assert not any(4 in p for p in got)  # different block, never compared
    # window semantics: only successor pairs, so (a, b) with a after b
    # in sort order never appears twice
    assert all((b, a) not in got for (a, b) in got)


# ---------------------------------------------------------- trending


def test_trending_topk_decay_model(spark):
    from module8_movies_etl_spark.operators.timeseries import trending_topk

    rows = (
        [(_ts(0), "a")] * 10        # a: burst at h0
        + [(_ts(1), "b")] * 6       # b: burst at h1
        + [(_ts(1), "a")] * 1       # a: trickle at h1
    )
    df = spark.createDataFrame(rows, "ts timestamp, item string")
    got = {
        (r["bucket_start"], r["rnk"]): (r["item"], r["score"])
        for r in trending_topk(df, "ts", F.col("item"), 3600, 2).collect()
    }
    h0 = int(_ts(0).timestamp()) // 3600 * 3600
    h1 = h0 + 3600
    assert got[(h0, 1)] == ("a", 10.0)
    # at h1: a = 10·0.5 + 1 = 6.0 vs b = 6.0 → tie broken by item asc
    assert got[(h1, 1)][0] == "a" and got[(h1, 1)][1] == 6.0
    assert got[(h1, 2)] == ("b", 6.0)


# ---------------------------------------------- feature assembly / fk


def test_feature_assembly_is_leakage_safe(spark, sf_dir):
    from module8_movies_etl_spark.plans.benchmark_queries import QUERIES

    rows = QUERIES["feature_assembly_purchases"](spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        # the label's own purchase is never in its features: a user's
        # first-ever event being a purchase must show all-zero priors
        total_prior = (
            r["prior_clicks"] + r["prior_views"] + r["prior_errors"]
            + r["prior_purchases"]
        )
        assert total_prior >= 0
        if r["secs_since_click"] is not None:
            assert r["secs_since_click"] >= 0
        assert r["label_value"] is not None


def test_seasonal_anomaly_cells(spark):
    from module8_movies_etl_spark.operators.stats import (
        seasonal_robust_anomalies,
    )

    # hour 0: tight values + one wild outlier; hour 1: all identical
    rows = [(_ts(0, m), "t", 10.0 + (m % 3) * 0.1) for m in range(20)]
    rows.append((_ts(0, 30), "t", 999.0))
    rows += [(_ts(1, m), "t", 5.0) for m in range(10)]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    got = {
        r["hod"]: (r["n"], r["n_anomalies"])
        for r in seasonal_robust_anomalies(df, "k", "ts", "v", 3.0).collect()
    }
    h0 = (int(_ts(0).timestamp()) // 3600) % 24
    h1 = (h0 + 1) % 24
    assert got[h0] == (21, 1)   # the 999 outlier, and only it
    assert got[h1] == (10, 0)   # identical values: MAD 0, |v-med| 0


# ----------------------------------------------------------- hygiene


def test_encoding_hygiene_probes_fire(spark):
    """The synthetic corpus is clean (catalog entry shows zeros), so
    pin each probe against deliberately dirty text here."""
    from module8_movies_etl_spark.plans.benchmark_queries import QUERIES  # noqa: F401
    from module8_movies_etl_spark.sources import read_table  # noqa: F401

    rows = [
        (1, "x", "clean ascii"),
        (2, "x", "non breaking"),          # NBSP
        (3, "x", "ctl\x07char"),                 # BEL control
        (4, "x", "moji�bake"),              # replacement char
        (5, "x", "café latte"),             # multibyte é
        (6, "x", "  leading space"),             # untrimmed
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    from pyspark.sql import functions as FF

    t = FF.col("text")
    got = df.select(
        FF.sum(t.rlike(" ").cast("long")).alias("nbsp"),
        FF.sum(t.rlike("[\\x00-\\x08\\x0e-\\x1f]").cast("long")).alias("ctl"),
        FF.sum(t.rlike("�").cast("long")).alias("repl"),
        FF.sum((FF.octet_length(t) != FF.length(t)).cast("long")).alias("mb"),
        FF.sum((t != FF.trim(t)).cast("long")).alias("untrim"),
    ).collect()[0]
    assert (got["nbsp"], got["ctl"], got["repl"], got["untrim"]) == (1, 1, 1, 1)
    assert got["mb"] == 3  # NBSP, U+FFFD and é are all multi-byte


# --------------------------------------------------------------- cep


def test_cep_negation_semantics(spark):
    from module8_movies_etl_spark.plans import benchmark_queries as bq  # noqa: F401

    # replicate the pattern logic on a hand case via the same windows
    from pyspark.sql import Window as W

    rows = [
        (1, "view", 0, 100),
        (1, "purchase", 10, 101),       # matches: view 10min before, no error
        (2, "view", 0, 200),
        (2, "error", 5, 201),
        (2, "purchase", 10, 202),       # blocked: error between
        (3, "error", 0, 300),
        (3, "view", 5, 301),
        (3, "purchase", 10, 302),       # matches: error BEFORE the view
        (4, "view", 0, 400),
        (4, "purchase", 120, 401),      # too late: > 60 min
    ]
    df = spark.createDataFrame(
        [(u, t, int(_ts(0, m).timestamp()) * 1_000_000, i) for u, t, m, i in rows],
        "user_id long, event_type string, ts_us long, event_id long",
    )
    wprior = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    m = df.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.max(F.when(F.col("event_type") == "view", F.col("ts_us")))
        .over(wprior)
        .alias("lv"),
        F.max(F.when(F.col("event_type") == "error", F.col("ts_us")))
        .over(wprior)
        .alias("le"),
    )
    got = sorted(
        r["event_id"]
        for r in m.filter(F.col("event_type") == "purchase")
        .filter(F.col("lv").isNotNull())
        .filter(F.col("ts_us") - F.col("lv") <= 3600 * 1_000_000)
        .filter(F.col("le").isNull() | (F.col("le") < F.col("lv")))
        .collect()
    )
    assert got == [101, 302]


def test_minhash_lsh_pairs_max_bucket_drops_hot_buckets(spark):
    """The optional hot-bucket cap (round 9): a degenerate band shared
    by the whole corpus is evidence-free; capping it removes the
    quadratic pair family while rare-bucket matches survive."""
    from module8_movies_etl_spark.operators.dedup import minhash_lsh_pairs

    # 8 docs that all share every band (identical text) + one genuine
    # rare pair in different text
    docs = [(i, "common words shared by every doc") for i in range(1, 9)]
    docs += [(20, "rare unique text family"), (21, "rare unique text family")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, "doc_id", "text").collect()
    }
    assert (20, 21) in uncapped and len(uncapped) == 28 + 1  # C(8,2) + 1
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", max_bucket=4
        ).collect()
    }
    assert capped == {(20, 21)}  # the 8-wide clique's buckets dropped
