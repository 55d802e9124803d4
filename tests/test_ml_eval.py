"""Model-free goldens for the round-6 ML-evaluation and
series-completion operators: every expected value below is computed
by an in-test brute-force reference (or by hand), never by the code
under test."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import stats, timeseries


def _mk_scores(spark, pos, neg):
    rows = [("p", v) for v in pos] + [("n", v) for v in neg]
    return spark.createDataFrame(rows, "g string, v double")


def test_roc_auc_matches_pairwise_bruteforce(spark):
    pos = [3.0, 5.0, 5.0, 9.0, 2.0]
    neg = [1.0, 5.0, 4.0, 2.0, 8.0, 3.0]
    df = _mk_scores(spark, pos, neg)
    [r] = stats.roc_auc(df, "g", "v", "p", "n").collect()
    wins = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    assert (r["n_pos"], r["n_neg"]) == (5, 6)
    assert r["auc"] == round(wins / (len(pos) * len(neg)), 6)


def test_roc_auc_perfect_and_inverted(spark):
    df = _mk_scores(spark, [10.0, 11.0], [1.0, 2.0])
    assert stats.roc_auc(df, "g", "v", "p", "n").collect()[0]["auc"] == 1.0
    assert stats.roc_auc(df, "g", "v", "n", "p").collect()[0]["auc"] == 0.0


def test_calibration_bins_hand_golden(spark):
    # scores 0.00..0.99 in cents = 0..99; min=0, max=99 -> bin
    # = floor(v*10/99) capped at 9; make bin b have positive rate b/10
    rows = []
    for b in range(10):
        lo_cent = math.ceil(b * 99 / 10)
        v = (lo_cent + 1) / 100.0  # safely inside bin b
        for i in range(10):
            rows.append(("p" if i < b else "n", v))
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["bin"]: r
        for r in stats.calibration_bins(df, "g", "v", "p", "n").collect()
    }
    assert set(out) == set(range(10))
    for b, r in out.items():
        assert r["n"] == 10
        assert r["pos_rate"] == round(b / 10, 6)
    # ECE identical on every row and equals the n-weighted mean gap
    eces = {r["ece"] for r in out.values()}
    assert len(eces) == 1
    mean_gap = sum(r["gap"] * r["n"] for r in out.values()) / 100
    assert abs(eces.pop() - mean_gap) < 2e-6


def test_gains_deciles_whole_group_ties(spark):
    # 100 rows, 10 distinct scores x 10 rows; positives concentrated
    # at high scores -> capture by construction
    rows = []
    for d in range(10):  # score 10-d, decile d+1
        v = float(10 - d)
        for i in range(10):
            rows.append(("p" if (d == 0 and i < 8) or (d == 1 and i < 2)
                         else "n", v))
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["bucket"]: r
        for r in stats.gains_deciles(df, "g", "v", "p", "n").collect()
    }
    assert out[1]["n_pos"] == 8 and out[1]["capture_rate"] == 0.8
    assert out[2]["n_pos"] == 2 and out[2]["capture_rate"] == 1.0
    assert out[10]["capture_rate"] == 1.0
    # lift of the top decile: 0.8 captured with 0.1 of population
    assert out[1]["lift"] == 8.0


def test_theil_sen_matches_bruteforce_median(spark):
    pts = [(0, 10), (1, 12), (2, 11), (3, 19), (5, 16), (8, 30)]
    df = spark.createDataFrame(
        [("k", d, v) for d, v in pts], "g string, d int, v long"
    )
    [r] = timeseries.theil_sen_slope(df, "g", "d", "v").collect()
    slopes = sorted(
        (v2 - v1) / (d2 - d1)
        for i, (d1, v1) in enumerate(pts)
        for d2, v2 in pts[i + 1:]
    )
    n = len(slopes)
    med = (
        slopes[n // 2]
        if n % 2
        else (slopes[n // 2 - 1] + slopes[n // 2]) / 2
    )
    assert r["n_days"] == 6 and r["n_pairs"] == 15
    assert r["slope_per_day"] == round(med, 6)


def test_theil_sen_guard_and_single_point(spark):
    df = spark.createDataFrame(
        [("a", d, d * 2) for d in range(30)] + [("solo", 1, 5)],
        "g string, d int, v long",
    )
    with pytest.raises(ValueError, match="max_points"):
        timeseries.theil_sen_slope(df, "g", "d", "v", max_points=10)
    out = {
        r["g"]: r for r in timeseries.theil_sen_slope(df, "g", "d", "v")
        .collect()
    }
    assert out["a"]["slope_per_day"] == 2.0
    # single-point series is reported, not dropped
    assert out["solo"]["n_pairs"] == 0
    assert out["solo"]["slope_per_day"] is None


def test_linear_gap_fill_hand_golden(spark):
    # one key, buckets at t=0 (v=1.00) and t=3000 (v=4.00); 600s
    # buckets -> spine 0,600,...,3000; interior linearly interpolated
    rows = [
        ("k", "1970-01-01 00:00:00", 1.0),
        ("k", "1970-01-01 00:50:00", 4.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        r["bucket_s"]: r
        for r in timeseries.linear_gap_fill(df, "g", "ts", "v").collect()
    }
    assert sorted(out) == [0, 600, 1200, 1800, 2400, 3000]
    assert out[0]["value_filled"] == 1.0 and out[0]["is_observed"]
    assert out[3000]["value_filled"] == 4.0
    for i, b in enumerate([600, 1200, 1800, 2400], start=1):
        assert not out[b]["is_observed"]
        assert out[b]["n_events"] == 0
        assert out[b]["value_filled"] == round(1.0 + 3.0 * b / 3000, 6)


def test_linear_gap_fill_edge_extension(spark):
    # leading/trailing gaps inside one key's span don't exist (spine
    # starts/ends at observed buckets), so edges only matter with a
    # single observation: flat fill
    df = spark.createDataFrame(
        [("k", "1970-01-01 00:00:00", 2.5)], "g string, ts string, v double"
    ).select("g", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = timeseries.linear_gap_fill(df, "g", "ts", "v").collect()
    assert len(out) == 1 and out[0]["value_filled"] == 2.5


def test_calibration_bins_degenerate_range_raises(spark):
    df = _mk_scores(spark, [1.0, 1.0], [1.0])
    with pytest.raises(ValueError, match="cannot be calibrated"):
        stats.calibration_bins(df, "g", "v", "p", "n")


def test_average_precision_matches_sklearn_formula(spark):
    # AP = sum over descending distinct thresholds of dR * P, ties
    # grouped — brute-force reference computed in-test.
    pos = [9.0, 7.0, 7.0, 3.0, 1.0]
    neg = [8.0, 7.0, 4.0, 2.0, 2.0, 1.0]
    df = _mk_scores(spark, pos, neg)
    [r] = stats.average_precision(df, "g", "v", "p", "n").collect()
    thresholds = sorted({*pos, *neg}, reverse=True)
    P = len(pos)
    ap, prev_r = 0.0, 0.0
    for t in thresholds:
        tp = sum(1 for p in pos if p >= t)
        fp = sum(1 for n in neg if n >= t)
        rec = tp / P
        ap += (rec - prev_r) * (tp / (tp + fp))
        prev_r = rec
    assert (r["n_pos"], r["n_neg"]) == (5, 6)
    assert abs(r["ap"] - ap) < 2e-6


def test_average_precision_perfect_ranking_is_one(spark):
    df = _mk_scores(spark, [10.0, 9.0], [1.0, 2.0, 3.0])
    assert stats.average_precision(df, "g", "v", "p", "n").collect()[0][
        "ap"
    ] == 1.0


def test_isotonic_matches_pav_bruteforce(spark):
    # weighted PAV reference implemented independently in-test
    data = [  # (score_cents, n_pos, n_neg)
        (1, 3, 1), (2, 0, 2), (3, 1, 1), (5, 4, 0), (8, 1, 3), (9, 2, 0),
    ]
    rows = []
    for v, np_, nn in data:
        rows += [("p", v / 100.0)] * np_ + [("n", v / 100.0)] * nn
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["score_fp"]: r["iso_p"]
        for r in stats.isotonic_calibration(
            df, "g", "v", "p", "n"
        ).collect()
    }
    # PAV: pool adjacent violators over ascending scores
    blocks = [[v, np_, np_ + nn] for v, np_, nn in data]  # [vs, pos, tot]
    i = 0
    merged = []
    for b in blocks:
        merged.append(b[:])
        while len(merged) > 1 and (
            merged[-2][1] * merged[-1][2] >= merged[-1][1] * merged[-2][2]
        ):
            last = merged.pop()
            merged[-1][1] += last[1]
            merged[-1][2] += last[2]
    # assign each input score its block's pooled rate
    fit = {}
    di = 0
    for blk in merged:
        remaining = blk[2]
        while remaining > 0:
            v, np_, nn = data[di]
            fit[v] = blk[1] / blk[2]
            remaining -= np_ + nn
            di += 1
    assert set(out) == set(fit)
    for v in fit:
        assert abs(out[v] - fit[v]) < 2e-6, (v, out[v], fit[v])
    vals = [out[v] for v in sorted(out)]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))


def test_conformal_interval_exact_quantile_and_coverage(spark):
    # One group, ids chosen so the md5 split is known; verify against
    # an in-test replay of the integer order-statistic definition.
    import hashlib

    rows = [(i, float(i % 17) + 0.25) for i in range(200)]
    df = spark.createDataFrame(rows, "event_id long, v double").withColumn(
        "g", F.lit("only")
    )
    [r] = stats.conformal_interval(df, "g", "v", "event_id").collect()

    def is_cal(i):
        h = int(hashlib.md5(f"conf:{i}".encode()).hexdigest()[:15], 16)
        return h % 2 == 0

    cal = [(round(v * 100)) for i, v in rows if is_cal(i)]
    test = [(round(v * 100)) for i, v in rows if not is_cal(i)]
    n, S = len(cal), sum(cal)
    scores = sorted(abs(v * n - S) for v in cal)
    k = ((n + 1) * 90 + 99) // 100
    q = scores[k - 1] if k <= n else None
    covered = sum(
        1 for v in test if q is None or abs(v * n - S) <= q
    )
    assert (r["n_cal"], r["n_test"]) == (n, len(test))
    assert r["q_halfwidth"] == round(q / (100.0 * n), 6)
    assert r["coverage"] == round(covered / len(test), 6)


def test_average_precision_zero_positives_is_defined(spark):
    # no positive rows: AP must be a well-defined 0.0 single row, not
    # an empty frame or an ANSI NaN-cast throw
    df = _mk_scores(spark, [], [1.0, 2.0])
    [r] = stats.average_precision(df, "g", "v", "p", "n").collect()
    assert (r["n_pos"], r["n_neg"], r["ap"]) == (0, 2, 0.0)


def test_average_precision_empty_input_single_row(spark):
    df = spark.createDataFrame([], "g string, v double")
    [r] = stats.average_precision(df, "g", "v", "p", "n").collect()
    assert (r["n_pos"], r["n_neg"], r["ap"]) == (0, 0, 0.0)


def test_jackknife_agrees_with_delta_and_python_reference(spark, sf_dir):
    # Independent plain-Python replay of BOTH standard errors from the
    # same per-user rollup — closes the shared-formula failure mode
    # (a /B² slip once shrank the jackknife SE by sqrt(B); engine and
    # oracle agreed on the wrong number until this check).
    import hashlib
    import math

    from module8_movies_etl_spark.plans.benchmark_queries import QUERIES

    [r] = QUERIES["jackknife_ratio_variance"](spark, sf_dir).collect()
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count_distinct(F.to_date("ts")).alias("x"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y"),
        )
        .collect()
    )
    X = sum(row["x"] for row in rows)
    Y = sum(row["y"] for row in rows)
    B = 50
    bx, by = [0] * B, [0] * B
    for row in rows:
        b = (
            int(
                hashlib.md5(f"jk:{row['user_id']}".encode()).hexdigest()[:15],
                16,
            )
            % B
        )
        bx[b] += row["x"]
        by[b] += row["y"]
    present = [b for b in range(B) if bx[b] or by[b]]
    ests = [
        math.floor((Y - by[b]) / (X - bx[b]) * 1e6) / 1e6 for b in present
    ]
    beff = len(present)
    m = sum(ests) / beff
    se_ref = math.sqrt(
        (beff - 1) / beff * sum((e - m) ** 2 for e in ests)
    )
    assert r["n_buckets"] == beff
    assert abs(r["se_jackknife"] - se_ref) < max(1e-4, 1e-4 * se_ref)
    # the two independent derivations must agree to resampling noise
    assert 0.5 < r["se_jackknife"] / r["se_delta"] < 2.0


def test_capstone_reproduces_standalone_did(spark, sf_dir):
    # The capstone folds sum(d^2) algebraically (syy - 2*sxy + sxx)
    # instead of aggregating d = y - x directly; both derivations
    # must agree exactly through round(6).
    from module8_movies_etl_spark.plans.benchmark_queries import QUERIES

    [cap] = QUERIES["experiment_readout_capstone"](spark, sf_dir).collect()
    [did] = QUERIES["diff_in_diff_spend"](spark, sf_dir).collect()
    assert cap["did_cents"] == did["did_cents"]
    assert cap["did_se"] == did["se_cents"]
    assert (cap["n_treat"], cap["n_ctrl"]) == (
        did["n_treat"],
        did["n_ctrl"],
    )


def test_ols_cramer_matches_numpy_lstsq(spark, sf_dir):
    # The Cramer/normal-equations fit must agree with an independent
    # numpy least-squares solve on the same (x1, x2, y) rows.
    import numpy as np

    from module8_movies_etl_spark.plans.benchmark_queries import QUERIES

    [r] = QUERIES["ols_value_by_time"](spark, sf_dir).collect()
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("value").isNotNull())
        .select(
            ((F.unix_timestamp("ts") / 3600).cast("long") % 24).alias("x1"),
            (((F.unix_timestamp("ts") / 86400).cast("long") + 4) % 7).alias(
                "x2"
            ),
            F.round(F.col("value") * 100, 0).cast("long").alias("y"),
        )
        .collect()
    )
    X = np.array([[1.0, row["x1"], row["x2"]] for row in rows])
    y = np.array([float(row["y"]) for row in rows])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert r["n"] == len(rows)
    assert abs(r["beta0"] - beta[0]) < 1e-4
    assert abs(r["beta_hod"] - beta[1]) < 1e-4
    assert abs(r["beta_dow"] - beta[2]) < 1e-4


def test_hte_did_by_segment_matches_python_reference(spark, sf_dir):
    # Independent plain-Python replay of the per-segment DiD estimate
    # and its Welch standard error from the same user-grain rollup —
    # the jackknife episode proved engine+oracle hash parity can agree
    # on a wrong shared formula, so every statistical query gets a
    # from-scratch reference. The rollup itself is pinned elsewhere
    # (capstone vs standalone DiD); here the STATISTICS are re-derived
    # with textbook sample-variance arithmetic on exact ints.
    import math

    from module8_movies_etl_spark.plans.benchmark_queries import (
        QUERIES,
        _user_prepost_spend,
    )

    got = {
        r["segment"]: r
        for r in QUERIES["hte_did_by_segment"](spark, sf_dir).collect()
    }
    users = _user_prepost_spend(spark, sf_dir).collect()
    seg_of = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
        .collect()
    }
    by_seg: dict = {}
    for r in users:
        seg = seg_of.get(r["user_id"])
        if seg is None:
            continue
        arm = r["user_id"] % 2
        by_seg.setdefault(seg, {0: [], 1: []})[arm].append(r["y"] - r["x"])
    assert set(got) == set(by_seg)
    for seg, arms in by_seg.items():
        d1, d0 = arms[1], arms[0]
        n1, n0 = len(d1), len(d0)
        did = (sum(d1) / n1 - sum(d0) / n0) if n1 and n0 else 0.0
        if n1 > 1 and n0 > 1:
            m1, m0 = sum(d1) / n1, sum(d0) / n0
            v1 = sum((d - m1) ** 2 for d in d1) / (n1 - 1)
            v0 = sum((d - m0) ** 2 for d in d0) / (n0 - 1)
            se = math.sqrt(v1 / n1 + v0 / n0)
        else:
            se = 0.0
        row = got[seg]
        assert (row["n_treat"], row["n_ctrl"]) == (n1, n0)
        assert abs(row["did_cents"] - did) < max(1e-6, 1e-9 * abs(did))
        assert abs(row["se_cents"] - se) < max(1e-6, 1e-9 * se)


def test_qini_uplift_matches_python_reference(spark, sf_dir):
    # Independent plain-Python replay of the whole Qini/uplift curve:
    # own md5 split (hashlib), own NTILE tie arithmetic (SQL-standard
    # first-(N mod n)-buckets-get-ceil over the x desc, user_id asc
    # total order), own cumulative sums — nothing shared with the
    # Spark code or the DuckDB oracle beyond the definition.
    import hashlib

    from module8_movies_etl_spark.plans.benchmark_queries import (
        QUERIES,
        _user_prepost_spend,
    )

    got = {
        r["decile"]: r
        for r in QUERIES["qini_uplift_deciles"](spark, sf_dir).collect()
    }
    users = sorted(
        _user_prepost_spend(spark, sf_dir).collect(),
        key=lambda r: (-r["x"], r["user_id"]),
    )
    N, n = len(users), 10
    q, rem = divmod(N, n)
    cells = {b: [0, 0, 0, 0] for b in range(1, n + 1)}  # nt nc syt syc
    for i, r in enumerate(users):
        b = (i // (q + 1) + 1) if (rem and i < rem * (q + 1)) else (
            rem + (i - rem * (q + 1)) // max(q, 1) + 1
        )
        treat = (
            int(
                hashlib.md5(f"psm:{r['user_id']}".encode()).hexdigest()[:15],
                16,
            )
            % 2
        )
        c = cells[b]
        if treat:
            c[0] += 1
            c[2] += r["y"]
        else:
            c[1] += 1
            c[3] += r["y"]
    cnt = cnc = csyt = csyc = 0
    assert sorted(got) == list(range(1, n + 1))
    for b in range(1, n + 1):
        nt, nc, syt, syc = cells[b]
        cnt, cnc, csyt, csyc = cnt + nt, cnc + nc, csyt + syt, csyc + syc
        uplift = (csyt / cnt - csyc / cnc) if cnt and cnc else 0.0
        qini = (csyt - csyc * cnt / cnc) / 100.0 if cnc else 0.0
        row = got[b]
        assert (row["n_treat_cum"], row["n_ctrl_cum"]) == (cnt, cnc)
        assert abs(row["uplift_cents"] - uplift) < max(
            1e-6, 1e-9 * abs(uplift)
        )
        assert abs(row["qini_units"] - qini) < max(1e-6, 1e-9 * abs(qini))
