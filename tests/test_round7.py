"""Round-7 family: statistical modeling (OLS trend, MAD outliers,
chi-square), time-series gap fill, and corpus scoring (perplexity,
PMI) — each pinned against an independent pure-Python model.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import stats, text, timeseries


# ---------------------------------------------------------------- group_trend


def test_group_trend_matches_closed_form(spark):
    # y = 2x + 5 exactly -> slope 2*scale, intercept 5, r2 = 1
    rows = [("a", x, float(2 * x + 5)) for x in range(10)]
    # plus a noisy group with known least-squares answer
    rows += [("b", 0, 1.0), ("b", 1, 2.0), ("b", 2, 2.0), ("b", 3, 4.0)]
    df = spark.createDataFrame(rows, "k string, x long, y double")
    got = {
        r.k: r.asDict()
        for r in stats.group_trend(df, "k", "x", "y", x_scale=1.0).collect()
    }
    assert got["a"]["slope"] == 2.0
    assert got["a"]["intercept"] == 5.0
    assert got["a"]["r2"] == 1.0
    # closed-form OLS for group b: slope = cov/var
    xs, ys = [0, 1, 2, 3], [1.0, 2.0, 2.0, 4.0]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    var = sum((x - mx) ** 2 for x in xs)
    slope = cov / var
    assert got["b"]["slope"] == round(slope, 6)
    assert got["b"]["intercept"] == round(my - slope * mx, 4)
    assert got["b"]["n"] == 4


# ---------------------------------------------------------- mad_outlier_counts


def test_mad_outliers_match_model(spark):
    vals = [10.0, 11.0, 12.0, 11.5, 10.5, 11.2, 100.0, -50.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "k string, v double"
    )
    [r] = stats.mad_outlier_counts(df, "k", "v", k=3.0).collect()

    def median(xs):
        s = sorted(xs)
        n = len(s)
        mid = n // 2
        return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2

    med = round(median(vals), 4)
    mad = round(median([abs(v - med) for v in vals]), 4)
    n_out = sum(1 for v in vals if abs(v - med) > 3.0 * mad)
    assert (r.med, r.mad, r.n_outliers, r.n) == (med, mad, n_out, len(vals))


# ---------------------------------------------------------- chi2_independence


def test_chi2_matches_model(spark):
    rows = (
        [("x", "p")] * 30 + [("x", "q")] * 10
        + [("y", "p")] * 15 + [("y", "q")] * 25
    )
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = stats.chi2_independence(df, "a", "b").collect()
    # brute-force expected counts
    from collections import Counter

    cells = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    chi2 = sum(
        (cells[(a, b)] - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
        for a in ra
        for b in cb
    )
    assert r.chi2 == round(chi2, 4)
    assert r.dof == (len(ra) - 1) * (len(cb) - 1)
    assert r.n == n


# ------------------------------------------------------------------- gap_fill


def test_gap_fill_dense_spine_and_locf(spark):
    rows = [
        ("a", "2024-01-01 00:10:00", 10.0),
        ("a", "2024-01-01 00:50:00", 20.0),
        # hours 01 and 02 silent
        ("a", "2024-01-01 03:05:00", 5.0),
        ("b", "2024-01-01 02:00:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        (r.k, r.bucket_s): (r.n_events, r.value_ff)
        for r in timeseries.gap_fill(df, "k", "ts", "v", 3600).collect()
    }
    h0 = 1704067200  # 2024-01-01 00:00 UTC
    assert out[("a", h0)] == (2, 30.0)
    assert out[("a", h0 + 3600)] == (0, 30.0)  # silent hour: zero + LOCF
    assert out[("a", h0 + 7200)] == (0, 30.0)
    assert out[("a", h0 + 10800)] == (1, 5.0)
    assert out[("b", h0 + 7200)] == (1, 7.0)
    assert len(out) == 5  # a: 4 buckets, b: 1 — no spine beyond [min, max]


# ------------------------------------------------------------------ perplexity


def test_unigram_perplexity_matches_model(spark):
    docs = [(0, "a a b", "x"), (1, "a b", "x"), (2, "", "x"), (3, "c", "y")]
    df = spark.createDataFrame(docs, "doc_id int, text string, lang string")
    got = {
        r.doc_id: r.asDict()
        for r in text.unigram_perplexity(df, "doc_id", "text", "lang").collect()
    }
    # lang x: counts a=3, b=2, total 5
    lp = {"a": math.log(3 / 5), "b": math.log(2 / 5)}
    x0 = -(lp["a"] + lp["a"] + lp["b"]) / 3
    x1 = -(lp["a"] + lp["b"]) / 2
    assert got[0]["xent_nats"] == round(x0, 4)
    assert got[0]["ppl"] == round(math.exp(x0), 4)
    assert got[1]["xent_nats"] == round(x1, 4)
    assert got[2]["n_tokens"] == 0 and got[2]["xent_nats"] is None
    # singleton language: P(c)=1, xent 0, ppl 1
    assert got[3]["xent_nats"] == 0.0 and got[3]["ppl"] == 1.0


# ------------------------------------------------------------------------ PMI


def test_pmi_collocations_match_model(spark):
    # "new york" always adjacent; "of the" frequent but independent-ish
    corpus = ["new york " * 6 + "of the of a the b", "of c the d new york"]
    df = spark.createDataFrame(
        [("en", t) for t in corpus], "lang string, text string"
    )
    out = {
        (r.w1, r.w2): r
        for r in text.pmi_collocations(
            df, "lang", "text", min_count=2, k=10
        ).collect()
    }
    # independent model
    from collections import Counter

    toks = [t.split() for t in corpus]
    ug = Counter(w for ts in toks for w in ts)
    nu = sum(ug.values())
    bg = Counter(
        (a, b) for ts in toks for a, b in zip(ts, ts[1:])
    )
    nb = sum(bg.values())
    for (w1, w2), r in out.items():
        p1, p2 = ug[w1] / nu, ug[w2] / nu
        pmi = math.log((bg[(w1, w2)] / nb) / (p1 * p2))
        assert r.pmi_nats == round(pmi, 4), (w1, w2)
        assert r.n == bg[(w1, w2)]
    # the collocation must outrank the frequent-but-independent pair
    assert ("new", "york") in out
    ranks = {p: out[p].rk for p in out}
    if ("of", "the") in out:
        assert ranks[("new", "york")] < ranks[("of", "the")]


# ------------------------------------------------------------ count_triangles


def test_count_triangles_matches_model(spark):
    from module8_movies_etl_spark.operators.graphs import count_triangles

    # K4 on {1,2,3,4} (4 triangles) + a pendant chain 4-5-6 (0) + an
    # isolated edge 7-8; wedge count under degree orientation is
    # checked against itertools brute force of the SAME orientation.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (7, 8)]
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    [r] = count_triangles(df).collect()
    assert r.n_triangles == 4
    assert r.n_edges == 9
    assert r.n_nodes == 8
    from collections import Counter

    deg = Counter(v for e in edges for v in e)
    dout = Counter()
    for a, b in edges:
        src = a if (deg[a], a) < (deg[b], b) else b
        dout[src] += 1
    assert r.n_wedges == sum(d * (d - 1) // 2 for d in dout.values())


# ---------------------------------------------------------- cooccurrence_lift


def test_cooccurrence_lift_matches_model(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "a"),   # duplicate (1, a) must not inflate
        (2, "a"), (2, "b"), (2, "c"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    got = {
        (r.item_a, r.item_b): r
        for r in stats.cooccurrence_lift(df, "b", "i").collect()
    }
    # baskets: 1{a,b} 2{a,b,c} 3{a,c} 4{b}; n=4
    # pairs: (a,b)=2, (a,c)=2, (b,c)=1; counts: a=3, b=3, c=2
    assert got[("a", "b")].n_both == 2
    assert got[("a", "b")].lift == round(2 * 4 / (3 * 3), 4)
    assert got[("a", "c")].n_both == 2
    assert got[("a", "c")].lift == round(2 * 4 / (3 * 2), 4)
    assert got[("b", "c")].n_both == 1
    assert got[("b", "c")].support == round(1 / 4, 6)
    assert len(got) == 3


# -------------------------------------------------------- equidepth_histogram


def test_equidepth_histogram_balanced_bins(spark):
    from module8_movies_etl_spark.operators.robust import equidepth_histogram

    vals = [float(i) for i in range(1, 81)]  # 80 uniform values
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = sorted(equidepth_histogram(df, "v", n_bins=8).collect())
    assert [r.bin for r in rows] == list(range(1, 9))
    # uniform data -> every bin has exactly 10 rows
    assert all(r.n_rows == 10 for r in rows), rows
    # bins tile the range: each hi equals the next lo, ends at max
    for a, b in zip(rows, rows[1:]):
        assert a.hi == b.lo
    assert rows[0].lo == 1.0 and rows[-1].hi == 80.0
    # total preserved
    assert sum(r.n_rows for r in rows) == 80


def test_equidepth_histogram_skewed_beats_equiwidth(spark):
    from module8_movies_etl_spark.operators.robust import equidepth_histogram

    # heavy tail: 99 small values + one huge — equi-depth still splits
    # the mass, while equi-width would put 99% into one bin
    vals = [float(i % 10 + 1) for i in range(99)] + [1e6]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = equidepth_histogram(df, "v", n_bins=4).collect()
    assert sum(r.n_rows for r in rows) == 100
    assert max(r.n_rows for r in rows) <= 40  # no 99%-bin collapse


# ----------------------------------------------------------------- pagerank


def test_pagerank_matches_model(spark):
    from module8_movies_etl_spark.operators.graphs import pagerank

    # star 1-(2,3,4) plus edge 3-4: known asymmetric ranks
    edges = [(1, 2), (1, 3), (1, 4), (3, 4)]
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    got = {r.node: r.rank for r in pagerank(df, 0.85, 5).collect()}

    adj = {1: [2, 3, 4], 2: [1], 3: [1, 4], 4: [1, 3]}
    n = 4
    p = {v: 1 / n for v in adj}
    for _ in range(5):
        p = {
            v: 0.15 / n + 0.85 * sum(p[u] / len(adj[u]) for u in adj[v])
            for v in adj
        }
    assert got == {v: round(p[v], 6) for v in adj}
    # hub outranks leaves; symmetric nodes tie exactly
    assert got[1] > got[3] == got[4] > got[2]


# ------------------------------------------------- grouped-map trend parity


def test_grouped_map_trend_matches_native(spark):
    import random

    random.seed(7)
    rows = [
        (k, random.randrange(0, 10**6), round(random.uniform(-500, 500), 2))
        for k in ("a", "b") for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "k string, x long, y double")
    native = {
        r.k: (r.n, r.slope, r.intercept, r.r2)
        for r in stats.group_trend(df, "k", "x", "y", x_scale=3600.0).collect()
    }
    via_udf = {
        r.k: (r.n, r.slope, r.intercept, r.r2)
        for r in stats.group_trend_applyinpandas(
            df, "k", "x", "y", x_scale=3600.0
        ).collect()
    }
    assert native == via_udf  # bit-for-bit, not approx


# -------------------------------------------------------------------- cusum


def test_cusum_matches_reset_recurrence(spark):
    # hourly buckets with a level shift in the back half
    vals = [10.0, 10.0, 10.0, 10.0, 30.0, 30.0, 30.0, 30.0]
    rows = [
        ("m", f"2024-01-01 {h:02d}:30:00", v) for h, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        r.bucket_s: (r.cusum, r.alarm)
        for r in timeseries.cusum_drift(df, "k", "ts", "v", 3600, 1.0).collect()
    }
    # model: textbook reset recurrence with k = mean = 20
    k = sum(vals) / len(vals)
    s, expect = 0.0, []
    for v in vals:
        s = max(0.0, s + (v - k))
        expect.append(round(s, 2))
    h0 = 1704067200
    got = [out[h0 + 3600 * i][0] for i in range(len(vals))]
    assert got == expect, (got, expect)
    # alarm fires exactly where S exceeds 1.0 * k = 20
    alarms = [out[h0 + 3600 * i][1] for i in range(len(vals))]
    assert alarms == [s > k for s in expect]


# ----------------------------------------------------------------- spearman


def test_spearman_matches_model(spark):
    # monotone nonlinear: rho = 1 exactly; anti-monotone: -1; ties case
    rows = (
        [("mono", float(x), float(x ** 3)) for x in range(1, 9)]
        + [("anti", float(x), float(-x)) for x in range(1, 9)]
        + [("ties", 1.0, 1.0), ("ties", 1.0, 2.0),
           ("ties", 2.0, 2.0), ("ties", 3.0, 1.0)]
    )
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r.k: r.rho for r in stats.spearman_by_key(df, "k", "x", "y").collect()}
    assert got["mono"] == 1.0
    assert got["anti"] == -1.0

    # tie-corrected model for the 'ties' group
    def avg_ranks(vals):
        s = sorted(vals)
        return [
            (s.index(v) + 1 + (s.index(v) + s.count(v))) / 2 for v in vals
        ]

    xs = [1.0, 1.0, 2.0, 3.0]
    ys = [1.0, 2.0, 2.0, 1.0]
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    assert got["ties"] == round(num / den, 4)


# ---------------------------------------------------------------------- KS


def test_ks_two_sample_matches_model(spark):
    a = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    b = [4.0, 5.0, 6.0, 7.0, 8.0, 9.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = stats.ks_two_sample(df, "g", "v", "a", "b").collect()

    pts = sorted(set(a + b))
    d = max(
        abs(
            sum(1 for x in a if x <= p) / len(a)
            - sum(1 for x in b if x <= p) / len(b)
        )
        for p in pts
    )
    assert r.ks_stat == round(d, 6)
    assert (r.n_a, r.n_b) == (6, 6)
    thr = 1.358 * ((len(a) + len(b)) / (len(a) * len(b))) ** 0.5
    assert r.threshold == round(thr, 6)
    assert r.reject == (round(d, 6) > round(thr, 6))
    # identical samples -> D = 0, never rejected
    df2 = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in a], "g string, v double"
    )
    [r2] = stats.ks_two_sample(df2, "g", "v", "a", "b").collect()
    assert r2.ks_stat == 0.0 and not r2.reject


# -------------------------------------------------------------- mann-whitney


def test_mannwhitney_matches_scipy_free_model(spark):
    a = [1.0, 2.0, 3.0, 7.0, 8.0]
    b = [4.0, 5.0, 6.0, 6.0, 9.0, 10.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = stats.mannwhitney_u(df, "g", "v", "a", "b").collect()

    combined = sorted(a + b)

    def avg_rank(v):
        lo = combined.index(v) + 1
        hi = lo + combined.count(v) - 1
        return (lo + hi) / 2

    ra = sum(avg_rank(v) for v in a)
    na, nb = len(a), len(b)
    n = na + nb
    ua = ra - na * (na + 1) / 2
    from collections import Counter

    tie3 = sum(t ** 3 - t for t in Counter(combined).values())
    var = na * nb / 12 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (ua - na * nb / 2) / var ** 0.5
    assert (r.n_a, r.n_b) == (na, nb)
    assert r.u_a == round(ua, 2)
    assert r.z_score == round(z, 4)
