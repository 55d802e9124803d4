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
