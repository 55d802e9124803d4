"""Property tests (hypothesis) for the round-6 ML-evaluation
operators — average precision and isotonic calibration — against
brute-force pure-Python references on random tie-heavy inputs.

Both operators are engineered to be exact (integer cumulative counts,
fixed IEEE chains, per-term quantization), so comparisons use tight
tolerances: the only slack is the operators' own documented
quantization (1e-12-scale AP terms, round(6) outputs).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from module8_movies_etl_spark.operators import stats

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# score pools with heavy ties: few distinct integer scores
POS = st.lists(st.integers(0, 8), min_size=1, max_size=25)
NEG = st.lists(st.integers(0, 8), min_size=1, max_size=25)


def _df(spark, pos, neg):
    rows = [("p", float(v)) for v in pos] + [("n", float(v)) for v in neg]
    return spark.createDataFrame(rows, "g string, v double")


def _ap_bruteforce(pos, neg):
    thresholds = sorted(set(pos) | set(neg), reverse=True)
    P = len(pos)
    ap, prev_r = 0.0, 0.0
    for t in thresholds:
        tp = sum(1 for p in pos if p >= t)
        fp = sum(1 for n in neg if n >= t)
        rec = tp / P
        ap += (rec - prev_r) * (tp / (tp + fp))
        prev_r = rec
    return ap


@settings(**SETTINGS)
@given(POS, NEG)
def test_average_precision_matches_bruteforce(spark, pos, neg):
    [r] = stats.average_precision(
        _df(spark, pos, neg), "g", "v", "p", "n"
    ).collect()
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert abs(r["ap"] - _ap_bruteforce(pos, neg)) < 5e-6


def _pav_bruteforce(pos, neg):
    # weighted PAV over ascending distinct cents scores
    from collections import Counter

    cp, cn = Counter(pos), Counter(neg)
    data = [
        (v * 100, cp.get(v, 0), cp.get(v, 0) + cn.get(v, 0))
        for v in sorted(set(pos) | set(neg))
    ]
    merged = []
    for v, p, t in data:
        merged.append([p, t])
        while len(merged) > 1 and (
            merged[-2][0] * merged[-1][1] >= merged[-1][0] * merged[-2][1]
        ):
            last = merged.pop()
            merged[-1][0] += last[0]
            merged[-1][1] += last[1]
    fit = {}
    di = 0
    for blk in merged:
        remaining = blk[1]
        while remaining > 0:
            v, p, t = data[di]
            fit[v] = blk[0] / blk[1]
            remaining -= t
            di += 1
    return fit


@settings(**SETTINGS)
@given(POS, NEG)
def test_isotonic_matches_pav_bruteforce(spark, pos, neg):
    out = {
        r["score_fp"]: r["iso_p"]
        for r in stats.isotonic_calibration(
            _df(spark, pos, neg), "g", "v", "p", "n"
        ).collect()
    }
    fit = _pav_bruteforce(pos, neg)
    assert set(out) == set(fit)
    for v in fit:
        assert abs(out[v] - fit[v]) < 5e-6, (v, out[v], fit[v])
    vals = [out[v] for v in sorted(out)]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))


# --- round-7 property pins: distributed rank + real codecs


def test_global_rank_property_random_sizes(spark):
    # sizes straddling the partition count, heavy ties, empty-ish —
    # ranks must always equal the sorted order's indices
    import random

    from module8_movies_etl_spark.operators import robust

    rng = random.Random(7)
    for n, parts in ((1, 8), (7, 8), (65, 8), (200, 3)):
        rows = [(i, rng.randrange(0, 5)) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v long")
        ranked, total = robust.global_rank(
            df, "v", "id", ascending=True, num_partitions=parts
        )
        assert total == n
        got = {r["id"]: r["rank0"] for r in ranked.collect()}
        expect = {
            rid: i
            for i, (rid, _v) in enumerate(
                sorted(rows, key=lambda t: (t[1], t[0]))
            )
        }
        assert got == expect, (n, parts)


def test_quantile_buckets_property_matches_ntile_reference(spark):
    # NTILE semantics replayed in plain python over the sorted order
    import random

    from module8_movies_etl_spark.operators import robust

    rng = random.Random(13)
    for n, k in ((10, 10), (23, 10), (101, 7), (9, 10)):
        rows = [(i, rng.randrange(0, 6)) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v long")
        out = robust.quantile_buckets(df, "v", "id", n=k, out_col="b")
        got = {r["id"]: r["b"] for r in out.collect()}
        order = sorted(rows, key=lambda t: (-t[1], t[0]))
        q, rem = divmod(n, k)
        expect = {}
        for i, (rid, _v) in enumerate(order):
            if rem and i < rem * (q + 1):
                expect[rid] = i // (q + 1) + 1
            else:
                expect[rid] = rem + (i - rem * (q + 1)) // max(q, 1) + 1
        assert got == expect, (n, k)


def test_bmp_wav_roundtrip_property():
    # every doc_id parameterization must decode to its closed form
    import math

    from module8_movies_etl_spark.operators import multimodal as mm

    for did in range(0, 1400, 37):
        f = mm.decode_bmp(mm.make_bmp(did))
        w, h = 4 + did % 13, 3 + did % 7
        nb = 3 * w * h
        v1, v2 = did % 256, (did * 7 + 13) % 256
        assert f["width"] == w and f["height"] == h
        assert f["mean_luma"] == (
            ((nb + 1) // 2 * v1 + nb // 2 * v2) / (nb * 255.0)
        )
        g = mm.decode_wav(mm.make_wav(did))
        n = 100 + did % 157
        a, b = did % 900 + 1, did % 700 + 2
        assert g["n_samples"] == n
        assert g["rms"] == math.sqrt(
            ((n + 1) // 2 * a * a + n // 2 * b * b) / n
        ) / 32768.0
