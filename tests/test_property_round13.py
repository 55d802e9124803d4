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
