"""PSI drift score (round 9) — independent properties: an identical
split scores ~0, a location shift scores high, and the per-bin
contributions replay in plain Python."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from module8_movies_etl_spark.operators.robust import psi_drift


def _psi_python(base: list[float], cur: list[float], edges: list[float]):
    n_bins = len(edges) - 1
    lower = edges[:n_bins]

    def bin_of(v: float) -> int:
        return max(sum(1 for e in lower if v > e), 1)

    nb = [0] * (n_bins + 1)
    nc = [0] * (n_bins + 1)
    for v in base:
        nb[bin_of(v)] += 1
    for v in cur:
        nc[bin_of(v)] += 1
    tb, tc = sum(nb), sum(nc)
    total = 0.0
    for b in range(1, n_bins + 1):
        if nb[b] == 0 and nc[b] == 0:
            continue  # bin absent from the grouped cells entirely
        pb = (nb[b] + 0.5) / (tb + 0.5 * n_bins)
        pc = (nc[b] + 0.5) / (tc + 0.5 * n_bins)
        total += round((pc - pb) * round(math.log(pc / pb), 6), 8)
    return round(total, 6)


def test_identical_split_scores_near_zero(spark):
    # paired construction: both halves carry the SAME value multiset
    # ((i // 2) % 100), one copy per period
    rows = [(float((i // 2) % 100), i % 2 == 0) for i in range(2000)]
    df = spark.createDataFrame(rows, "v double, is_base boolean")
    out = psi_drift(df, "v", F.col("is_base"), n_bins=10).collect()
    assert len(out) > 0
    psi = out[0]["psi_total"]
    assert psi == pytest.approx(0.0, abs=1e-4)
    # contributions are non-negative by construction
    assert all(r["psi_contrib"] >= 0 for r in out)


def test_location_shift_scores_high_and_matches_python(spark):
    base = [float(i % 100) for i in range(1500)]
    cur = [float(i % 100) + 60.0 for i in range(1500)]  # hard shift
    rows = [(v, True) for v in base] + [(v, False) for v in cur]
    df = spark.createDataFrame(rows, "v double, is_base boolean")
    out = psi_drift(df, "v", F.col("is_base"), n_bins=10).collect()
    psi = out[0]["psi_total"]
    assert psi > 0.25, psi  # "shifted" per the standard rule of thumb
    # replay with the SAME rounded baseline edges the operator cut
    edges = sorted({r["lo"] for r in out} | {r["hi"] for r in out})
    want = _psi_python(base, cur, edges)
    assert psi == pytest.approx(want, abs=2e-6)
