"""Property tests (hypothesis) for the round-5-late families: the
HLL sketch against an independent pure-Python md5 model, k-means
input-order invariance, and Kaplan-Meier curve laws.

Each example batch becomes ONE Spark job; exact-integer outputs
compare exactly (the HLL registers and k-means labels are integers by
construction — that is the whole cross-engine design).
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from module8_movies_etl_spark.operators import clustering, sketches, stats

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_hll_registers(values, m):
    regs = {b: 0 for b in range(m)}
    for v in set(values):
        hx = hashlib.md5(str(v).encode()).hexdigest()
        bucket = int(hx[:2], 16) % m
        w = int(hx[2:14], 16)
        rho = 49 - w.bit_length() if w > 0 else 49
        regs[bucket] = max(regs[bucket], rho)
    return regs


@given(vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=200))
@settings(**SETTINGS)
def test_hll_registers_match_python_model(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], ["k"])
    got = {
        r["bucket"]: r["reg"]
        for r in sketches.hll_registers(df, "k", m=32).collect()
    }
    assert got == _py_hll_registers(vals, 32)


@given(
    vecs=st.lists(
        st.tuples(
            st.floats(-5, 5, allow_nan=False, width=32),
            st.floats(-5, 5, allow_nan=False, width=32),
        ),
        min_size=4,
        max_size=30,
        unique=True,
    )
)
@settings(**SETTINGS)
def test_kmeans_is_input_order_invariant(spark, vecs):
    """Same rows in any order -> identical (id, cluster, dist): the
    md5 seed choice and all-integer arithmetic leave no order
    dependence anywhere."""
    rows = [(i, [float(a), float(b)]) for i, (a, b) in enumerate(vecs)]
    df1 = spark.createDataFrame(rows, ["vec_id", "embedding"])
    df2 = spark.createDataFrame(rows[::-1], ["vec_id", "embedding"])
    out1 = sorted(
        map(tuple, clustering.kmeans_assign(df1, k=3, n_rounds=2).collect())
    )
    out2 = sorted(
        map(tuple, clustering.kmeans_assign(df2, k=3, n_rounds=2).collect())
    )
    assert out1 == out2


@given(
    subs=st.lists(
        st.tuples(st.integers(1, 20), st.booleans()),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_kaplan_meier_curve_laws(spark, subs):
    """S is in [0,1], non-increasing in t within a group, and equals
    the textbook product over the emitted rows themselves."""
    rows = [("g", d, int(e)) for d, e in subs]
    df = spark.createDataFrame(rows, ["grp", "dur", "ev"])
    out = sorted(
        stats.kaplan_meier(df, "grp", "dur", "ev").collect(),
        key=lambda r: r["dur"],
    )
    prev = 1.0
    prod = 1.0
    for r in out:
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev + 1e-9
        prev = r["survival"]
        prod *= 1.0 - r["n_events"] / r["n_risk"]
        assert abs(r["survival"] - round(prod, 6)) < 5e-6
