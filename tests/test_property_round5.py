"""Property-based tests for the round-5 operator families: Morton
codes, sequence packing, rolling windows, CDC merge — each against an
independent Python model over generated inputs.

Same conventions as test_property_based: one Spark job per example
batch, bounded example counts, no deadline (Spark jobs have startup
jitter).
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from module8_movies_etl_spark.operators import cdc, curation, layout, timeseries

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- Morton code vs a bit-twiddling model --------------------------------


def _morton_model(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 1 << 20), st.integers(0, 1 << 20)),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_morton_matches_model(spark, pts):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], ["i", "x", "y"]
    )
    got = {
        r["i"]: r["z"]
        for r in df.select(
            "i", layout.morton_code(F.col("x"), F.col("y"), bits=16).alias("z")
        ).collect()
    }
    for i, (x, y) in enumerate(pts):
        assert got[i] == _morton_model(x & 65535, y & 65535, 16)


# --- sequence packing vs a running-total model ---------------------------


@given(
    toks=st.lists(st.integers(1, 400), min_size=1, max_size=40),
    budget=st.integers(64, 1024),
)
@settings(**SETTINGS)
def test_pack_sequences_matches_model(spark, toks, budget):
    docs = [(i, "s", "w " * n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(docs, ["doc_id", "stream", "text"])
    got = {
        r["doc_id"]: r["pack_id"]
        for r in curation.pack_sequences(
            df, "doc_id", "text", "stream", budget_tokens=budget
        ).collect()
    }
    cum = 0
    for i, n in enumerate(toks):
        assert got[i] == cum // budget
        cum += n


# --- rolling stats vs a sliding-window model ------------------------------


@given(
    vals=st.lists(
        st.decimals(
            min_value=Decimal("-999.99"),
            max_value=Decimal("999.99"),
            places=2,
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_rolling_sum_matches_model(spark, vals):
    rows = [(i, 1, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "epoch", "value"]
    ).withColumn("ts", F.timestamp_seconds("epoch"))
    out = {
        r["event_id"]: (r["roll_sum"], r["roll_n"])
        for r in timeseries.rolling_window_stats(
            df, "user_id", "ts", "event_id", "value", frame=3
        ).collect()
    }
    for i in range(len(vals)):
        frame = vals[max(0, i - 2) : i + 1]
        # the operator casts to DECIMAL(28,6): 2-decimal inputs are
        # represented exactly, so the model sum is exact too
        assert out[i][0] == float(sum(frame))
        assert out[i][1] == len(frame)


# --- CDC merge vs a dict model --------------------------------------------


@given(
    base=st.dictionaries(
        st.integers(0, 30), st.integers(-(2**62), 2**62), max_size=20
    ),
    ups=st.dictionaries(
        st.integers(0, 30), st.integers(-(2**62), 2**62), max_size=10
    ),
    dels=st.sets(st.integers(0, 30), max_size=10),
)
@settings(**SETTINGS)
def test_apply_cdc_matches_model(spark, base, ups, dels):
    # a key cannot be both upserted and deleted in one compacted delta
    ups = {k: v for k, v in ups.items() if k not in dels}
    if not base and not ups and not dels:
        return
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)], "k int, v long"
    ).filter(F.col("k").isNotNull())
    delta_rows = [(k, v, "U") for k, v in ups.items()] + [
        (k, None, "D") for k in dels
    ]
    if not delta_rows:
        return
    delta_df = spark.createDataFrame(delta_rows, "k int, v long, op string")
    got = {
        r["k"]: r["v"] for r in cdc.apply_cdc(base_df, delta_df, "k").collect()
    }
    model = dict(base)
    model.update(ups)
    for k in dels:
        model.pop(k, None)
    assert got == model
