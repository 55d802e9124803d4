"""Property-based tests (hypothesis): the scalar expression library
and session fold against independent Python models, over generated
inputs rather than hand-picked goldens.

Each example batch becomes ONE Spark job (createDataFrame over the
whole list) — per-example Spark round-trips would be 100× slower.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from module8_movies_etl_spark.functions import currency, durations
from module8_movies_etl_spark.operators import text
from module8_movies_etl_spark.streaming.stateful import _fold_epochs

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- money: model of the reference's parse_dollars (challenge.py:125-155) ---

_MONEY = st.one_of(
    st.builds(
        lambda a, b, u: f"${a}.{b} {u}",
        st.integers(0, 999),
        st.integers(0, 99),
        st.sampled_from(["million", "billion", "Million", "billi0n"]),
    ),
    st.builds(
        lambda n: "$" + f"{n:,}",
        st.integers(0, 10**9),
    ),
    st.sampled_from(["N/A", "TBA", "¥1.1 billion", "", "$", "8 crore"]),
    st.text(
        alphabet="$0123456789,. millionbillion-",
        min_size=0,
        max_size=24,
    ),
)


def _model_parse_dollars(s: str) -> float | None:
    if s is None:
        return None
    if re.match(r"(?i)^\$\s*\d+\.?\d*\s*milli?on", s):
        num = re.sub(r"(?i)[\$\sa-z]", "", s)
        try:
            return float(num) * 1e6
        except ValueError:
            return None
    if re.match(r"(?i)^\$\s*\d+\.?\d*\s*billi?on", s):
        num = re.sub(r"(?i)[\$\sa-z]", "", s)
        try:
            return float(num) * 1e9
        except ValueError:
            return None
    # form_two (challenge.py:121): group separators are [,.] — a
    # dot-grouped "$1.234" parses as 1.234 (single dot survives the
    # comma-only strip and float() accepts it); multi-dot fails → None
    if re.match(r"^\$\s*\d{1,3}(?:[,\.]\d{3})+(?!\s[mb]illion)", s):
        num = re.sub(r"[\$,]", "", s)
        try:
            return float(num)
        except ValueError:
            return None
    return None


@given(st.lists(_MONEY, min_size=1, max_size=40))
@settings(**SETTINGS)
def test_parse_dollars_matches_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [
        r.out
        for r in df.select(
            currency.parse_dollars(F.col("s")).alias("out")
        ).collect()
    ]
    want = [_model_parse_dollars(v) for v in values]
    for g, w, v in zip(got, want, values):
        if w is None:
            assert g is None, (v, g)
        else:
            assert g is not None and abs(g - w) < 1e-6 * max(abs(w), 1), (v, g, w)


# --- durations: hours/minutes extraction (challenge.py:195-199) ---

_DURATION = st.one_of(
    st.builds(
        lambda h, m: f"{h} hours {m} minutes",
        st.integers(0, 30),
        st.integers(0, 300),
    ),
    st.builds(lambda h: f"{h} h", st.integers(0, 30)),
    st.builds(lambda m: f"{m} minutes", st.integers(0, 10_000)),
    st.builds(lambda m: f"{m} min.", st.integers(0, 500)),
    st.sampled_from(["", "unknown", "90", "1h30", "TBD"]),
)


def _model_minutes(s: str) -> float:
    """Reference semantics (challenge.py:195-199): coerce-fill groups
    to 0, no match → 0.0."""
    from module8_movies_etl_spark.functions.durations import DURATION_PATTERN

    m = re.search(DURATION_PATTERN, s or "")
    g1 = float(m.group(1)) if m and m.group(1) else 0.0
    g2 = float(m.group(2)) if m and m.group(2) else 0.0
    g3 = float(m.group(3)) if m and m.group(3) else 0.0
    return g1 * 60.0 + g2 if g3 == 0.0 else g3


@given(st.lists(_DURATION, min_size=1, max_size=40))
@settings(**SETTINGS)
def test_duration_minutes_matches_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [
        r.out
        for r in df.select(
            durations.parse_running_time(F.col("s")).alias("out")
        ).collect()
    ]
    want = [_model_minutes(v) for v in values]
    assert got == want, list(zip(values, got, want))


# --- token_count: whitespace-token model, incl. empty/whitespace-only ---

_TEXTS = st.text(
    alphabet=" \t\naAbB01.,!$é", min_size=0, max_size=60
)


@given(st.lists(_TEXTS, min_size=1, max_size=50))
@settings(**SETTINGS)
def test_token_count_matches_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [
        r.out
        for r in df.select(text.token_count(F.col("s")).alias("out")).collect()
    ]
    want = [len(v.split()) for v in values]
    assert got == want, list(zip(values, got, want))


# --- session fold: pure-Python invariants, no Spark needed ---

@given(
    st.lists(st.integers(0, 100_000), min_size=0, max_size=60),
    st.integers(1, 3600),
)
@settings(max_examples=200, deadline=None)
def test_fold_epochs_invariants(epochs, gap):
    closed, cur = _fold_epochs(sorted(epochs), None, gap)
    sessions = closed + ([cur] if cur else [])
    # events conserved
    assert sum(s[2] for s in sessions) == len(epochs)
    for s0, e0, n in sessions:
        assert s0 <= e0 and n >= 1
    # sessions ordered and separated by more than gap
    for (a0, a1, _), (b0, b1, _) in zip(sessions, sessions[1:]):
        assert b0 - a1 > gap
        assert a1 <= b0
    # within a session there is no internal gap larger than `gap`:
    # re-fold each session's own events and expect a single session
    if epochs:
        es = sorted(epochs)
        idx = 0
        for s0, e0, n in sessions:
            sub = es[idx : idx + n]
            resplit, last = _fold_epochs(sub, None, gap)
            assert resplit == [] and last == (s0, e0, n)
            idx += n


# --- date ladder: extract-then-parse vs Python model (F8+F9, Q10) ---

_MONTHS = (
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
)

_DATES = st.one_of(
    st.builds(
        lambda m, d, y: f"{m} {d}, {y}",
        st.sampled_from(_MONTHS),
        st.integers(1, 31),
        st.integers(1800, 2100),
    ),
    st.builds(
        lambda y, m, d: f"{y:04d}-{m:02d}-{d:02d}",
        st.integers(1800, 2100),
        st.integers(1, 13),
        st.integers(1, 32),
    ),
    st.builds(
        lambda m, y: f"{m} {y}", st.sampled_from(_MONTHS), st.integers(1800, 2100)
    ),
    st.builds(lambda y: str(y), st.integers(1000, 2999)),
    st.builds(
        lambda w, y: f"{w} {y}",
        st.sampled_from(["Cannes", "Sundance", "circa", "May-ish"]),
        st.integers(1800, 2100),
    ),
    st.sampled_from(["", "unknown", "02/03/2000", "release: 1999-12-31 (US)"]),
)


def _model_extract(s: str) -> str | None:
    alt = "(?:" + "|".join(_MONTHS) + ")"
    forms = [
        alt + r"\s\d{1,2},\s\d{4}",
        r"\d{4}[-/]\d{2}[-/]\d{2}",
        alt + r"\s\d{4}",
        r"\d{4}",
    ]
    m = re.search("(" + "|".join(forms) + ")", s or "")
    return m.group(1) if m else None


def _model_parse(s: str | None):
    import datetime

    if s is None:
        return None
    alt = "(?:" + "|".join(_MONTHS) + ")"

    def mk(y: int, mo: int, d: int):
        try:
            return datetime.date(y, mo, d)
        except ValueError:
            return None

    m = re.match(r"^(\d{4})[-/](\d{2})[-/](\d{2})$", s)
    if m:
        return mk(int(m.group(1)), int(m.group(2)), int(m.group(3)))
    m = re.match(rf"^({alt})\s(\d{{1,2}}),\s(\d{{4}})$", s)
    if m:
        return mk(int(m.group(3)), _MONTHS.index(m.group(1)) + 1, int(m.group(2)))
    m = re.match(rf"^({alt})\s(\d{{4}})$", s)
    if m:
        return mk(int(m.group(2)), _MONTHS.index(m.group(1)) + 1, 1)
    if re.match(r"^\d{4}$", s):
        return mk(int(s), 1, 1)
    return None


@given(st.lists(_DATES, min_size=1, max_size=40))
@settings(**SETTINGS)
def test_date_extract_and_parse_match_model(spark, values):
    from module8_movies_etl_spark.functions import dates

    df = spark.createDataFrame([(v,) for v in values], "s string")
    rows = df.select(
        dates.extract_date_text(F.col("s")).alias("ex"),
        dates.parse_multiformat_date(
            dates.extract_date_text(F.col("s"))
        ).alias("dt"),
    ).collect()
    for v, r in zip(values, rows):
        ex = _model_extract(v)
        assert r.ex == ex, (v, r.ex, ex)
        want = _model_parse(ex)
        assert r.dt == want, (v, ex, r.dt, want)


# --- lenient casts: coerce-to-zero model over messy numerics (C1/C3) ---

_NUMERICS = st.one_of(
    st.builds(lambda n: str(n), st.integers(-10**12, 10**12)),
    st.builds(lambda f: f"{f:.4f}", st.floats(-1e6, 1e6, allow_nan=False)),
    st.builds(lambda n: f"  {n} ", st.integers(-999, 999)),
    st.builds(lambda a, b: f"{a}.{b}", st.integers(0, 99), st.integers(0, 999)),
    st.sampled_from(["", " ", "n/a", "1.2.3", "12abc", ".5", "5.", "-", "-7"]),
    st.text(alphabet="0123456789.- ", min_size=0, max_size=12),
)


def _model_lenient_double(s: str) -> float:
    if s is None:
        return 0.0
    t = s.strip()
    if re.match(r"^-?(\d+\.?\d*|\.\d+)$", t):
        return float(t)
    return 0.0


@given(st.lists(_NUMERICS, min_size=1, max_size=50))
@settings(**SETTINGS)
def test_lenient_double_matches_model(spark, values):
    from module8_movies_etl_spark.functions import casts

    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [
        r.out
        for r in df.select(casts.lenient_double(F.col("s")).alias("out")).collect()
    ]
    want = [_model_lenient_double(v) for v in values]
    for v, g, w in zip(values, got, want):
        assert g == w, (repr(v), g, w)
