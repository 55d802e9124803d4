"""Unit golden tests for the scalar expression library — the
notebook's own edge cases (FIXTURES.md / Data Cleaning.ipynb cell 45
unparseable list) as assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from module8_movies_etl_spark.functions import casts, currency, dates, durations


def _eval(spark, col_builder, values):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    rows = df.select(col_builder(F.col("s")).alias("out")).collect()
    return [r.out for r in rows]


MONEY_CASES = [
    # (raw, expected) — mined from the notebook's match-coverage probes
    ("$21.4 million", 21.4e6),
    ("$2.7 billion", 2.7e9),
    ("$57,718,089", 57718089.0),
    ("$123.456.789", None),          # dotted separators: float() fails → NULL
    ("$10-20 million", 20e6),        # range → upper bound
    ("$10—20 million", 20e6),        # em dash
    ("$4.2[1] million", 4.2e6),      # citation footnote
    ("$1.2  Billion", 1.2e9),        # case-insensitive, extra spaces
    ("$900 millon", 900e6),          # misspelled 'millon' (milli?on)
    ("N/A", None),
    ("£3 million", None),            # non-dollar currency
    ("¥1.1 billion", None),
    ("926,423 admissions (France)", None),
    ("8 crore", None),
    ("TBA", None),
    ("Spider-Man: $100 million", 100e6),  # lookahead keeps hyphenated title
]


def test_money_pipeline_golden(spark):
    def parse(col):
        cleaned = currency.strip_citations(currency.collapse_money_range(col))
        return currency.parse_dollars(currency.extract_currency(cleaned))

    got = _eval(spark, parse, [c[0] for c in MONEY_CASES])
    for (raw, want), g in zip(MONEY_CASES, got):
        if want is None:
            assert g is None, f"{raw!r}: want NULL got {g}"
        else:
            assert g == pytest.approx(want), f"{raw!r}: want {want} got {g}"


DATE_CASES = [
    ("January 21, 2000", "2000-01-21"),
    ("February 3, 1999", "1999-02-03"),
    ("2000-01-21", "2000-01-21"),
    ("2000/01/21", "2000-01-21"),
    ("December 2000", "2000-12-01"),
    ("2000", "2000-01-01"),
    ("February 31, 1997", None),     # out-of-range day → NULL, no error
    ("Sometime soon", None),
]


def test_date_ladder_golden(spark):
    got = _eval(
        spark,
        lambda c: dates.parse_multiformat_date(c).cast("string"),
        [c[0] for c in DATE_CASES],
    )
    for (raw, want), g in zip(DATE_CASES, got):
        assert g == want, f"{raw!r}: want {want} got {g}"


def test_date_extraction_from_prose(spark):
    got = _eval(
        spark,
        lambda c: dates.parse_multiformat_date(dates.extract_date_text(c)).cast(
            "string"
        ),
        ["released January 21, 2000 (US)", "premiere: 1999-05-04, wide release later"],
    )
    assert got == ["2000-01-21", "1999-05-04"]


def test_date_forms_month_name_parity(spark):
    """Q10: forms 1 & 3 use the reference's explicit month alternation
    (challenge.py:182-184), so a capitalized non-month word never
    matches a named form — "Cannes 2000" extracts "2000" via form 4
    and parses to the year fallback, exactly as the reference does.
    The documented repair: form-1 day is \\d{1,2} (reference [123]\\d
    rejects single-digit days), so "January 5, 2000" parses fully here
    where the reference would year-fallback to 2000-01-01.
    """
    got = _eval(
        spark,
        lambda c: dates.parse_multiformat_date(dates.extract_date_text(c)).cast(
            "string"
        ),
        [
            "premiered at Cannes 2000 in May",   # year fallback, as reference
            "released January 5, 2000 (US)",     # repair: full parse
            "Berlinale 1998-02-11 screening",    # ISO wins over bare year
        ],
    )
    assert got == ["2000-01-01", "2000-01-05", "1998-02-11"]


DURATION_CASES = [
    ("100 minutes", 100.0),
    ("104 min", 104.0),
    ("2 h 30 min", 150.0),
    ("1 hr 45", 105.0),
    ("3 hours 15 minutes", 195.0),
    ("varies", 0.0),                 # unparseable → 0 (reference fillna(0))
]


def test_duration_golden(spark):
    got = _eval(spark, durations.parse_running_time, [c[0] for c in DURATION_CASES])
    for (raw, want), g in zip(DURATION_CASES, got):
        assert g == pytest.approx(want), f"{raw!r}: want {want} got {g}"


def test_lenient_casts_golden(spark):
    got = _eval(spark, casts.lenient_double, ["3.5", "n/a", "", "7", "1e3"])
    assert got == [3.5, 0.0, 0.0, 7.0, 1000.0]
    got = _eval(spark, casts.coerce_bool, ["true", "True", "false", "maybe", ""])
    assert got == [True, True, False, False, False]


def test_strict_cast_audit(spark):
    df = spark.createDataFrame([("1",), ("2.5",), ("bad",), (None,)], ["v"])
    casted, audit = casts.strict_cast_audit(df, "v", "double")
    bad = casted.filter(audit).count()
    assert bad == 1  # only 'bad' destroys a value; NULL input is not new


def test_lang_id_frame_matches_inline(spark):
    """The staged two-projection lang-ID plan (text.lang_id_frame) is
    result-identical to the inline single-expression form."""
    from module8_movies_etl_spark.operators import text
    from module8_movies_etl_spark.sources import read_table

    d = read_table(spark, "/root/testdata/sf0.001", "documents")
    inline = {
        (r.doc_id, r.p)
        for r in d.select(
            "doc_id", text.lang_id(F.col("text")).alias("p")
        ).collect()
    }
    staged = {
        (r.doc_id, r.lang_pred)
        for r in text.lang_id_frame(d, "text", keep_cols=("doc_id",)).collect()
    }
    assert staged == inline and len(staged) > 0
