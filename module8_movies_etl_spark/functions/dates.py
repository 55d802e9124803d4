"""Multi-format date extraction & parsing (SURVEY.md §2.6 F8-F9, §2.7 C5-C6).

The reference extracts four date shapes from Wikipedia text and lets
``pd.to_datetime(infer_datetime_format=True)`` guess per-row formats
(reference ``challenge.py:182-189``). Spark has no per-row format
inference, so the engine parses with an explicit ``coalesce`` ladder of
``to_timestamp`` attempts — deterministic, documented, and vectorized.
Partial dates resolve the way pandas does: "January 2000" → 2000-01-01,
"2000" → 2000-01-01.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MONTHS = (
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
)

_MONTH_ALT = "(?:" + "|".join(_MONTHS) + ")"

# The four wiki date forms — reference challenge.py:182-185. Forms 1
# and 3 use the reference's explicit month-name alternation, so a
# capitalized non-month word never matches: "Cannes 2000" falls through
# to form 4 and extracts "2000" (year fallback), exactly as the
# reference does. Two deliberate repairs vs the reference, recorded as
# SURVEY §4.3 Q10:
#   - form 1 day is \d{1,2} where the reference has [123]\d, which
#     rejects single-digit days ("January 5, 2000" → year-only there);
#   - form 2 separators are [-/] where the reference's `.` wildcard
#     accepts any character between the number groups.
DATE_FORMS = (
    _MONTH_ALT + r"\s\d{1,2},\s\d{4}",  # January 1, 2000
    r"\d{4}[-/]\d{2}[-/]\d{2}",         # 2000-01-01
    _MONTH_ALT + r"\s\d{4}",            # January 2000
    r"\d{4}",                            # 2000
)


def extract_date_text(col: Column) -> Column:
    """F8: first match of any date form (reference ``challenge.py:187-189``)."""
    pat = "(" + "|".join(DATE_FORMS) + ")"
    return F.nullif(F.regexp_extract(col, pat, 1), F.lit(""))


def _month_map() -> Column:
    """Name → 1-based month number as a literal map expression (built
    lazily: Column construction needs an active SparkContext)."""
    return F.create_map(
        *[x for i, m in enumerate(_MONTHS, 1) for x in (F.lit(m), F.lit(i))]
    )


def parse_multiformat_date(col: Column) -> Column:
    """F9: explicit-format ladder replacing pandas format inference.

    Month-name forms are decomposed manually (``regexp_extract`` the
    name/day/year + a literal month map + ``make_date``): Spark's
    non-legacy datetime parser rejects >2 'M' pattern letters for
    *parsing*, so ``try_to_timestamp(col, 'MMMM d, yyyy')`` is NULL for
    every row regardless of input. Numeric forms go through
    ``try_to_timestamp`` (NULL on mismatch — no ANSI error). Partial
    dates resolve like pandas: "January 2000" → 2000-01-01,
    "2000" → 2000-01-01.
    """
    month = _month_map()[F.regexp_extract(col, r"^([A-Z][a-z]+)", 1)]
    year4 = F.regexp_extract(col, r"(\d{4})\s*$", 1)
    day = F.regexp_extract(col, r"^[A-Z][a-z]+\s(\d{1,2}),", 1)

    def _iso(y: Column, m: Column, d: Column) -> Column:
        # route through a rebuilt 'y-M-d' string + try_to_timestamp so an
        # out-of-range day ("February 31") yields NULL, never an ANSI error
        return F.try_to_timestamp(
            F.concat_ws("-", y, m.cast("string"), d.cast("string")),
            F.lit("yyyy-M-d"),
        ).cast("date")

    named_full = F.when(
        col.rlike("^" + _MONTH_ALT + r"\s\d{1,2},\s\d{4}$"), _iso(year4, month, day)
    )
    named_month = F.when(
        col.rlike("^" + _MONTH_ALT + r"\s\d{4}$"), _iso(year4, month, F.lit(1))
    )
    bare_year = F.when(col.rlike(r"^\d{4}$"), _iso(year4, F.lit(1), F.lit(1)))
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")).cast("date"),
        F.try_to_timestamp(col, F.lit("yyyy/MM/dd")).cast("date"),
        named_full,
        named_month,
        bare_year,
    )


def unix_seconds_to_timestamp(col: Column) -> Column:
    """C6: unix seconds → timestamp (reference ``challenge.py:219``).

    NOTE the reference computes this and discards the result (SURVEY
    Q1) — its loaded ratings keep raw int64 seconds. The engine keeps
    raw integers in the canonical table too and exposes this as the
    documented conversion.
    """
    return F.timestamp_seconds(col)
