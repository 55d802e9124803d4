"""Currency extraction & parsing (SURVEY.md §2.6 F3-F7).

The reference parses messy Wikipedia money strings — "$21.4 million",
"$1.2 billion", "$57,718,089", ranges like "$10–20 million", citation
footnotes like "$4.2[1] million" — with a row-wise Python function
``parse_dollars`` (reference ``challenge.py:125-155``) plus regex
pre-cleaning (``challenge.py:119-123, 157-176``). Here the whole thing
is a single Catalyst ``when``-chain over ``regexp_*`` builtins: no
Python in the hot path, whole-stage-codegen friendly, and the same
expression runs identically on 7k rows or 100 TB.

Regex dialect notes (pandas/`re` → Java):
- ``flags=re.IGNORECASE`` → inline ``(?i)``.
- the reference anchors via ``re.match`` (prefix match) → ``^`` here
  (SURVEY Q9).
- the range-collapse lookahead ``(?![a-z])`` (protects hyphenated
  titles like "Spider-Man") is valid Java regex as-is.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# "$123.4 million/billion" — reference challenge.py:120
FORM_ONE = r"\$\s*\d+\.?\d*\s*[mb]illi?on"
# "$1,234,567" (digit groups), not followed by " million" — challenge.py:121
FORM_TWO = r"\$\s*\d{1,3}(?:[,\.]\d{3})+(?!\s[mb]illi?on)"

_MILLION = r"(?i)^\$\s*\d+\.?\d*\s*milli?on"
_BILLION = r"(?i)^\$\s*\d+\.?\d*\s*billi?on"
_PLAIN = r"^\$\s*\d{1,3}(?:[,\.]\d{3})+"


def collapse_money_range(col: Column) -> Column:
    """F3: "$10–20 million" → "$20 million" (keep the upper bound).

    Mirrors ``str.replace(r'\\$.*[-—–](?![a-z])', '$')`` at reference
    ``challenge.py:119,167`` — greedy ``.*`` eats through the last
    hyphen/dash not followed by a lowercase letter.
    """
    # replacement is "\\$": in Java's Matcher a bare '$' is a group
    # reference (pandas str.replace takes it literally) — unescaped it
    # throws INVALID_REGEXP_REPLACE at runtime.
    return F.regexp_replace(col, r"\$.*[-—–](?![a-z])", "\\$")


def strip_citations(col: Column) -> Column:
    """F4: drop wiki footnotes "[1] " (reference ``challenge.py:169``)."""
    return F.regexp_replace(col, r"\[\d+\]\s*", "")


def extract_currency(col: Column) -> Column:
    """F6: first match of either money form, case-insensitive
    (reference ``challenge.py:123,157,174``). Non-matches → NULL
    (pandas ``str.extract`` yields NaN; Spark yields '' — normalized
    here with ``nullif``).
    """
    pat = f"(?i)({FORM_ONE}|{FORM_TWO})"
    return F.nullif(F.regexp_extract(col, pat, 1), F.lit(""))


def _digits(col: Column) -> Column:
    """Strip $, spaces and letters, keep digits/dot — the inner
    ``re.sub('\\$|\\s|[a-zA-Z]','',s)`` of reference ``challenge.py:131``.
    """
    return F.regexp_replace(col, r"[\$\sA-Za-z]", "")


def parse_dollars(col: Column) -> Column:
    """F7: the three-way money parse (reference ``challenge.py:125-155``).

    - "$1.2 million"  → 1.2e6
    - "$1.2 billion"  → 1.2e9
    - "$1,234,567"    → 1234567.0  (separators stripped)
    - anything else   → NULL (reference: NaN)

    Branch order and prefix anchoring replicate the reference exactly
    (first branch is *million-only*; ``re.match`` anchoring → ``^``,
    SURVEY Q9).
    """
    return (
        F.when(col.rlike(_MILLION), _digits(col).try_cast("double") * F.lit(1e6))
        .when(col.rlike(_BILLION), _digits(col).try_cast("double") * F.lit(1e9))
        .when(
            col.rlike(_PLAIN),
            F.regexp_replace(col, r"[\$,]", "").try_cast("double"),
        )
        .otherwise(F.lit(None).cast("double"))
    )
