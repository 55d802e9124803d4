"""Running-time (duration) parsing (SURVEY.md §2.6 F10-F11).

The reference extracts "2 h 30 min" / "100 minutes" shapes with a
three-group regex and a row-wise ``apply(axis=1)`` to normalize to
minutes (reference ``challenge.py:193-199``). Here: three
``regexp_extract`` calls plus a vectorized ``when`` — no apply.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# hours, optional minutes | pure minutes — reference challenge.py:195
DURATION_PATTERN = r"(\d+)\s*ho?u?r?s?\s*(\d*)|(\d+)\s*m"


def _group(col: Column, idx: int) -> Column:
    """One capture group as double; empty/no match → 0 (the reference's
    ``to_numeric(errors='coerce').fillna(0)`` at ``challenge.py:197``).
    """
    g = F.regexp_extract(col, DURATION_PATTERN, idx)
    return F.coalesce(F.nullif(g, F.lit("")).cast("double"), F.lit(0.0))


def parse_running_time(col: Column) -> Column:
    """F10+F11: duration text → minutes (double).

    ``hours*60 + minutes`` when the hour-form matched, else the pure
    minutes group — exactly the reference's conditional at
    ``challenge.py:199``. Unparseable → 0 (via the coerce-fill above).
    """
    hours, hour_minutes, pure_minutes = (_group(col, i) for i in (1, 2, 3))
    return F.when(
        pure_minutes == 0, hours * F.lit(60.0) + hour_minutes
    ).otherwise(pure_minutes)
