"""Projections / renames (SURVEY.md §2.2 P2-P4).

Thin, but centralized so plans read declaratively and column-name
quoting (pivot columns contain dots: ``rating_0.5``) is handled once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def select_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """P2: select + reorder (reference ``challenge.py:265-270``).
    Backtick-quotes every name so dotted pivot columns survive.
    """
    return df.select(*[F.col(f"`{c}`") for c in cols])


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P4: bulk rename (reference ``challenge.py:273-288``'s 15-column
    snake_case map). Uses one projection, not chained ``withColumnRenamed``
    (each of those is a separate plan node)."""
    return df.select(
        *[F.col(f"`{c}`").alias(mapping.get(c, c)) for c in df.columns]
    )
