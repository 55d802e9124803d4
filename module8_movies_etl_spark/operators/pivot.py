"""Pivot / reshape (SURVEY.md §2.5 V1-V2).

The reference pivots the (movieId, rating, count) long table into a
45,115 × 10 wide histogram and prefixes the columns ``rating_0.5`` …
``rating_5.0`` (reference ``challenge.py:293-296``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_count(
    df: DataFrame,
    index: str,
    pivot_col: str,
    values: list | None = None,
    prefix: str = "",
) -> DataFrame:
    """V1+V2 fused: groupBy(index).pivot(col).count() with renamed
    output columns.

    ``values`` should be passed whenever the caller knows the domain
    (the reference's 10 rating buckets): it skips the extra
    distinct-value job AND fixes the output schema at plan time —
    mandatory for deterministic schemas at scale. Pivot output columns
    may contain dots (``rating_0.5``) → downstream access must
    backtick-quote (``select_columns`` does).
    """
    grouped = df.groupBy(index)
    pivoted = (
        grouped.pivot(pivot_col, values) if values is not None else grouped.pivot(pivot_col)
    ).agg(F.count(F.lit(1)))
    if prefix:
        pivoted = pivoted.select(
            F.col(index),
            *[
                F.col(f"`{c}`").alias(f"{prefix}{c}")
                for c in pivoted.columns
                if c != index
            ],
        )
    return pivoted


def pivot_count_fixed(
    df: DataFrame,
    index: str,
    pivot_col: str,
    values: list,
    prefix: str = "",
) -> DataFrame:
    """``pivot_count`` for a KNOWN small value domain, lowered to a
    conditional aggregate: ``sum(when(col == v, 1))`` per value.

    NULL semantics differ from the general form — deliberately:
    ``groupBy().pivot(values).count()`` emits NULL for a value absent
    from a group (``pivotfirst``'s missing-slot default), while this
    form emits 0 (histogram semantics; the coalesce also covers a
    group whose ``pivot_col`` is entirely NULL, where a bare sum of
    NULL-comparison casts would be NULL). Callers migrating between
    the two must not rely on NULL↔0 being interchangeable.

    The plan win: ONE exchange on the index key with map-side
    partials, where ``groupBy().pivot()`` plans a (index, pivot_col)-
    grain aggregate + second exchange + ``pivotfirst`` reshape. At
    100 TB the saved exchange is a full pass over the fact table's
    key-value pairs; use the general ``pivot_count`` only when the
    domain is unknown at plan time.
    """
    return df.groupBy(index).agg(
        *[
            F.coalesce(
                F.sum((F.col(pivot_col) == v).cast("long")), F.lit(0)
            )
            .cast("long")
            .alias(f"{prefix}{v}")
            for v in values
        ]
    )
