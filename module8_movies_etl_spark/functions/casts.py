"""Casts & conditional fills (SURVEY.md §2.7 C1-C8).

Lenient/strict numeric casts, boolean coercion, and the reference's
``fill_missing_kaggle_data`` conflict-resolution rule — including its
famous quirk: the fill triggers on ``== 0``, NOT on NULL (SURVEY Q2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lenient_double(col: Column) -> Column:
    """C1: ``pd.to_numeric(errors='coerce').fillna(0)``
    (reference ``challenge.py:197``) — invalid → NULL → 0.

    ``try_cast`` (not ``cast``): lenient semantics must hold even under
    a caller session running Spark 4's default ANSI mode, where a plain
    cast of 'n/a' raises CAST_INVALID_INPUT instead of yielding NULL.
    """
    return F.coalesce(col.try_cast("double"), F.lit(0.0))


def lenient_long(col: Column) -> Column:
    """C1/C3 long-typed variant (reference ``challenge.py:211``)."""
    return F.coalesce(col.try_cast("double").try_cast("long"), F.lit(0).cast("long"))


def strict_cast_audit(df: DataFrame, name: str, dtype: str) -> tuple[DataFrame, Column]:
    """C2: ``pd.to_numeric(errors='raise')`` equivalent
    (reference ``challenge.py:212-213``).

    Returns (df-with-cast, audit-column). ``try_cast`` maps invalid →
    NULL, so "raise" semantics = assert no *new* nulls: the audit
    column is true where the cast destroyed a value; callers gate on
    ``filter(audit).isEmpty()`` (cheap — Catalyst prunes to the two
    columns).

    The audit must be materialized BEFORE the column is replaced —
    an expression referencing ``name`` against the returned frame
    would resolve to the already-cast value and never fire.
    """
    orig = F.col(name)
    casted = orig.try_cast(dtype)
    out = (
        df.withColumn("__cast_audit", orig.isNotNull() & casted.isNull())
        .withColumn(name, casted)
    )
    return out, F.col("__cast_audit")


def coerce_bool(col: Column) -> Column:
    """C4: bool coercion of a bools-and-strings column (reference
    ``challenge.py:210``: ``df['video'] == True``). Uses the SQL
    boolean cast vocabulary — case-insensitive 'true'/'t'/'yes'/'y'/
    '1' → true, 'false'/'f'/'no'/'n'/'0' → false — with everything
    unparseable (and NULL) coalesced to false. NOTE this is wider
    than the reference, whose ``== True`` on a string column is False
    for EVERY string; the engine deliberately accepts the standard
    string-boolean forms (both engines' try_cast agree on them, so
    the oracle pins the same vocabulary).
    """
    return F.coalesce(col.try_cast("boolean"), F.lit(False))


def fill_zero_with(df: DataFrame, keep: str, fallback: str) -> DataFrame:
    """C7: the reference's conflict-resolution rule
    (``fill_missing_kaggle_data``, reference ``challenge.py:244-256``).

    Keep the Kaggle value unless it equals **zero**, in which case take
    the wiki value; then drop the wiki column. NOT a coalesce-on-null:
    ``NULL == 0`` is NULL → falls to otherwise → NULLs survive
    untouched (SURVEY Q2 — mirrored exactly, do not "fix").

    For non-numeric ``keep`` columns (title, release_date, language)
    the reference's ``row[k] == 0`` is never true — the fill is a no-op
    that still drops the wiki column. Mirrored statically here (a
    ``DATE = 0`` comparison is an ANSI type error in Spark anyway).
    """
    dtype = df.schema[keep].dataType.typeName()
    if dtype in ("byte", "short", "integer", "long", "float", "double", "decimal", "boolean"):
        df = df.withColumn(
            keep,
            F.when(F.col(keep) == 0, F.col(fallback)).otherwise(F.col(keep)),
        )
    return df.drop(fallback)


def fill_nulls_zero(df: DataFrame, subset: list[str]) -> DataFrame:
    """C8: zero-fill a column subset (reference ``challenge.py:302`` —
    unrated movies' histogram cells NULL → 0)."""
    return df.na.fill(0, subset=subset)
