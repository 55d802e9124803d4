"""Record-cleaning expressions (SURVEY.md §2.6 F2, §2.7 C9).

The reference's ``clean_movie`` (reference ``challenge.py:61-101``) is a
per-record dict rewriter: consolidate ~20 language-title keys into a
nested ``alt_titles`` dict and collapse 19 raw column-name variants
onto canonical columns. Its list-cell normalizer joins list values
with spaces (``challenge.py:117,165,180,193``). Both are column-level
expressions here — schema work happens at plan time, not per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def text_or_joined_array(df: DataFrame, name: str) -> Column:
    """F2: normalize a string-or-array column to one string.

    Mirrors ``' '.join(x) if type(x) == list else x``
    (reference ``challenge.py:117``). With a typed schema the branch is
    static per column: ArrayType → ``concat_ws(' ', col)``, else passthrough.
    """
    field = dict(zip(df.schema.names, df.schema.fields))[name]
    if field.dataType.typeName() == "array":
        return F.when(
            F.col(name).isNotNull(), F.concat_ws(" ", F.col(name))
        ).otherwise(F.lit(None).cast("string"))
    return F.col(name).cast("string")


def coalesce_first(df: DataFrame, *names: str) -> Column:
    """C9 rename-consolidation: first non-null among column-name
    variants. The caller lists variants in PRECEDENCE order — for the
    reference's overwrite semantics (``movie[new] = movie.pop(old)``:
    last applied variant wins over any earlier value including the
    target's own) that is the apply order REVERSED with the canonical
    target last; see ``pipelines.movies_etl.RENAME_CONSOLIDATION``.
    Missing variants are skipped so one expression serves ragged
    inputs.
    """
    present = [F.col(f"`{n}`") for n in names if n in df.columns]
    if not present:
        return F.lit(None).cast("string")
    return F.coalesce(*present) if len(present) > 1 else present[0]


def consolidate_alt_titles(df: DataFrame, keys: list[str]) -> Column:
    """C9 alt-title consolidation: fold the sparse language-title
    columns into one ``map<string,string>`` (reference
    ``challenge.py:63-73`` builds a dict the same way). NULL entries
    are filtered out of the map.
    """
    present = [k for k in keys if k in df.columns]
    if not present:
        return F.lit(None).cast("map<string,string>")
    pairs = F.map_from_arrays(
        F.array(*[F.lit(k) for k in present]),
        F.array(*[F.col(f"`{k}`").cast("string") for k in present]),
    )
    return F.map_filter(pairs, lambda _, v: v.isNotNull())


def normalize_list_cell(df: DataFrame, name: str) -> Column:
    """F2 for ragged-JSON ingest: Spark infers a *string* type for
    columns whose JSON cells mix scalars and arrays, keeping the raw
    ``["a","b"]`` token text. Static arrays join directly; stringly
    cells that look like JSON arrays are parsed (``from_json`` →
    ``array<string>``) then joined; plain scalars pass through —
    mirroring ``' '.join(x) if type(x) == list else x``
    (reference ``challenge.py:117``).
    """
    field = dict(zip(df.schema.names, df.schema.fields))[name]
    c = F.col(f"`{name}`")
    if field.dataType.typeName() == "array":
        return F.when(c.isNotNull(), F.concat_ws(" ", c)).otherwise(
            F.lit(None).cast("string")
        )
    if field.dataType.typeName() != "string":
        return c.cast("string")
    parsed = F.from_json(c, "array<string>")
    return F.when(
        c.rlike(r"^\s*\[") & parsed.isNotNull(), F.concat_ws(" ", parsed)
    ).otherwise(c)


def normalize_text(col: Column) -> Column:
    """Canonical text form for fingerprinting/dedup: lowercase, strip
    punctuation, collapse whitespace. (Engine extension; the reference's
    nearest analog is its regex pre-cleaning pipeline.)
    """
    lowered = F.lower(col)
    stripped = F.regexp_replace(lowered, r"[^\p{L}\p{N}\s]", " ")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))
