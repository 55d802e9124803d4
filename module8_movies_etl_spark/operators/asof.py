"""As-of (backward) join — the canonical time-series operator Spark's
join family lacks (SURVEY.md §2.3 notes the reference has none either;
this is a north-star extension named by the brief).

For each left row, attach the payload of the right row with the
greatest timestamp ≤ the left timestamp within the same key group
(a trade matched to the latest prior quote; a click attributed to the
latest prior campaign touch).

Plan shape — why NOT a join. The naive formulation
(equi-join on key + ``r.ts <= l.ts`` + keep max) explodes to
|L_k| × |R_k| rows per key before pruning: quadratic in the hot keys,
exactly where 100 TB dies. The merge-sorted formulation used here is
linear: UNION both sides tagged, one shuffle+sort on
(key, ts, side-tag), and a running ``last(right_payload, ignorenulls)``
window carries the latest right values forward into each left row.
One exchange, no candidate blowup, AQE-skew-splittable — the same
shape Flink's temporal join and kdb's aj compile to.

Tie semantics: ``inclusive`` — a right row AT the left timestamp
matches (right sorts before left at equal ts). Among right rows that
share (key, ts) exactly, the winner follows ``tiebreak_cols`` order
(last wins); emit only tie-invariant payloads (e.g. the matched ts
itself) if the source can hold exact duplicates and determinism
matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    prefix: str = "asof_",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Backward inclusive as-of join; returns ``left``'s columns plus
    ``{prefix}{right_ts}`` and ``{prefix}{c}`` for each payload column
    (NULL where the key has no right row at or before the left ts).
    """
    carried = [right_ts, *payload_cols]
    # NULL-timestamp or NULL-key right rows can never be an as-of
    # match (SQL ASOF/equi semantics) — and unfiltered they would sort
    # first under asc() and leak their payload into left rows that
    # have no real match.
    usable = right.filter(F.col(right_ts).isNotNull())
    for k in key_cols:
        usable = usable.filter(F.col(k).isNotNull())
    # the carried payload travels as ONE struct: last(ignorenulls)
    # over the struct picks the whole matched row atomically. Per-
    # column fills would patch a matched row's NULL payload cell with
    # a STALE value from an older right row — mixing columns of
    # different rows (right ts=2 with price NULL must yield price
    # NULL, not ts=1's price).
    rt = usable.select(
        *[F.col(k) for k in key_cols],
        F.col(right_ts).alias("_ats"),
        F.lit(1).alias("_is_r"),
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("_rpay"),
        *[F.col(c).alias(f"_r_{c}") for c in (tiebreak_cols or [])],
    )
    lt = left.select(
        "*",
        F.col(left_ts).alias("_ats"),
        F.lit(0).alias("_is_r"),
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    order = [F.col("_ats").asc(), F.col("_is_r").desc()] + [
        F.col(f"_r_{c}").asc_nulls_first() for c in (tiebreak_cols or [])
    ]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last(F.col("_rpay"), ignorenulls=True).over(w)
    filled = unioned.select(
        "*",
        *[matched.getField(c).alias(f"{prefix}{c}") for c in carried],
    )
    drop = ["_ats", "_is_r", "_rpay"] + [
        f"_r_{c}" for c in (tiebreak_cols or [])
    ]
    return filled.filter(F.col("_is_r") == 0).drop(*drop)
