"""Joins with pandas-merge parity (SURVEY.md §2.3 J1-J2).

The reference uses exactly two joins:

- J1 inner equi-join with ``suffixes=['_wiki','_kaggle']``
  (reference ``challenge.py:225``)
- J2 left equi-join attaching a small aggregate (rating histogram)
  (reference ``challenge.py:299``)

pandas suffixes overlapping non-key columns automatically; Spark does
not, so ``join_with_suffixes`` pre-renames the overlap — this keeps
downstream code referring to ``title_wiki`` / ``title_kaggle`` exactly
as the reference does.

Scale posture: the engine never hints what Catalyst+AQE can decide,
except the one case AQE can't know statically — a side the caller
KNOWS stays small (an aggregate of bounded cardinality) is explicitly
``broadcast()`` so the 100 TB fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_with_suffixes(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    suffixes: tuple[str, str] = ("_x", "_y"),
) -> DataFrame:
    """J1: equi-join with pandas suffix semantics.

    Overlapping non-key columns get ``suffixes[0]`` / ``suffixes[1]``
    appended (pandas ``pd.merge`` behavior); key columns appear once.
    """
    keys = [on] if isinstance(on, str) else list(on)
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    lsuf, rsuf = suffixes
    for c in overlap:
        left = left.withColumnRenamed(c, c + lsuf)
        right = right.withColumnRenamed(c, c + rsuf)
    return left.join(right, on=keys, how=how)


def left_join_small(
    fact: DataFrame,
    small: DataFrame,
    on: list[str] | str | None = None,
    condition=None,
    fill_zero: list[str] | None = None,
) -> DataFrame:
    """J2: left-join a bounded-cardinality side, broadcast, then
    zero-fill the attached columns for non-matches (reference
    ``challenge.py:299-302``).

    ``small`` is broadcast explicitly: it is typically an aggregate
    (e.g. per-key histogram) whose row count is bounded by key
    cardinality, not data volume — at 100 TB the fact side streams
    map-side with zero shuffle.
    """
    joined = fact.join(F.broadcast(small), on=on if on is not None else condition, how="left")
    if fill_zero:
        joined = joined.na.fill(0, subset=fill_zero)
    return joined
