"""Deterministic (hash-based) sampling (SURVEY.md §2.8 L2 extension).

The reference samples with ``df.sample(n=5)`` (``Data
Cleaning.ipynb:1320,1590``) — engine-private RNG, so the catalog's
seeded ``random_sample_orders`` is rows-only by necessity. These
operators replace the RNG with public md5 arithmetic: a row is kept
iff the top 60 bits of ``md5(key)``, scaled to U(0,1), fall under the
rate. That buys three properties the RNG path cannot offer:

- **reproducible anywhere** — any engine computes the same md5, so
  the sample is hash-verifiable (full driver oracle, not rows-only);
- **stable under repartitioning** — ``df.sample`` changes membership
  when the partitioning changes (its RNG is seeded per-partition);
  the hash decision depends only on the key, so the same rows are
  sampled on 8 partitions or 80,000;
- **consistent across tables** — sampling two fact tables by the
  same join key yields ALIGNED samples (a kept order keeps all its
  lineitems), the standard trick for sampled join pipelines on
  100 TB warehouses.

Scale shape: a narrow codegen'd filter — no shuffle, no state; at a
5 % rate the downstream pipeline sees 5 % of rows with the filter
evaluated next to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^60 — the hash-to-U(0,1) divisor (15 md5 hex chars = 60 bits, kept
# inside a signed long; same constant as the KMV sketch).
_TWO_60 = float(1 << 60)


def _u01(key: F.Column) -> F.Column:
    """U(0,1) from the top 60 bits of md5(key) — engine-portable."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("double")
        / F.lit(_TWO_60)
    )


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Uniform deterministic sample: keep rows with u01(key) < rate.

    ``key_col`` should be unique (a row id / primary key); duplicate
    keys sample together by design — that is the "consistent across
    tables" property when keying on a join column.
    """
    return df.filter(_u01(F.col(key_col)) < F.lit(float(rate)))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — ``sampleBy`` with the RNG
    replaced by the md5 decision, so per-class downsampling (the
    training-data rebalancing move: keep 100 % of rare classes, 1 % of
    the head class) is reproducible and oracle-verifiable.

    The salt ``strata:key`` decorrelates strata decisions from the
    uniform sampler's: a row sampled at rate r here is NOT the same
    row ``hash_sample`` keeps at rate r.
    """
    rate = F.lit(float(default_rate))
    for stratum, r in rates.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))).otherwise(rate)
    u = _u01(F.concat_ws(":", F.col(strata_col), F.col(key_col).cast("string")))
    return df.filter(u < rate)


def hash_split(
    df: DataFrame,
    key_col: str,
    boundaries: dict[str, float],
    default_label: str = "test",
    out_col: str = "split",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the dataset-split
    step every training pipeline runs, with the RNG replaced by the
    same md5-u01 decision as ``hash_sample``.

    ``boundaries`` maps label → upper bound on u01 in ascending order
    (e.g. ``{"train": 0.8, "val": 0.9}``; the remainder is
    ``default_label``). Properties the RNG split cannot give: the
    assignment is reproducible across engines/runs, stable under
    repartitioning, and keyed — re-running on a grown corpus never
    moves an old document between splits (the leakage-prevention
    property: a doc that was in test stays in test forever).
    ``salt`` decorrelates this decision from other hash samplers on
    the same key. A narrow codegen'd projection; no shuffle.
    """
    u = _u01(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")))
    expr = F.lit(default_label)
    for label, bound in sorted(boundaries.items(), key=lambda kv: -kv[1]):
        expr = F.when(u < F.lit(float(bound)), F.lit(label)).otherwise(expr)
    return df.withColumn(out_col, expr)
