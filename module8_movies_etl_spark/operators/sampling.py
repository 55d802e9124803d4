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


def weighted_sample_es(
    df: DataFrame,
    key_col: str,
    weight_col,
    group_col: str | None = None,
    n: int = 20,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis–Spirakis
    (2006), md5-deterministic and libm-free: rank rows by a random key
    whose distribution is ``P(key ≤ t) = t^w`` and keep the top-n —
    exactly equivalent to successive draws with probability ∝ weight.

    The textbook key is ``u^{1/w}`` (or ``-ln(u)/w``) — both route
    through pow/ln, whose last-ulp variance across libm
    implementations could flip a rank at the cut boundary. For INTEGER
    weights there is an exact alternative: the max of ``w``
    independent uniforms has CDF ``t^w``, so
    ``key = max_{i=1..w} u01(md5(id, i))`` gives the same distribution
    in pure md5 + comparison arithmetic — reproducible bit-for-bit in
    any engine, stable under repartitioning (depends only on the id),
    and consistent as the corpus grows.

    ``weight_col`` must be a positive INTEGER column (cap it — the
    fan-out is Σw rows; quality scores 1..10 are the intended shape).

    Scale shape: a map-side ``sequence``/``explode`` fan-out into one
    (id)-keyed max-aggregate, then a per-group top-n WindowGroupLimit
    — the same two-exchange shape as any grouped top-k.

    Returns the sampled rows: (group, key, weight, es_key) with
    ``es_key`` exposed so callers can audit the draw.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(key_col).alias("_id"),
        (F.col(weight_col) if isinstance(weight_col, str) else weight_col)
        .cast("int")
        .alias("_w"),
        *([F.col(group_col).alias("_g")] if group_col else []),
    ).filter(F.col("_w") >= 1)
    fan = base.select(
        "_id",
        "_w",
        *(["_g"] if group_col else []),
        F.explode(F.sequence(F.lit(1), F.col("_w"))).alias("_i"),
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.col("_id").cast("string"), F.col("_i"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("double") / F.lit(float(1 << 60))
    keyed = fan.withColumn("_u", u).groupBy(
        "_id", "_w", *(["_g"] if group_col else [])
    ).agg(F.max("_u").alias("_key"))
    part = [F.col("_g")] if group_col else [F.lit(1)]
    wr = Window.partitionBy(*part).orderBy(F.desc("_key"), F.asc("_id"))
    out = keyed.withColumn("_r", F.row_number().over(wr)).filter(
        F.col("_r") <= n
    )
    cols = [F.col("_id").alias(key_col), F.col("_w").alias("weight"),
            F.col("_key").alias("es_key")]
    if group_col:
        cols.insert(0, F.col("_g").alias(group_col))
    return out.select(*cols)
