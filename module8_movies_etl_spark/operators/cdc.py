"""Change-data-capture merge (upsert/delete application).

The warehouse MERGE INTO: apply a delta of upserts and deletes to a
base snapshot, producing the next snapshot. The reference's closest
seed is its overwrite-mode load (challenge.py:312-322 replaces the
whole table); this operator is the incremental form a 100 TB pipeline
actually runs — ship only the changed keys, not the table.

Shape: ONE hash shuffle. Base and delta union with a priority tag,
a per-key window keeps the highest-priority row (delta wins), and
delete rows drop after the winner is chosen — so a delete beats the
base row it targets, and an upsert of a new key inserts. This is the
standard engine-agnostic MERGE lowering when the storage layer has no
transactional merge (no Delta/Iceberg dependency); on a real lake the
same plan feeds ``replaceWhere``/partition-overwrite commits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc(
    base: DataFrame,
    delta: DataFrame,
    key_col: str,
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Next snapshot = base ⊕ delta.

    ``delta[op_col]`` is ``'U'`` (upsert: replace-or-insert the row's
    payload) or ``'D'`` (delete the key). Base and delta must share
    the payload schema (minus ``op_col``). Exactly one row per key
    survives; a key present only in the delta as 'U' inserts, as 'D'
    is a no-op.

    Multi-row-per-key deltas: pass ``seq_col`` (a delta sequence
    number / LSN) and the HIGHEST sequence wins — the standard CDC
    log-compaction rule; equal sequences tie-break deterministically
    (deletes beat upserts, then lowest payload hash). Without
    ``seq_col`` the contract is one delta row per key; if violated,
    the survivor follows the same deterministic tie-break, never
    run-to-run random, but it is a tie-break, not log order.
    """
    payload = [c for c in base.columns]
    tagged_base = base.select(*payload).withColumn("_op", F.lit("B")).withColumn(
        "_prio", F.lit(0)
    )
    delta_cols = [F.col(c) for c in payload] + [F.col(op_col).alias("_op")]
    if seq_col is not None:
        delta_cols.append(F.col(seq_col).cast("long").alias("_seq"))
    tagged_delta = delta.select(*delta_cols).withColumn("_prio", F.lit(1))
    if seq_col is not None:
        tagged_base = tagged_base.withColumn("_seq", F.lit(None).cast("long"))
        # equal-sequence delta rows for the same key fall through to
        # the same deterministic tie-break as the no-seq path (deletes
        # beat upserts, then lowest payload hash) — never row_number's
        # partition-order whim.
        order = [
            F.desc("_prio"),
            F.desc_nulls_last("_seq"),
            F.asc("_op"),
            F.asc(F.hash(*payload)),
        ]
    else:
        order = [F.desc("_prio"), F.asc("_op"), F.asc(F.hash(*payload))]
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        tagged_base.unionByName(tagged_delta)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("_op") != "D"))
        .select(*payload)
    )


def refresh_grouped_mv(
    base: DataFrame,
    delta: DataFrame,
    group_col: str,
    agg_exprs: dict[str, Column],
    merge_exprs: dict[str, Column],
) -> DataFrame:
    """Incrementally maintain a grouped materialized view: aggregate
    the delta alone, union its PARTIAL aggregates with the base MV,
    and re-aggregate — never rescan the base fact table.

    This is the map-side-combine principle lifted to pipeline level:
    any commutative-monoid measure (count, sum, min, max, and
    mergeable sketches like the engine's KMV/CMS) refreshes in
    O(|delta| + |groups|) instead of O(|base|). ``agg_exprs`` builds
    the delta's partials (name → aggregate over fact columns);
    ``merge_exprs`` folds partials (name → aggregate over the SAME
    names: sum of counts, sum of sums, min of mins). For exact
    cross-engine sums, aggregate DECIMAL (order-independent addition)
    — the catalog query does.
    """
    delta_mv = delta.groupBy(group_col).agg(
        *[c.alias(n) for n, c in agg_exprs.items()]
    )
    return (
        base.unionByName(delta_mv)
        .groupBy(group_col)
        .agg(*[c.alias(n) for n, c in merge_exprs.items()])
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: compress a change
    stream into validity intervals per key.

    Consecutive rows with the same ``state_col`` value collapse into
    one interval ``[valid_from, valid_to)``; the current state carries
    ``valid_to = NULL``. Classic gaps-and-islands: a lag marks state
    changes, a running sum numbers the islands, one aggregate per
    (key, island) takes the interval start, and a lead stitches each
    island's end to the next start. All three windows and the
    aggregate share the SAME key partitioning — one shuffle serves the
    whole operator, and keys process independently, so 100 TB of
    history scales with the key count, not the row count per executor.

    ``tie_col`` must make (ts_col, tie_col) a total order per key —
    equal timestamps otherwise leave island numbering engine-defined.
    ``ts_col`` must be integer-comparable (epoch micros); the caller
    converts (tz-repr discipline, see plans/benchmark_queries docs).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    prev = F.lag(state_col).over(w)
    chg = F.when(prev.isNull() | (prev != F.col(state_col)), 1).otherwise(0)
    seg = (
        F.sum(chg)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
    )
    islands = df.select(
        F.col(key_col), F.col(state_col), F.col(ts_col), F.col(tie_col)
    ).withColumn("seg", seg)
    g = islands.groupBy(key_col, "seg").agg(
        F.max(state_col).alias(state_col),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("seg")
    return g.select(
        key_col,
        "seg",
        state_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


def refresh_join_mv(
    mv: DataFrame,
    base_fact: DataFrame,
    delta: DataFrame,
    dim: DataFrame,
    fact_key: str,
    join_key_fact: str,
    join_key_dim: str,
    group_col: str,
    sum_cols: dict[str, str],
    count_name: str = "n_rows",
    op_col: str = "op",
) -> DataFrame:
    """Incrementally maintain a JOIN materialized view
    (``fact ⋈ dim`` grouped by a dim attribute) under a CDC batch of
    fact upserts/deletes — the delta-join rule ΔMV = Δfact ⋈ dim,
    with SIGNED rows so updates and deletes retract their old
    contribution:

    - every changed key's OLD fact row (fetched by ONE key-join
      against the base — prunable by layout, never a re-aggregate)
      enters with sign −1;
    - every 'U' delta row enters with sign +1 ('D' contributes only
      the retraction);
    - the signed stream joins the (broadcast) dim once, aggregates to
      group grain, and MERGES into the MV by addition; groups whose
      maintained row count reaches 0 are dropped, so the result is
      row-identical to a full recompute over the post-CDC snapshot.

    Works for the signed-delta-maintainable measures (counts and
    sums — pass exact integer columns for hash-stable results);
    min/max are NOT maintainable this way (a deleted extremum needs
    a rescan — the classic restriction, out of contract here).
    Cost: O(|Δ| + base-rows-for-changed-keys + |groups|) vs the full
    recompute's O(|base|).

    ``sum_cols`` maps MV measure name → fact column. ``mv`` must
    carry ``group_col``, every measure name, and ``count_name``.
    One delta row per key (the ``apply_cdc`` no-seq contract).
    """
    changed_keys = delta.select(F.col(fact_key)).distinct()
    old = base_fact.join(changed_keys, fact_key, "semi").withColumn(
        "_sign", F.lit(-1)
    )
    new = delta.filter(F.col(op_col) == "U").drop(op_col).withColumn(
        "_sign", F.lit(1)
    )
    signed = old.unionByName(new)
    d_aggs = [
        F.sum(F.col("_sign") * F.col(src)).alias(f"_d_{name}")
        for name, src in sum_cols.items()
    ] + [F.sum("_sign").alias("_d_n")]
    deltas = (
        signed.join(
            F.broadcast(dim),
            F.col(join_key_fact) == F.col(join_key_dim),
        )
        .groupBy(group_col)
        .agg(*d_aggs)
    )
    merged = mv.join(deltas, group_col, "full_outer").select(
        group_col,
        *[
            (
                F.coalesce(F.col(name), F.lit(0))
                + F.coalesce(F.col(f"_d_{name}"), F.lit(0))
            ).alias(name)
            for name in sum_cols
        ],
        (
            F.coalesce(F.col(count_name), F.lit(0))
            + F.coalesce(F.col("_d_n"), F.lit(0))
        ).alias(count_name),
    )
    return merged.filter(F.col(count_name) > 0)
