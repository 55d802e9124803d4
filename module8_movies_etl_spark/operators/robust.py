"""Robust statistics: percentile clipping and rank bucketing.

Training-data and analytics pipelines routinely clip heavy-tailed
numeric features before aggregation (winsorization) and bucket
entities into quantile bands (deciles) for cohorting and rebalancing.
Both are thin compositions of exact percentile aggregates and rank
windows — no UDFs, everything JVM-side — and both replay exactly in
ANSI SQL (``quantile_cont`` / ``NTILE``), so the driver hash-verifies
them end to end.

Reference seed: the exploratory notebook's distribution QA
(``Data Cleaning.ipynb:5612-5613`` — describe/hist before trusting a
column) is the manual form of this; winsorize/deciles are the
productionized, scale-safe versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` to its exact [lo, hi] percentile band.

    The thresholds are ONE exact-percentile aggregate (a single scalar
    row — ``percentile`` uses the same linear interpolation as ANSI
    ``quantile_cont``, parity pinned by ``quantiles_by_status``),
    broadcast back over the table with a cross join. At 100 TB the
    threshold pass is a full scan but reduces to 16 bytes; the clip
    itself is a narrow projection. Thresholds are rounded to 4 decimals
    on BOTH engine and oracle sides so a last-ulp interpolation
    difference can never flip a comparison at the clip boundary.

    NULL inputs stay NULL: clipping is guarded by an explicit
    ``isNull`` check because ``greatest``/``least`` SKIP null
    arguments (in Spark and DuckDB alike) — a bare
    ``least(greatest(v, lo), hi)`` would fabricate the lower
    percentile bound for every missing value.
    """
    out_col = out_col or f"{value_col}_w"
    v = F.col(value_col).cast("double")
    bounds = df.agg(
        F.round(F.percentile(v, F.lit(lo)), 4).alias("_lo"),
        F.round(F.percentile(v, F.lit(hi)), 4).alias("_hi"),
    )
    clipped = F.when(
        v.isNull(), F.lit(None).cast("double")
    ).otherwise(F.least(F.greatest(v, F.col("_lo")), F.col("_hi")))
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, clipped)
        .drop("_lo", "_hi")
    )


def global_rank(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    ascending: bool = False,
    out_col: str = "rank0",
    num_partitions: int | None = None,
    payload_cols: list[str] | None = None,
) -> tuple[DataFrame, int]:
    """DISTRIBUTED global rank over a deterministic total order
    (``value_col`` asc/desc, ``tie_col`` asc — the tie column must be
    unique so engines cannot disagree on equal values). Returns
    ``(frame + 0-based rank column, total row count)`` — never a
    single-partition window. The classic assembly:

    1. ``repartitionByRange`` on the order + sort within partitions —
       a single range shuffle; partition p holds a contiguous rank
       slab.
    2. ``monotonically_increasing_id`` bakes (partition, local row
       index) into the data; the frame is snapshotted so both
       consumers below read ONE materialization (ids are stable data,
       not recomputable lineage).
    3. One bounded aggregate — one row PER PARTITION — is collected
       as the rank offset of each slab (the only driver fetch:
       ``num_partitions`` longs).
    4. ``rank = offset[pid] + local_index``.

    The rank depends only on the total order, not on where the range
    sampler drew its boundaries, so results are
    partitioning-independent and hash-stable. Cost: one full shuffle
    + sort + snapshot write of the input — the honest price of a
    global rank, and it scales (every stage is per-partition work; no
    unpartitioned window, no guard, no raise at any size).

    NOTE: builds EAGERLY (the snapshot + offset fetch run at call
    time). Callers passing an expensive un-materialized lineage pay
    it once here; the returned frame reads the snapshot.

    ``payload_cols`` limits which input columns survive into the
    snapshot and the output (default: all). The order columns are
    still consumed by the range shuffle + sort, but a caller that
    only needs the value (gini, lorenz, deciles aggregate away the
    tie key immediately) should not pay to WRITE the rest of the row
    through the materialization — at 100 TB the snapshot volume is
    the dominant cost of this operator.
    """
    from ..sources.scratch import snapshot

    cols = list(payload_cols) if payload_cols is not None else list(df.columns)
    sess = df.sparkSession
    p_n = num_partitions or int(
        sess.conf.get("spark.sql.shuffle.partitions", "32")
    )
    vcol = F.col(value_col).asc() if ascending else F.col(value_col).desc()
    order = [vcol, F.col(tie_col).asc()]
    staged = snapshot(
        df.repartitionByRange(p_n, *order)
        .sortWithinPartitions(*order)
        .withColumn("_qb_mid", F.monotonically_increasing_id())
        # projection AFTER the id bake: row order within partitions is
        # preserved, only the written payload narrows
        .select(*cols, "_qb_mid"),
        prefix="grank_",
        rebalance=False,  # keep the sorted slab layout in the files
    )
    pid = F.shiftright(F.col("_qb_mid"), 33)
    local = F.col("_qb_mid").bitwiseAND(F.lit((1 << 33) - 1))
    slabs = {
        r["_pid"]: r["_c"]
        for r in staged.groupBy(pid.alias("_pid"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    }
    max_pid = max(slabs) if slabs else -1
    offsets, acc = [], 0
    for p in range(max_pid + 1):
        offsets.append(acc)
        acc += slabs.get(p, 0)
    total = acc
    if len(offsets) <= 256:
        # small partition counts: the offset table rides inline as a
        # literal array — no extra join
        off_arr = F.array(*[F.lit(o).cast("long") for o in (offsets or [0])])
        rank0 = F.element_at(off_arr, (pid + 1).cast("int")) + local
        return staged.select(*cols, rank0.alias(out_col)), total
    # cluster-scale partition counts: a literal array of 10k+ offsets
    # explodes the codegen'd expression tree, so ship the offsets as
    # a broadcast 2-column frame and join on the partition id instead
    # (one row per partition — always broadcastable)
    off_df = sess.createDataFrame(
        [(p, o) for p, o in enumerate(offsets)], "_qb_pid long, _qb_off long"
    )
    joined = staged.withColumn("_qb_pid", pid).join(
        F.broadcast(off_df), "_qb_pid"
    )
    return (
        joined.select(
            *cols, (F.col("_qb_off") + local).alias(out_col)
        ),
        total,
    )


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    n: int = 10,
    out_col: str = "bucket",
    num_partitions: int | None = None,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Assign each row its ``NTILE(n)`` bucket over a deterministic
    total order (``value_col`` desc, ``tie_col`` asc) — rank
    arithmetic on the DISTRIBUTED ``global_rank``, never a
    single-partition window.

    NTILE is rank arithmetic, not value interpolation: with N rows
    the first ``N mod n`` buckets hold ``ceil(N/n)`` rows and the
    rest ``floor(N/n)`` (SQL standard, identical across engines), so
    the bucket of a row is a pure function of its 0-based global rank
    ``r`` and ``N``; the formula is exact integer arithmetic
    (``(a − a mod q)/q`` keeps the division representable —
    quotients ≤ N < 2^53). Eager-build and scale notes: see
    ``global_rank``.
    """
    cols = list(payload_cols) if payload_cols is not None else list(df.columns)
    staged, total = global_rank(
        df,
        value_col,
        tie_col,
        ascending=False,
        out_col="_qb_rank0",
        num_partitions=num_partitions,
        payload_cols=cols,
    )
    rank0 = F.col("_qb_rank0")

    def _idiv(a, q: int):
        # exact integer floor-division of a nonneg long by a python
        # int: (a - a % q) / q — numerator an exact multiple ≤ 2^53
        return ((a - a % F.lit(q)) / F.lit(q)).cast("long")

    q, rem = divmod(total, n)
    if rem == 0:
        bucket = _idiv(rank0, max(q, 1)) + 1
    else:
        threshold = rem * (q + 1)
        bucket = F.when(
            rank0 < F.lit(threshold), _idiv(rank0, q + 1) + 1
        ).otherwise(F.lit(rem) + _idiv(rank0 - F.lit(threshold), max(q, 1)) + 1)
    return staged.select(*cols, bucket.cast("long").alias(out_col))


def equidepth_histogram(
    df: DataFrame, value_col: str, n_bins: int = 8
) -> DataFrame:
    """Equi-DEPTH histogram: bin edges are the exact ``i/n`` quantiles
    (so each bin holds ~the same row count), the complement of the
    equi-width ``aggregates.histogram``. Heavy-tailed columns render
    uselessly in equi-width bins (one bar + a tail of empties);
    equi-depth is what query optimizers and data profilers actually
    keep, and the per-bin count deviation from N/n is a direct skew
    diagnostic.

    Shape: ONE exact-percentile aggregate produces all n+1 edges as an
    array (single scalar row, broadcast back); bin assignment is a
    rounded-edge comparison folded into a second scan's projection —
    two fact passes total, no sort of the fact table (the percentile
    aggregate holds per-partition heaps, not a global order). Edges
    are rounded(4) on BOTH engines so interpolation ulps can't move a
    boundary row; assignment uses right-closed intervals
    (lo, hi] with bin 1 left-closed, replayed identically in SQL.

    NULL values are EXCLUDED from the histogram (they are in no
    (lo, hi] interval; the percentile aggregate already ignores them
    when computing edges) — without the explicit filter the NULL
    comparison fold would collapse to bin 1 via ``greatest`` null
    skipping and silently inflate the first bin's count.
    """
    v = F.col(value_col).cast("double")
    qs = [i / n_bins for i in range(n_bins + 1)]
    edges = df.agg(
        F.transform(
            F.percentile(v, F.array(*[F.lit(q) for q in qs])),
            lambda e: F.round(e, 4),
        ).alias("_edges")
    )
    binned = df.filter(v.isNotNull()).crossJoin(F.broadcast(edges)).select(
        # rightmost edge whose value is strictly below v, +1 -> the
        # right-closed (lo, hi] bin index; clamp v == min into bin 1
        F.greatest(
            F.aggregate(
                F.slice(F.col("_edges"), 1, n_bins),
                F.lit(0),
                lambda acc, e: acc + (v > e).cast("int"),
            ),
            F.lit(1),
        ).alias("bin"),
        F.col("_edges"),
    )
    return (
        binned.groupBy("bin", "_edges")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.element_at(F.col("_edges"), F.col("bin").cast("int")).alias("lo"),
            F.element_at(F.col("_edges"), F.col("bin").cast("int") + 1).alias("hi"),
            "n_rows",
        )
    )


def skyline_2d(
    df: DataFrame,
    key_col: str,
    x_col,
    y_col,
    id_col: str,
) -> DataFrame:
    """Per-key 2D SKYLINE (Pareto frontier, minimize both axes): a row
    survives iff no other row of the key has x ≤ AND y ≤ with at least
    one strict — the classic SKYLINE OF operator, lowered to two
    window minima instead of the textbook O(n²) dominance self-join.

    ``x_col``/``y_col`` must be integer-comparable Column expressions
    (cents-scaled money, epoch days): dominance tests are then exact
    in any engine, and "strictly smaller x" is the RANGE frame
    ``(-∞, -1]`` on x.

    A row is dominated iff ``min(y | x' < x) ≤ y`` (someone strictly
    cheaper is also no-later) or ``min(y | x' = x) < y`` (an equal-x
    row is strictly earlier). Exact (x, y) duplicates tie — all kept,
    per skyline semantics. One key shuffle serves both frames.

    Rows with a NULL coordinate are EXCLUDED up front (dominance is
    undefined against a missing axis) — explicitly, because leaving
    them in would let the NULL dominance predicate drop them silently
    through ``filter`` three-valued logic, which reads like data
    loss rather than a rule.

    Returns the surviving rows: (key, id, x, y).
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("_id"),
        x_col.cast("long").alias("_x"),
        y_col.cast("long").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    wlt = (
        Window.partitionBy("_k")
        .orderBy("_x")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    weq = Window.partitionBy("_k", "_x")
    min_y_cheaper = F.min("_y").over(wlt)
    min_y_equal = F.min("_y").over(weq)
    dominated = (
        min_y_cheaper.isNotNull() & (min_y_cheaper <= F.col("_y"))
    ) | (min_y_equal < F.col("_y"))
    return (
        base.withColumn("_dom", dominated)
        .filter(~F.col("_dom"))
        .select(
            F.col("_k").alias(key_col),
            F.col("_id").alias(id_col),
            F.col("_x").alias("x"),
            F.col("_y").alias("y"),
        )
    )


def woe_iv_table(
    df: DataFrame,
    value_col: str,
    label_col,
    n_bins: int = 8,
) -> DataFrame:
    """Weight-of-Evidence / Information-Value table: the supervised
    twin of ``equidepth_histogram`` and the classic credit-scoring /
    feature-screening binning. The value column is cut at its exact
    i/n quantiles; per bin, WOE = ln of the smoothed positive-rate
    share over the negative-rate share, and IV = Σ (p%−n%)·WOE —
    the single-number "does this feature separate the classes"
    screen (IV < 0.02 ≈ useless, > 0.3 ≈ strong).

    ``label_col`` is a boolean Column expression (the "positive"
    event). Laplace +0.5 smoothing keeps empty cells finite — the
    standard WOE fix, and what makes every bin's WOE defined even
    when a class is absent from it.

    Determinism: bin populations are exact integer counts; WOE is
    rounded(6) on emission; each IV term multiplies the exact-ratio
    double by the ROUNDED WOE, is rounded(8) and summed as DECIMAL —
    order-independent, so the one IV number hash-verifies. Shape:
    one percentile aggregate (all edges in a single broadcast row) +
    one counting aggregate over (bin) — two fact passes, no sort,
    mirror of ``equidepth_histogram``.
    """
    v = F.col(value_col).cast("double")
    y = label_col.cast("int")
    qs = [i / n_bins for i in range(n_bins + 1)]
    edges = df.agg(
        F.transform(
            F.percentile(v, F.array(*[F.lit(q) for q in qs])),
            lambda e: F.round(e, 4),
        ).alias("_edges")
    )
    binned = df.filter(v.isNotNull()).crossJoin(F.broadcast(edges)).select(
        F.greatest(
            F.aggregate(
                F.slice(F.col("_edges"), 1, n_bins),
                F.lit(0),
                lambda acc, e: acc + (v > e).cast("int"),
            ),
            F.lit(1),
        ).alias("bin"),
        F.col("_edges"),
        y.alias("_y"),
    )
    cells = binned.groupBy("bin", "_edges").agg(
        F.sum("_y").alias("n_pos"),
        F.sum(F.lit(1) - F.col("_y")).alias("n_neg"),
    )
    from ..sources.scratch import snapshot

    # Snapshot the n_bins-row cell table BEFORE deriving totals/terms:
    # every later consumer (totals, WOE, IV) then reads n_bins rows
    # instead of re-running the two fact passes per consumer.
    cells = snapshot(cells, prefix="woe_cells_")
    tot = cells.agg(
        F.sum("n_pos").alias("_tp"), F.sum("n_neg").alias("_tn")
    )
    g = F.col("n_pos").cast("double") + F.lit(0.5)
    b = F.col("n_neg").cast("double") + F.lit(0.5)
    tp = F.col("_tp").cast("double") + F.lit(0.5) * n_bins
    tn = F.col("_tn").cast("double") + F.lit(0.5) * n_bins
    woe = F.round(F.log((g / tp) / (b / tn)), 6)
    scored = cells.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("long").alias("bin"),
        F.element_at(F.col("_edges"), F.col("bin").cast("int")).alias("lo"),
        F.element_at(F.col("_edges"), F.col("bin").cast("int") + 1).alias("hi"),
        "n_pos",
        "n_neg",
        woe.alias("woe"),
        F.round(
            (
                F.col("n_pos").cast("double") / F.col("_tp").cast("double")
                - F.col("n_neg").cast("double") / F.col("_tn").cast("double")
            )
            * woe,
            8,
        )
        .cast("decimal(18,8)")
        .alias("_term"),
    )
    iv = scored.agg(
        F.round(F.sum("_term").cast("double"), 6).alias("iv_total")
    )
    return scored.crossJoin(F.broadcast(iv)).select(
        "bin", "lo", "hi", "n_pos", "n_neg", "woe", "iv_total"
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    baseline_cond,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index: the standard model-monitoring
    drift score between a BASELINE slice and the current rest —
    PSI = Σ_bins (p_cur − p_base)·ln(p_cur / p_base) over deciles cut
    from the BASELINE distribution (the PSI convention: the reference
    period owns the bins; current-period outliers clamp into the edge
    bins). Rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25
    shifted.

    ``baseline_cond`` is a boolean Column selecting the reference
    slice. Laplace +0.5 smoothing keeps empty cells finite (a bin the
    current period abandoned still contributes a finite term).

    Determinism mirrors ``woe_iv_table``: exact integer bin counts,
    ln rounded(6), each term (p_cur − p_base)·ln rounded(8) and
    summed as DECIMAL — order-independent, so the one PSI number
    hash-verifies. Shape: one percentile aggregate over the baseline
    (all edges in one broadcast row) + one counting aggregate over
    (bin) — two fact passes, no sort. PSI terms are non-negative by
    construction ((p_cur − p_base) and ln share sign), so the total
    is monotone in drift.
    """
    v = F.col(value_col).cast("double")
    is_base = baseline_cond.cast("int")
    qs = [i / n_bins for i in range(n_bins + 1)]
    edges = df.filter(baseline_cond & v.isNotNull()).agg(
        F.transform(
            F.percentile(v, F.array(*[F.lit(q) for q in qs])),
            lambda e: F.round(e, 4),
        ).alias("_edges")
    )
    binned = df.filter(v.isNotNull()).crossJoin(F.broadcast(edges)).select(
        F.greatest(
            F.aggregate(
                F.slice(F.col("_edges"), 1, n_bins),
                F.lit(0),
                lambda acc, e: acc + (v > e).cast("int"),
            ),
            F.lit(1),
        ).alias("bin"),
        F.col("_edges"),
        is_base.alias("_b"),
    )
    cells = binned.groupBy("bin", "_edges").agg(
        F.sum("_b").alias("n_base"),
        F.sum(F.lit(1) - F.col("_b")).alias("n_cur"),
    )
    from ..sources.scratch import snapshot

    cells = snapshot(cells, prefix="psi_cells_")
    tot = cells.agg(
        F.sum("n_base").alias("_tb"), F.sum("n_cur").alias("_tc")
    )
    pb = (F.col("n_base").cast("double") + F.lit(0.5)) / (
        F.col("_tb").cast("double") + F.lit(0.5) * n_bins
    )
    pc = (F.col("n_cur").cast("double") + F.lit(0.5)) / (
        F.col("_tc").cast("double") + F.lit(0.5) * n_bins
    )
    lnr = F.round(F.log(pc / pb), 6)
    scored = cells.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("long").alias("bin"),
        F.element_at(F.col("_edges"), F.col("bin").cast("int")).alias("lo"),
        F.element_at(
            F.col("_edges"), F.col("bin").cast("int") + 1
        ).alias("hi"),
        F.col("n_base").cast("long").alias("n_base"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round((pc - pb) * lnr, 8).cast("decimal(18,8)").alias("_term"),
    )
    psi = scored.agg(
        F.round(F.sum("_term").cast("double"), 6).alias("psi_total")
    )
    return scored.crossJoin(F.broadcast(psi)).select(
        "bin",
        "lo",
        "hi",
        "n_base",
        "n_cur",
        F.col("_term").cast("double").alias("psi_contrib"),
        "psi_total",
    )
