"""Time-series operators: rolling-window statistics and OHLC
resampling (SURVEY.md §2.10/§2.13 extensions beside the as-of and
range joins in ``asof.py`` / ``rangejoin.py``).

The reference has no time-series surface beyond raw unix timestamps
(challenge.py:289-291 keeps ratings timestamps as seconds); these are
the event-stream analytics a 100 TB pipeline runs on its telemetry
tables.

Cross-engine exactness: rolling sums CAST to DECIMAL before
aggregating — decimal addition is exact and order-independent, so the
result is identical no matter how the engine associates the frame sum
(Spark's running window vs DuckDB's segment tree would disagree in
the last ulp on raw doubles). OHLC picks open/close by deterministic
(ts, id) order and min/max never sum — exact on doubles.

Epoch-bucket convention: every operator buckets with FLOOR division
of epoch seconds (engine-side ``F.floor``), and the DuckDB oracles
use integer ``//`` (which truncates toward zero) — identical on the
SUPPORTED domain of non-negative epochs (post-1970 timestamps). A
corpus with pre-1970 event times would need the oracles rewritten
with an explicit floor-mod; the engine side is already
floor-consistent across all operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_window_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    frame: int = 5,
) -> DataFrame:
    """Per-key rolling stats over the last ``frame`` rows ordered by
    (ts, id): exact decimal rolling sum, row count, and their mean.

    Scale shape: ONE hash shuffle on the key + a per-partition sort;
    the rows-frame window is a streaming pass (no O(frame) re-scan per
    row for sum/count). Keys are independent, so a 1000-executor
    cluster partitions cleanly; skewed keys split via AQE.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-(frame - 1), 0)
    )
    dec = F.col(value_col).cast("decimal(28,6)")
    roll_sum = F.sum(dec).over(w).cast("double")
    roll_n = F.count(F.lit(1)).over(w)
    # the mean divides by the NON-NULL count so its null semantics
    # match the null-skipping sum (count(1) would deflate the mean
    # whenever the frame holds NULL values); roll_n stays the frame's
    # row count — both facts are useful, they are different facts
    roll_nn = F.count(dec).over(w)
    return df.select(
        F.col(id_col),
        F.col(key_col),
        roll_sum.alias("roll_sum"),
        roll_n.alias("roll_n"),
        F.round(roll_sum / roll_nn.cast("double"), 4).alias("roll_avg"),
    )


def transition_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
) -> DataFrame:
    """(from_type, to_type, n): first-order transition counts between
    consecutive events of each key, ordered by (ts, id) — the Markov
    view of user behavior (what follows what). One lag window + one
    count aggregation; the window's key shuffle is the only wide op
    (the final count re-shuffles on the tiny type-pair domain).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    return (
        df.select(
            F.lag(type_col, 1).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    cohort_type: str,
    type_col: str,
    bucket_seconds: int = 7 * 86400,
) -> DataFrame:
    """(cohort_w, offset_w, n_users): classic cohort-retention grid —
    users bucketed by their first ``cohort_type`` event's week, counted
    as active in each later week offset (distinct users per cell).

    Shape: one user-keyed aggregation for cohort assignment, joined
    back onto the user's activity (both sides user-keyed → aligned
    partitioning), then a distinct-count on the small cohort grid.
    Weeks are integer epoch-bucket arithmetic — exact in any engine.
    """
    e = df.select(
        F.col(key_col),
        F.col(type_col).alias("_t"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long").alias("_w"),
    )
    cohorts = (
        e.filter(F.col("_t") == cohort_type)
        .groupBy(key_col)
        .agg(F.min("_w").alias("cohort_w"))
    )
    return (
        e.join(cohorts, key_col)
        .filter(F.col("_w") >= F.col("cohort_w"))
        .select(key_col, "cohort_w", (F.col("_w") - F.col("cohort_w")).alias("offset_w"))
        .distinct()
        .groupBy("cohort_w", "offset_w")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest time each
    stage was reached STRICTLY AFTER the previous stage, and the
    number of stages completed.

    Stage k's timestamp is ``min(ts | type = stages[k], ts >
    t_{k-1})`` — the standard strict-sequence conversion funnel. Each
    stage is one conditional aggregation keyed on the user: stage
    k+1's aggregation joins stage k's result on the user key, so all
    joins and aggs share the same hash partitioning (AQE coalesces
    the aligned exchanges; no broadcast needed — both sides are
    user-cardinality).

    Emits epoch seconds (``_s`` columns, NULL where the funnel
    stopped) plus ``stage_reached`` — engine-portable integers.
    """
    ev = df.select(
        F.col(user_col),
        F.col(type_col).alias("_t"),
        F.unix_timestamp(F.col(ts_col)).alias("_e"),
    )
    cur = ev.filter(F.col("_t") == stages[0]).groupBy(user_col).agg(
        F.min("_e").alias(f"t_{stages[0]}_s")
    )
    prev_col = f"t_{stages[0]}_s"
    for st in stages[1:]:
        nxt = (
            ev.filter(F.col("_t") == st)
            .join(cur.select(user_col, prev_col), user_col)
            .filter(F.col("_e") > F.col(prev_col))
            .groupBy(user_col)
            .agg(F.min("_e").alias(f"t_{st}_s"))
        )
        cur = cur.join(nxt, user_col, "left")
        prev_col = f"t_{st}_s"
    stage_cols = [f"t_{st}_s" for st in stages]
    reached = sum(
        (F.col(c).isNotNull().cast("int") for c in stage_cols), F.lit(0)
    )
    return cur.select(user_col, *stage_cols, reached.alias("stage_reached"))


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Densify a per-key time series: every bucket between each key's
    first and last event exists in the output — empty buckets get
    ``n_events = 0`` and carry the last observed bucket-sum forward
    (``value_ff``; the standard gap-fill + LOCF resample that feeds
    charting and feature windows, where a missing hour must mean
    "zero happened", not "row absent").

    Shape: (1) one hash aggregate → per-(key, bucket) counts/sums,
    SNAPSHOT to scratch at the stage boundary: the spine derivation
    AND the final join both consume it, and without the snapshot each
    re-derives it from the fact scan (two full corpus passes at
    100 TB; the snapshot is bucket-grain — trivially small); (2) per-
    key min/max bucket → ``sequence()`` + ``explode`` builds the
    dense spine WITHOUT a driver loop or a range table — the spine's
    row count is sum over keys of each key's span, generated
    executor-side; (3) one left join spine←actuals on (key, bucket) —
    both sides are bucket-grain (already reduced), so the join is on
    aggregate-sized data, never the fact table; (4) LOCF is a
    ``last(ignorenulls)`` running window per key — one shuffle that
    AQE aligns with the spine's partitioning. Sums are DECIMAL-exact
    before the double cast, so engines can't disagree in the last ulp.
    """
    from pyspark.sql import Window

    from ..sources.scratch import snapshot

    b = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
        * bucket_seconds
    )
    actual = snapshot(
        df.select(F.col(key_col), b.alias("bucket_s"),
                  F.col(value_col).cast("decimal(28,6)").alias("_v"))
        .groupBy(key_col, "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_v").alias("_vsum"),
        ),
        prefix="gapfill_buckets_",
    )
    spine = (
        actual.groupBy(key_col)
        .agg(F.min("bucket_s").alias("_lo"), F.max("bucket_s").alias("_hi"))
        .select(
            key_col,
            F.explode(
                F.sequence(
                    F.col("_lo"), F.col("_hi"), F.lit(int(bucket_seconds))
                )
            ).alias("bucket_s"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = spine.join(actual, [key_col, "bucket_s"], "left")
    return joined.select(
        F.col(key_col),
        F.col("bucket_s"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.last(F.col("_vsum"), ignorenulls=True)
        .over(w)
        .cast("double")
        .alias("value_ff"),
    )


def ohlc_resample(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    id_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Downsample an event stream into per-(bucket, key) OHLC bars:
    open/close (first/last value by (ts, id) order), high/low
    (max/min), volume (count).

    Implementation: one window pass assigns ascending and descending
    row numbers within each (bucket, key) cell (same partitioning,
    two sort orders → one shuffle, two local sorts), then a hash
    aggregation picks the endpoints with ``max(when(rn=1, value))``
    and folds high/low/volume map-side. No self-join, no collect.
    """
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
        * bucket_seconds
    ).alias("bucket_s")
    base = df.select(
        bucket, F.col(key_col), F.col(ts_col), F.col(id_col), F.col(value_col)
    )
    asc = Window.partitionBy("bucket_s", key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    desc = Window.partitionBy("bucket_s", key_col).orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    ranked = base.select(
        "bucket_s",
        key_col,
        value_col,
        F.row_number().over(asc).alias("_ra"),
        F.row_number().over(desc).alias("_rd"),
    )
    return ranked.groupBy("bucket_s", key_col).agg(
        F.max(F.when(F.col("_ra") == 1, F.col(value_col))).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max(F.when(F.col("_rd") == 1, F.col(value_col))).alias("close"),
        F.count(F.lit(1)).alias("volume"),
    )


def cusum_drift(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
    h_mult: float = 2.0,
) -> DataFrame:
    """One-sided CUSUM change-point detection per key over bucketed
    sums: the standard drift alarm ("has this metric shifted above
    its baseline?") that mean/threshold monitors miss because small
    persistent shifts never cross a static fence but accumulate.

    The textbook recurrence S_i = max(0, S_{i-1} + (x_i - k)) is
    nonlinear and NOT directly a window function — but it folds into
    pure windows via S_i = C_i - min(0, min_{j<=i} C_j) with
    C = cumsum(x - k): a running sum and a running min, both
    streaming-frame windows over ONE key shuffle. Baseline k is each
    key's mean bucket sum (rounded(2) into DECIMAL so both engines
    subtract the same constant), and every accumulation is
    DECIMAL-exact — no float drift ever enters the recurrence, which
    is what makes a change-point ALARM (a boundary comparison)
    engine-portable at all. Alarm fires when S exceeds ``h_mult * k``.

    Returns (key, bucket_s, x, cusum, alarm).
    """
    from pyspark.sql import Window

    b = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
        * bucket_seconds
    )
    per_bucket = (
        df.select(F.col(key_col), b.alias("bucket_s"),
                  F.col(value_col).cast("decimal(28,6)").alias("_v"))
        .groupBy(key_col, "bucket_s")
        .agg(F.sum("_v").alias("x"))
    )
    wk = Window.partitionBy(key_col)
    base = per_bucket.withColumn(
        "_k",
        # divide in DOUBLE, not decimal: decimal-division scale rules
        # are engine-specific; exact-sum -> double -> IEEE division is
        # identical everywhere, and round(2) re-enters decimal
        F.round(
            F.sum("x").over(wk).cast("double")
            / F.count(F.lit(1)).over(wk).cast("double"),
            2,
        ).cast("decimal(18,2)"),
    )
    run = (
        Window.partitionBy(key_col)
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = F.sum(F.col("x") - F.col("_k")).over(run)
    staged = base.withColumn("_c", c).withColumn(
        "_floor", F.least(F.lit(0).cast("decimal(20,2)"), F.min("_c").over(run))
    )
    s = F.col("_c") - F.col("_floor")
    # h_mult enters as an exact 2-decimal DECIMAL so the alarm
    # comparison is decimal-vs-decimal (a double comparison at the
    # boundary loses to the engines' different decimal->double casts
    # by one ulp); the emitted doubles are rounded(2) for the same
    # reason (DuckDB's cast multiplies by 0.01, Spark's divides).
    h = F.lit(round(h_mult, 2)).cast("decimal(6,2)")
    return staged.select(
        F.col(key_col),
        "bucket_s",
        F.round(F.col("x").cast("double"), 2).alias("x"),
        F.round(s.cast("double"), 2).alias("cusum"),
        (s > h * F.col("_k")).alias("alarm"),
    )


def ewma_smooth(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
    alpha: float = 0.5,
) -> DataFrame:
    """Exponentially-weighted moving average per key over time-bucket
    sums — the classic smoother behind monitoring dashboards and
    anomaly baselines. Returns (key, bucket_start, x, ewma).

    Smoothing runs over OBSERVED buckets (an empty bucket is a skipped
    step, not a zero — compose with ``gap_fill`` first for the dense
    interpretation).

    Seeding is the standard ``e_0 = x_0`` (pandas ``ewm(adjust=False)``):
    ``e_i = (1-α)·e_{i-1} + α·x_i``. The recurrence accumulates float
    error in an engine-defined order, so instead both engines evaluate
    the CLOSED form ``e_i = (1-α)^i·x_0 + α·Σ_{0<j≤i} (1-α)^{i-j}·x_j``
    with the SAME ascending-j term order. With the default α = 0.5,
    every weight is a power of two, so each term is an EXACT scaling of
    the decimal-exact bucket sum and the two engines' sums agree bit
    for bit. (Other α values work but re-introduce last-ulp pow()
    variance across libm implementations.)

    Scale shape: one key-bucket aggregate (map-side combined), one
    collect per key bounded by the bucket count — a year of hourly
    buckets is 8,760 array entries per key, constant w.r.t. row count.
    The closed-form fold is LINEAR, not quadratic: lookback is bounded
    at the smallest L with (1-α)^L ≤ 2⁻⁶⁴ (L = 64 for the default
    α = 0.5), so every dropped term's weight underflows the 6-decimal
    output rounding by >12 decimal orders, and per-key work is O(L·B)
    instead of O(B²) — an always-active key over years of buckets does
    64·B multiplies, not B²/2. The oracle replays the identical
    truncated fold, so cross-engine parity stays bitwise.
    """
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds)).cast(
            "long"
        )
        * bucket_seconds
    )
    hourly = (
        df.select(
            F.col(key_col).alias("_k"),
            bucket.alias("_b"),
            F.col(value_col).cast("decimal(18,4)").alias("_v"),
        )
        .groupBy("_k", "_b")
        .agg(F.sum("_v").cast("double").alias("_x"))
    )
    per_key = hourly.groupBy("_k").agg(
        F.array_sort(F.collect_list(F.struct("_b", "_x"))).alias("_arr")
    )
    import math

    q = 1.0 - alpha
    # bounded lookback: smallest L with q^L <= 2^-64 (64 for q = 0.5);
    # a constant w.r.t. data volume, so the fold is O(L·B) per key.
    # Degenerate edges: alpha >= 1 (q <= 0) keeps only the newest
    # term; alpha <= 0 (q >= 1) never decays, so no truncation is
    # valid — fall back to the full-prefix fold (e_i = x_0 for
    # alpha = 0 exactly, as before the bounded-lookback change).
    if q <= 0.0:
        lb = 1
    elif q >= 1.0:
        lb = (1 << 31) - 1
    else:
        lb = max(1, math.ceil(64.0 * math.log(2.0) / -math.log(q)))
    # e_i = q^i * x_0 + alpha * sum_{j=1..i} q^(i-j) * x_j over the lb
    # trailing terms, ascending in j (the oldest/smallest-weight term
    # enters the fold first — identical sequence in the DuckDB
    # oracle's list_reduce). j below is the SLICE-local index; the
    # global 0-based position is greatest(0, i - (lb-1)) + j.
    ewma_arr = F.expr(
        f"""
        transform(_arr, (e, i) ->
            aggregate(
                transform(slice(_arr, greatest(0, i - {lb - 1}) + 1,
                                least(i + 1, {lb})), (s, j) ->
                    CASE WHEN greatest(0, i - {lb - 1}) + j = 0
                         THEN s._x * power(CAST({q} AS DOUBLE),
                                           CAST(i AS DOUBLE))
                         ELSE {alpha}D * (s._x * power(CAST({q} AS DOUBLE),
                                  CAST(i - (greatest(0, i - {lb - 1}) + j)
                                       AS DOUBLE)))
                    END),
                CAST(0 AS DOUBLE), (acc, t) -> acc + t))
        """
    )
    exploded = per_key.select(
        "_k", F.posexplode(F.arrays_zip(F.col("_arr"), ewma_arr.alias("_e")))
    ).select(
        F.col("_k").alias(key_col),
        F.col("col._arr._b").alias("bucket_start"),
        F.col("col._arr._x").alias("x"),
        F.col("col._e").alias("ewma"),
    )
    return exploded


def multitouch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    touch_type: str = "click",
    convert_type: str = "purchase",
    max_decay_hours: int = 40,
) -> DataFrame:
    """Multi-touch conversion attribution: every ``touch_type`` event
    attributes to the NEXT ``convert_type`` event of the same user
    (equivalently: a conversion collects all touches since the
    previous conversion), with two credit models per touch —
    ``credit_linear`` (1/n) and ``credit_decay`` (half-life weight
    ``0.5^Δhours`` normalized within the conversion).

    The single-touch last-click rule is ``asof.py``; this is the
    marketing-standard generalization.

    Cross-engine exactness: the decay weight uses the FLOORED hour
    delta capped at ``max_decay_hours``, so every weight is a power of
    two ≥ 2^-40. Per-conversion weight sums then span ≤ 40+log2(n)
    mantissa bits — exact (order-independent) double addition for any
    realistic touch count, so the normalized shares are bit-identical
    in any engine regardless of aggregation order. (An uncapped or
    fractional-exponent decay would reintroduce both libm pow()
    variance and order-dependent float sums.)

    Scale shape: ONE shuffle on the user key serves the reverse
    running-min window, the conversion-id join, and the per-conversion
    aggregate; no self-join of the event table against itself.

    Returns (user, conv_id, conv_ts, touch_id, touch_ts, n_touches,
    credit_linear, credit_decay).
    """
    e = df.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_t"),
    ).filter(F.col("_t").isin(touch_type, convert_type))
    # next conversion at-or-after each row: reverse running min of the
    # conversion (ts, id) pair — id rides along to identify the
    # conversion without a timestamp-equality join fan-out risk
    wrev = (
        Window.partitionBy("_u")
        .orderBy(F.desc("_ts"), F.desc("_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    conv_pair = F.when(
        F.col("_t") == convert_type, F.struct("_ts", "_id")
    )
    tagged = e.withColumn("_next_conv", F.min(conv_pair).over(wrev))
    # exact ts ties between a touch and a conversion resolve by the
    # deterministic (ts, id) desc frame order: the conversion is "next"
    # only if its id sorts after the touch's — microsecond timestamps
    # make this a measure-zero case, but it is pinned, not random
    touches = tagged.filter(
        (F.col("_t") == touch_type) & F.col("_next_conv").isNotNull()
    )
    dh = F.least(
        F.floor(
            (
                F.unix_timestamp(F.col("_next_conv._ts"))
                - F.unix_timestamp(F.col("_ts"))
            )
            / 3600
        ),
        F.lit(max_decay_hours),
    ).cast("int")
    weighted = touches.select(
        "_u",
        F.col("_next_conv._id").alias("conv_id"),
        F.col("_next_conv._ts").alias("conv_ts"),
        F.col("_id").alias("touch_id"),
        F.col("_ts").alias("touch_ts"),
        F.pow(F.lit(0.5), dh.cast("double")).alias("_w"),
    )
    wconv = Window.partitionBy("_u", "conv_id")
    return weighted.select(
        F.col("_u").alias(user_col),
        "conv_id",
        "conv_ts",
        "touch_id",
        "touch_ts",
        F.count(F.lit(1)).over(wconv).cast("long").alias("n_touches"),
        (F.lit(1.0) / F.count(F.lit(1)).over(wconv)).alias("credit_linear"),
        (F.col("_w") / F.sum("_w").over(wconv)).alias("credit_decay"),
    )


def interval_union_coverage(
    df: DataFrame,
    key_col: str,
    start_col,
    end_col,
) -> DataFrame:
    """Per-key UNION length of (possibly overlapping) intervals — "how
    much wall-clock was covered by at least one session?" — the
    interval twin of gaps-and-islands. ``start_col``/``end_col`` are
    integer-comparable Column expressions (epoch seconds/micros).

    Classic sweep, all in one key partitioning: order intervals by
    (start, end); an interval opens a NEW island when its start
    exceeds the running max of all previous ends; islands are numbered
    by a running sum of those breaks; one aggregate per island takes
    (min start, max end). Everything is integer min/max/sum — exact
    in any engine — and every window + the aggregate share the single
    key shuffle, so 100 TB scales by key count.

    Returns (key, n_intervals, n_islands, covered, span, coverage)
    where span = max end − min start and coverage = covered/span
    rounded(6).
    """
    base = df.select(
        F.col(key_col).alias("_k"),
        start_col.cast("long").alias("_s"),
        end_col.cast("long").alias("_e"),
    ).filter(F.col("_e") >= F.col("_s"))
    w = Window.partitionBy("_k").orderBy("_s", "_e")
    prev_max_end = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_max_end.isNull() | (F.col("_s") > prev_max_end), 1
    ).otherwise(0)
    seg = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    islands = base.withColumn("_seg", seg)
    per_island = islands.groupBy("_k", "_seg").agg(
        F.min("_s").alias("_is"),
        F.max("_e").alias("_ie"),
        F.count(F.lit(1)).alias("_n"),
    )
    out = per_island.groupBy("_k").agg(
        F.sum("_n").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("_ie") - F.col("_is")).cast("long").alias("covered"),
        (F.max("_ie") - F.min("_is")).cast("long").alias("span"),
    )
    return out.select(
        F.col("_k").alias(key_col),
        "n_intervals",
        "n_islands",
        "covered",
        "span",
        F.round(
            F.col("covered").cast("double") / F.greatest("span", F.lit(1)), 6
        ).alias("coverage"),
    )


def trending_topk(
    df: DataFrame,
    ts_col: str,
    item_col,
    bucket_seconds: int = 3600,
    k: int = 3,
) -> DataFrame:
    """Decayed TRENDING leaderboard: per time bucket, the top-k items
    by exponentially-decayed activity ``score_h = Σ_{h'≤h} c_{h'} ·
    2^{-(h−h')}`` — the "what's hot right now" ranking that weights a
    burst this hour over steady volume last week. Scores are defined
    at buckets where the item was ACTIVE (≥1 event); a silent item
    decays out of the board by absence.

    Same bit-parity recipe as ``ewma_smooth``: per-bucket decay 1/2
    makes every weight an exactly-representable power of two, and both
    engines evaluate the closed form with the identical ascending-h'
    sequential fold — the RANKING therefore compares identical
    doubles, and the leaderboard replays exactly in SQL.

    Lookback is BOUNDED at the 64 trailing active buckets: active
    buckets are strictly increasing in time, so any dropped term is at
    least 64 buckets old and carries weight ≤ 2⁻⁶⁴ — absolute score
    error ≤ total_count·2⁻⁶⁴, far below the 6-decimal rounding of the
    output. The bound is what makes the fold LINEAR: O(64·B) work per
    item instead of the O(B²) all-prefix fold, so an always-active
    item over years of hourly buckets costs 64·B multiplies, not B²/2.
    The oracle replays the identical truncated fold, so parity stays
    bitwise.

    Shape: one (item, bucket) count aggregate (map-side combined), one
    bounded per-item array fold (≤64 terms per active bucket), one
    per-bucket top-k window (WindowGroupLimit).

    Returns (bucket_start, item, score, rnk), k rows per bucket.
    """
    hb = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds)).cast(
        "long"
    )
    hourly = (
        df.select(item_col.alias("_item"), hb.alias("_hb"))
        .groupBy("_item", "_hb")
        .agg(F.count(F.lit(1)).cast("double").alias("_c"))
    )
    per_item = hourly.groupBy("_item").agg(
        F.array_sort(F.collect_list(F.struct("_hb", "_c"))).alias("_arr")
    )
    scores = F.expr(
        """
        transform(_arr, (e, i) ->
            aggregate(
                transform(slice(_arr, greatest(1, i - 62),
                                least(i + 1, 64)), (s, j) ->
                    s._c * power(CAST(0.5 AS DOUBLE),
                                 CAST(e._hb - s._hb AS DOUBLE))),
                CAST(0 AS DOUBLE), (acc, t) -> acc + t))
        """
    )
    exploded = per_item.select(
        "_item",
        F.explode(F.arrays_zip(F.col("_arr"), scores.alias("_s"))).alias("z"),
    ).select(
        "_item",
        (F.col("z._arr._hb") * bucket_seconds).alias("bucket_start"),
        F.col("z._s").alias("_score"),
    )
    w = Window.partitionBy("bucket_start").orderBy(
        F.desc("_score"), F.asc("_item")
    )
    return (
        exploded.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "bucket_start",
            F.col("_item").alias("item"),
            F.round("_score", 6).alias("score"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def best_changepoint(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Best single changepoint per key by SSE reduction (binary
    segmentation, depth 1): the split position k that minimizes
    SSE(left) + SSE(right) over the ``order_col`` sequence — the
    level-shift detector behind "when did this metric change"
    dashboards (CUSUM flags THAT a drift happened; this names the
    point with the largest explained variance).

    Determinism: ``value_col`` must be integer-exact (quantize
    upstream). Prefix count/sum/sum-of-squares are exact BIGINT
    window folds; each candidate's SSE is the closed form
    Σv² − (Σv)²/n evaluated in one fixed IEEE op chain from those
    exact integers, so every candidate's score is the identical
    double in both engines and the argmin (ties → earliest split)
    replays in SQL. (Exactness bound: n·v² < 2⁶³ per key — beyond
    that, the same plan with DECIMAL accumulators.)

    Scale shape: one key-partitioned ordered window produces all
    prefix moments (single shuffle on the key, series already
    aggregated — callers roll up the fact first); totals come from
    the SAME aggregate re-keyed, and the argmin is a
    row_number-over-(score, order) pick on |keys|·n candidate rows.

    Returns (key, n, split_o — the last ``order_col`` value of the
    left segment, var_total, var_best — the per-point variances
    SSE/n before/after the split, rounded(4) — and gain_pct, the
    variance share the split explains, rounded(6)). Per-point
    variances, not raw SSEs: an SSE grows with n·v² and quickly
    passes the magnitude where a 6-dp round exceeds double
    resolution — there Spark's exact-BigDecimal round and a
    multiply-based round() disagree by an ulp (observed at 1e10),
    so the REPORTED numbers are kept at bounded magnitude instead.
    """
    a = df.select(
        F.col(key_col),
        F.col(order_col).alias("_o"),
        F.col(value_col).cast("long").alias("_v"),
    )
    w = Window.partitionBy(key_col).orderBy("_o")
    pre = a.select(
        F.col(key_col),
        "_o",
        F.row_number().over(w).alias("_k"),
        F.sum("_v").over(w).alias("_cs"),
        F.sum(F.col("_v") * F.col("_v")).over(w).alias("_css"),
    )
    tot = a.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_v").alias("_ts"),
        F.sum(F.col("_v") * F.col("_v")).alias("_tss"),
    )
    cand = pre.join(tot, key_col).filter(F.col("_k") < F.col("_n"))
    kd = F.col("_k").cast("double")
    nd = F.col("_n").cast("double")
    csd, cssd = F.col("_cs").cast("double"), F.col("_css").cast("double")
    tsd, tssd = F.col("_ts").cast("double"), F.col("_tss").cast("double")
    sse_l = cssd - csd * csd / kd
    sse_r = (tssd - cssd) - (tsd - csd) * (tsd - csd) / (nd - kd)
    sse_tot = tssd - tsd * tsd / nd
    scored = cand.select(
        F.col(key_col),
        F.col("_n").alias("n"),
        F.col("_o").alias("split_o"),
        sse_tot.alias("_sse_tot"),
        (sse_l + sse_r).alias("_sse_best"),
    )
    wr = Window.partitionBy(key_col).orderBy("_sse_best", "split_o")
    npts = F.col("n").cast("double")
    return (
        scored.withColumn("_r", F.row_number().over(wr))
        .filter(F.col("_r") == 1)
        .select(
            F.col(key_col),
            "n",
            "split_o",
            F.round(F.col("_sse_tot") / npts, 4).alias("var_total"),
            F.round(F.col("_sse_best") / npts, 4).alias("var_best"),
            F.round(
                F.when(
                    F.col("_sse_tot") > 0,
                    (F.col("_sse_tot") - F.col("_sse_best"))
                    / F.col("_sse_tot"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("gain_pct"),
        )
    )


def acf_by_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Autocorrelation function per key, lags 1..``max_lag``, over the
    ``order_col`` sequence — the periodicity readout beside the trend
    (Mann-Kendall) and level-shift (changepoint) diagnostics: a
    weekly-seasonal metric shows an ACF spike at lag 7.

    Exactness: with integer-exact values the mean-centered series is
    made integer by scaling — y_t = n·x_t − Σx (n times the
    deviation) — and ACF(h) = Σ y_t·y_{t+h} / Σ y_t² exactly (the n²
    cancels). Products and sums run in DECIMAL(38,0) (exact at any
    realistic magnitude; DuckDB's HUGEINT mirrors it), and the single
    final divide of two exactly-represented sums is one IEEE op,
    rounded(6) — the estimator replays bit-for-bit.

    Scale shape: the series is the caller's ROLLUP (|keys|·n rows);
    one key window computes positions and the centering sums, the
    lag fan-out is a ``sequence(1, max_lag)`` explode joined back on
    (key, t+h) — |keys|·n·max_lag rows, never the fact.

    Lags with no pairs (h ≥ n) are absent; a zero-variance series
    reports NULL acf (0/0 has no defined correlation).
    """
    w = Window.partitionBy(key_col)
    wo = w.orderBy(F.col(order_col))
    a = df.select(
        F.col(key_col),
        F.row_number().over(wo).alias("_t"),
        (
            F.count(F.lit(1)).over(w) * F.col(value_col).cast("long")
            - F.sum(F.col(value_col).cast("long")).over(w)
        )
        .cast("decimal(38,0)")
        .alias("_y"),
    )
    den = a.groupBy(key_col).agg(
        F.sum(F.col("_y") * F.col("_y")).alias("_den"),
        F.count(F.lit(1)).alias("n"),
    )
    lags = a.select(
        F.col(key_col),
        "_t",
        "_y",
        F.explode(F.sequence(F.lit(1), F.lit(int(max_lag)))).alias("lag"),
    )
    b = a.select(
        F.col(key_col), F.col("_t").alias("_t2"), F.col("_y").alias("_y2")
    )
    num = (
        lags.join(
            b,
            (lags[key_col] == b[key_col])
            & (lags["_t"] + lags["lag"] == b["_t2"]),
        )
        .groupBy(lags[key_col], "lag")
        .agg(F.sum(F.col("_y") * F.col("_y2")).alias("_num"))
    )
    return num.join(den, key_col).select(
        F.col(key_col),
        "n",
        F.col("lag").cast("int").alias("lag"),
        F.round(
            F.when(
                F.col("_den") > 0,
                F.col("_num").cast("double") / F.col("_den").cast("double"),
            ),
            6,
        ).alias("acf"),
    )


def theil_sen_slope(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    max_points: int = 5_000,
    value_scale: float = 1.0,
) -> DataFrame:
    """Per-key Theil-Sen slope estimate: the MEDIAN of the pairwise
    slopes (vⱼ−vᵢ)/(dⱼ−dᵢ) over all day pairs i<j — the robust trend
    magnitude companion to Mann-Kendall's direction test (same
    day-grain input, same breakdown point: up to ~29% arbitrary
    outliers cannot move it).

    Input contract: ``daily`` is an ALREADY-ROLLED-UP series — one
    row per (key, epoch-day) with an exact integer value (the
    ``_daily_cents`` grain). The pair join is quadratic in the
    series length, which is CALENDAR-bounded (a year of dailies =
    66k pairs per key, constant in corpus size), and the bound is
    ENFORCED: the longest series is counted first and a series
    beyond ``max_points`` raises instead of silently exploding a
    fact-grain input into n² pairs.

    Exactness: each slope is one IEEE division of exact integers —
    identical on any engine — and the median is the same
    percentile interpolation ``quantiles_by_status`` pins; output
    rounds to 6dp.

    The input is SNAPSHOTTED here before anything reads it: the
    bound probe below plus the pair join's two sides plus the n_days
    aggregate are four consumers, and Spark has no subplan reuse
    below the exchange — without the snapshot a caller passing an
    expensive un-materialized lineage would execute it up to four
    times (the probe EAGERLY, at call time). Day-grain series are
    calendar-bounded, so the snapshot write is small by contract.

    Returns (key, n_days, n_pairs, slope_per_day).
    """
    from ..sources.scratch import snapshot

    daily = snapshot(daily, prefix="theil_daily_")
    longest = (
        daily.groupBy(key_col)
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    if longest and longest > max_points:
        raise ValueError(
            f"theil_sen_slope: longest series has {longest} points > "
            f"max_points={max_points}; the pair join would build "
            f"~{longest * (longest - 1) // 2} rows per key. Roll up to "
            "a coarser grain or raise max_points explicitly."
        )
    a = daily.select(
        F.col(key_col).alias("_k"),
        F.col(day_col).cast("long").alias("_da"),
        F.col(value_col).cast("long").alias("_va"),
    )
    b = daily.select(
        F.col(key_col).alias("_k"),
        F.col(day_col).cast("long").alias("_db"),
        F.col(value_col).cast("long").alias("_vb"),
    )
    # per-pair: ((Δv)/(Δd))/scale — mirrored operation-for-operation
    # in the oracle so the doubles feeding the median are identical
    pairs = a.join(b, "_k").filter(F.col("_da") < F.col("_db")).select(
        "_k",
        (
            (F.col("_vb") - F.col("_va")).cast("double")
            / (F.col("_db") - F.col("_da")).cast("double")
            / F.lit(float(value_scale))
        ).alias("_s"),
    )
    n = daily.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).alias("n_days")
    )
    est = pairs.groupBy("_k").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.percentile("_s", F.lit(0.5)), 6).alias("slope_per_day"),
    )
    return n.join(est, "_k", "left").select(
        F.col("_k").alias(key_col),
        "n_days",
        F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
        "slope_per_day",
    )


def linear_gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_s: int = 600,
) -> DataFrame:
    """Bucketed series completion by LINEAR INTERPOLATION — the
    companion to the forward-fill ``gap_fill_hourly`` semantics:
    sum ``value_col`` per (key, ``bucket_s``-second bucket), build
    each key's full bucket spine, and fill empty buckets with the
    straight line between the nearest observed neighbors (flat
    extension at the edges, where only one neighbor exists).

    Shape: one fact aggregate to bucket grain, ONE ``lead()`` window
    over the observed buckets per key (observed-grain, never spine-
    grain), then each observed→next-observed segment explodes into
    its gap buckets already carrying both interpolation endpoints —
    the spine is generated, never joined or window-scanned (see the
    r11 note in the body). All windows are partitioned by key — no
    global order anywhere.

    Exactness: observed sums are exact cents BIGINTs; the
    interpolation v₀ + (v₁−v₀)·(h−h₀)/(h₁−h₀) is a single double
    expression over exact integers, identical per engine, then
    TRUNCATED to 6dp (floor, not round: the interpolation weights are
    small rationals, so exact x.xxxxxx5 ties are common, and
    round-half behavior differs between Spark's BigDecimal and
    DuckDB's multiply-based round — floor of the identical double is
    engine-invariant; observed 3 tie flips at sf0.001 before the
    switch).

    Returns (key, bucket_s, n_events, value_filled, is_observed).
    """
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("_k"),
        (
            F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_s) * bucket_s
        ).cast("long").alias("_b"),
        F.round(F.col(value_col).cast("double") * 100, 0)
        .cast("long")
        .alias("_vc"),
    )
    actual = base.groupBy("_k", "_b").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_vc").alias("_v")
    )
    # SEGMENT form (r11): one lead() window over the OBSERVED bucket
    # rows gives each observed bucket its next observed neighbor; the
    # bucket spine is then an explode of each segment's sequence —
    # the observed bucket itself plus its trailing gap buckets. The
    # former full-spine shape (per-key min..max sequence, left join,
    # two unbounded-frame windows over EVERY spine bucket) sorted and
    # window-scanned the FILLED series per key — on sparse series the
    # spine is orders of magnitude larger than the observed set (the
    # sf0.1 events table interpolates ~4.2 s of which the fact
    # aggregate is 0.17 s; the segment form runs the same query in
    # ~0.6 s warm), and the per-key windows serialize each key's
    # millions of spine rows through one task. Here the window
    # touches only observed rows; gap rows are GENERATED map-side
    # already carrying both interpolation endpoints. The spine spans
    # min..max observed per key, so every gap bucket has both
    # neighbors (the flat-edge branch only ever fired for
    # single-observation keys, where the observed row IS the output —
    # pinned by test_linear_gap_fill_edge_extension).
    wnext = Window.partitionBy("_k").orderBy("_b")
    seg = actual.select(
        "_k",
        "_b",
        "_n",
        "_v",
        F.lead("_b").over(wnext).alias("_bn"),
        F.lead("_v").over(wnext).alias("_vn"),
    )
    step = F.lit(int(bucket_s)).cast("long")
    rows = seg.select(
        "_k",
        "_b",
        "_n",
        "_v",
        "_bn",
        "_vn",
        F.explode(
            F.sequence(
                F.col("_b"),
                F.coalesce(F.col("_bn") - step, F.col("_b")),
                step,
            )
        ).alias("_gb"),
    )
    observed = F.col("_gb") == F.col("_b")
    # identical double arithmetic to the pre-r11 window form: every
    # operand long-cast-to-double in the same order
    interp = F.when(observed, F.col("_v").cast("double")).otherwise(
        F.col("_v").cast("double")
        + (F.col("_vn") - F.col("_v")).cast("double")
        * (F.col("_gb") - F.col("_b")).cast("double")
        / (F.col("_bn") - F.col("_b")).cast("double")
    )
    return rows.select(
        F.col("_k").alias(key_col),
        F.col("_gb").alias("bucket_s"),
        F.when(observed, F.col("_n")).otherwise(F.lit(0))
        .cast("long")
        .alias("n_events"),
        (
            F.floor(interp / F.lit(100.0) * F.lit(1000000.0))
            / F.lit(1000000.0)
        ).alias("value_filled"),
        observed.alias("is_observed"),
    )
