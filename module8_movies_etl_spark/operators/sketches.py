"""Mergeable frequency sketches (SURVEY.md §2.13 extension).

Count-min (Cormode & Muthukrishnan 2005): a depth×width counter grid;
each item increments one counter per row (bucket = hash_i(item) mod
width); the frequency estimate is the MIN over its depth counters —
always ≥ the true count, with overestimate bounded by
``e/width · total_count`` per row w.p. ``1 − e^{-depth}``.

Like the KMV sketch (``aggregates.kmv_distinct_sketch``), all hashing
is public md5 arithmetic, so the ESTIMATES — not just the exact
counts — are bit-for-bit reproducible by any SQL engine and the
driver hash-verifies them.

Scale shape (the reason a 100 TB pipeline carries one): the counter
grid is ``depth × width`` rows REGARDLESS of input size — here 4×256
= ≤1,024 groups. Building it is one hash aggregate whose map-side
partials collapse to ≤1,024 rows per task before the shuffle; probing
it is a broadcast join. The grid is mergeable (counters add), so
per-day / per-partition sketches combine without re-reading history —
the streaming-friendly property exact counts lack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(item: F.Column, row: int, width: int) -> F.Column:
    """Row ``row``'s bucket for ``item``: top-60-bit md5 of the salted
    item, mod width — portable to any engine with md5."""
    h = F.conv(
        F.substring(F.md5(F.concat(item, F.lit(f"#{row}"))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width)).cast("int")


def cms_build(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min counter grid over an item stream (one input row = one
    occurrence). Returns (row, bucket, cnt) — ≤ depth·width rows.

    One narrow projection fans each occurrence into ``depth`` (row,
    bucket) pairs, then a single hash aggregate builds the grid; with
    ≤ depth·width distinct groups the map-side partials do almost all
    of the counting before the (tiny) shuffle.
    """
    pairs = items.select(
        F.posexplode(
            F.array(*[_bucket(F.col(item_col), r, width) for r in range(depth)])
        ).alias("row", "bucket")
    )
    return pairs.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    grid: DataFrame, probes: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query the sketch: estimate = min over rows of the item's
    counter. ``grid`` is ≤ depth·width rows → broadcast; the probe
    side streams. Adds ``cms_estimate`` (long) to ``probes``.

    The grid lookup is a LEFT join with absent cells coalesced to 0
    (the ``bloom_build_probe`` pattern): a (row, bucket) cell the
    build stream never incremented means the true count-min answer is
    0 — an inner join would instead DROP the fanned row, vanishing
    the probe from the output entirely when all its cells are empty
    and overestimating (min over only the surviving non-zero
    counters) when some are.
    """
    fan = probes.select(
        "*",
        F.posexplode(
            F.array(*[_bucket(F.col(item_col), r, width) for r in range(depth)])
        ).alias("row", "bucket"),
    )
    keep = [c for c in probes.columns]
    return (
        fan.join(F.broadcast(grid), ["row", "bucket"], "left")
        .groupBy(*keep)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
                "cms_estimate"
            )
        )
    )


def kmv_rolling_distinct(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
    window_buckets: int = 24,
    k: int = 64,
) -> DataFrame:
    """Sliding-window distinct-count estimates via MERGED per-bucket
    KMV sketches — "distinct users in the trailing 24 h, hourly" — the
    query that makes mergeability worth carrying: the exact answer
    needs every (bucket, user) pair in every frame it touches, while
    the sketch path re-reads only k-entry summaries.

    Per bucket: hash values to U(0,1) (top-60-bit md5, public
    arithmetic — see ``aggregates.kmv_distinct_sketch``), keep the k
    smallest. Per frame: union the member buckets' hash sets (flatten
    + distinct + sort), re-take the k smallest — exactly the sketch
    merge a cross-day rollup does — and estimate ``(k-1)/m_k``, or
    the exact union size when it holds fewer than k hashes.

    Scale shape: raw rows touch ONE shuffle (bucket-grain hash
    dedup + rank); the rolling pass runs over bucket-count rows
    (8,760/year) each carrying ≤ k doubles. Every step is md5/sort
    arithmetic — estimates replay bit-for-bit in SQL.

    Returns (bucket_start, n_exact_bucket, est_window) per bucket;
    ``n_exact_bucket`` is the bucket's TRUE distinct count (computed
    on the deduped stream before the k-min truncation).
    """
    from pyspark.sql import Window

    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds)).cast(
            "long"
        )
        * bucket_seconds
    )
    h = (
        F.conv(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(bucket.alias("_b"), h.alias("_h"))
        .dropDuplicates(["_b", "_h"])
    )
    wk = Window.partitionBy("_b").orderBy("_h")
    wb = Window.partitionBy("_b")
    # n_exact_bucket is the TRUE per-bucket distinct count (the hash
    # dedup already reduced to distinct values) — counted BEFORE the
    # top-k filter; max(_r) after the filter would silently cap the
    # "exact" column at k
    sketches = (
        hashed.withColumn("_r", F.row_number().over(wk))
        .withColumn("_nb", F.count(F.lit(1)).over(wb))
        .filter(F.col("_r") <= k)
        .groupBy("_b")
        .agg(
            F.array_sort(F.collect_list("_h")).alias("_mins"),
            F.max("_nb").cast("long").alias("n_exact_bucket"),
        )
    )
    # RANGE frame over the bucket-start seconds, not ROWS: an empty
    # bucket must age out of the trailing window on schedule, not
    # stretch it. Unpartitioned single-node window is fine HERE — it
    # runs over bucket-grain rows (8,760/year), not raw events.
    wroll = Window.orderBy("_b").rangeBetween(
        -(window_buckets - 1) * bucket_seconds, Window.currentRow
    )
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_mins").over(wroll)))),
        1,
        k,
    )
    est = F.when(
        F.size("_m") < k, F.size("_m").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.element_at("_m", k))
    return (
        sketches.withColumn("_m", merged)
        .select(
            F.col("_b").alias("bucket_start"),
            "n_exact_bucket",
            F.round(est, 4).alias("est_window"),
        )
    )


def kmv_set_ops(
    df: DataFrame,
    label_col: str,
    value_col: str,
    label_a: str,
    label_b: str,
    k: int = 64,
) -> DataFrame:
    """KMV sketch SET ALGEBRA between two populations (Beyer et al.
    2007): estimate |A|, |B|, |A∪B|, |A∩B| and Jaccard from two
    k-minimum-values sketches — the cross-source overlap question
    ("how many users both click and view?") answered from constant
    state instead of a distinct-pair shuffle.

    Estimators: each set's own sketch gives |A| (``(k-1)/m_k``); the
    MERGED sketch M = k smallest of A_k ∪ B_k gives |A∪B|; and
    ρ = |{h ∈ M : h ∈ A_k ∧ h ∈ B_k}| / |M| is an unbiased Jaccard
    estimate, so |A∩B| ≈ ρ·|A∪B|. When the union holds fewer than k
    distinct hashes every figure degrades to EXACT (the sketches saw
    everything). All md5/sort/compare arithmetic — the estimates
    themselves replay in SQL.

    Scale shape: one scan, one (label, hash) dedup shuffle, one
    window top-k; everything after is two ≤k arrays in a single row.

    Returns one row: (n_a_sketch, n_b_sketch, est_a, est_b,
    est_union, est_intersection, est_jaccard).
    """
    from pyspark.sql import Window

    h = (
        F.conv(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .filter(F.col(label_col).isin(label_a, label_b))
        .select(F.col(label_col).alias("_l"), h.alias("_h"))
        .dropDuplicates(["_l", "_h"])
    )
    wk = Window.partitionBy("_l").orderBy("_h")
    topk = hashed.withColumn("_r", F.row_number().over(wk)).filter(
        F.col("_r") <= k
    )
    one = topk.groupBy().agg(
        F.array_sort(
            F.collect_list(F.when(F.col("_l") == label_a, F.col("_h")))
        ).alias("_a"),
        F.array_sort(
            F.collect_list(F.when(F.col("_l") == label_b, F.col("_h")))
        ).alias("_b"),
    )

    def est(arr, kth):
        sz = F.size(arr)
        return F.when(sz < k, sz.cast("double")).otherwise(
            F.lit(float(k - 1)) / F.element_at(arr, kth)
        )

    merged = F.slice(F.array_sort(F.array_distinct(F.concat("_a", "_b"))), 1, k)
    both = F.size(
        F.filter(
            F.col("_m"),
            lambda x: F.array_contains(F.col("_a"), x)
            & F.array_contains(F.col("_b"), x),
        )
    )
    with_m = one.withColumn("_m", merged)
    rho = both.cast("double") / F.size("_m")
    est_union = est(F.col("_m"), k)
    return with_m.select(
        F.size("_a").cast("long").alias("n_a_sketch"),
        F.size("_b").cast("long").alias("n_b_sketch"),
        F.round(est(F.col("_a"), k), 4).alias("est_a"),
        F.round(est(F.col("_b"), k), 4).alias("est_b"),
        F.round(est_union, 4).alias("est_union"),
        F.round(rho * est_union, 4).alias("est_intersection"),
        F.round(rho, 4).alias("est_jaccard"),
    )


def bloom_build_probe(
    build: DataFrame,
    build_col: str,
    probe: DataFrame,
    probe_col: str,
    m_bits: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """Portable Bloom-filter membership: build an ``m_bits``-bit filter
    from the build side's keys (bit positions = top-60-bit md5 of the
    salted key, mod m — public arithmetic, so the filter and its
    false-positive behavior replay in ANY engine), probe the probe
    side, and report the confusion summary against exact membership.

    This is the PORTABLE twin of Spark's runtime
    ``InSubqueryExec``/Bloom join pruning (already plan-pinned
    elsewhere in the suite): a filter you can BUILD ONCE, ship as ≤
    m/8 bytes, and apply at ingest on a different system entirely —
    the cross-pipeline pre-filter pattern (only rows that MIGHT match
    an allowlist get forwarded at all).

    Scale shape — membership tests are BROADCAST HASH JOINS, never
    array scans: the round-4 first cut carried the bit table as an
    array column and probed with ``array_contains`` — an O(m) linear
    scan per hash per row, 1.8e9 comparisons at sf0.1 (measured
    9.6 s); as hash-join probes the same work is O(1) per row
    (measured 0.9 s). Probes collapse to DISTINCT keys first (the
    verdict per key is constant), re-weighted by occurrence counts at
    the end, so the join side scales with key cardinality, not row
    count.

    Returns one row: (n_build, n_probe, n_flagged, n_members,
    n_false_pos, fp_rate).
    """
    bkeys = build.select(F.col(build_col).cast("string").alias("_k")).distinct()
    bits = (
        bkeys.select(
            F.explode(
                F.array(
                    *[_bucket(F.col("_k"), r, m_bits) for r in range(n_hashes)]
                )
            ).alias("_pos")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    counts = (
        probe.select(F.col(probe_col).cast("string").alias("_p"))
        .groupBy("_p")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    fan = counts.select(
        "_p",
        "_cnt",
        F.explode(
            F.array(*[_bucket(F.col("_p"), r, m_bits) for r in range(n_hashes)])
        ).alias("_pos"),
    )
    per_key = (
        fan.join(F.broadcast(bits), "_pos", "left")
        .groupBy("_p", "_cnt")
        .agg((F.sum(F.coalesce("_hit", F.lit(0))) == n_hashes).alias("_f"))
    )
    flags = per_key.join(
        F.broadcast(bkeys.withColumn("_mem", F.lit(True))),
        per_key["_p"] == bkeys["_k"],
        "left",
    ).select(
        "_p",
        "_cnt",
        "_f",
        F.coalesce("_mem", F.lit(False)).alias("_m"),
    )
    summary = flags.groupBy().agg(
        F.sum("_cnt").cast("long").alias("n_probe"),
        F.sum(F.when(F.col("_f"), F.col("_cnt")).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.sum(F.when(F.col("_m"), F.col("_cnt")).otherwise(0))
        .cast("long")
        .alias("n_members"),
        F.sum(F.when(F.col("_f") & ~F.col("_m"), F.col("_cnt")).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
    )
    n_build = bkeys.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_build"))
    return summary.crossJoin(F.broadcast(n_build)).select(
        "n_build",
        "n_probe",
        "n_flagged",
        "n_members",
        "n_false_pos",
        # the false-positive RATE conditions on non-members — FP/(FP+TN)
        # — since a member can never be a false positive; dividing by
        # all probes would understate it in proportion to membership
        F.round(
            F.col("n_false_pos").cast("double")
            / F.nullif(
                (F.col("n_probe") - F.col("n_members")).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("fp_rate"),
    )


def histogram_sketch_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_bins: int = 64,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Mergeable QUANTILE sketch: per-key equi-width histogram (counts
    add across partitions/days — the property `percentile_approx`'s
    engine-private digest has but cannot replay) + linear
    interpolation inside the target bin. Error is bounded by the bin
    width, not the data size; ``n_bins`` rows of state per key.

    Every step is identical-operand double arithmetic (bin edges from
    per-key min/max, counts integer, interpolation in one fixed
    expression order), so the ESTIMATES replay bit-for-bit in SQL —
    the sketch-accuracy/portability trade at its clearest.

    Shape: one (key) min/max aggregate broadcast back, one (key, bin)
    count aggregate, one cumulative window over ≤ n_bins rows per key.

    Returns (key, n, est_q50, est_q95, ...) — one row per key.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    # NULL values are excluded up front: they belong to no bin, and
    # left in they would form a NULL bin that sorts FIRST in the
    # cumulative window (min-struct argmin would then select a NULL
    # estimate) while inflating _n and shifting every target rank
    df = df.filter(v.isNotNull())
    stats = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi")
    )
    span = F.col("_hi") - F.col("_lo")
    # clamp to the last bin so v == max lands in bin n_bins-1
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.floor((F.col("_v") - F.col("_lo")) * n_bins / span).cast("int"),
    )
    binned = (
        df.select(F.col(key_col).alias("_k"), v.alias("_v"))
        .join(F.broadcast(stats), "_k")
        .select(
            "_k",
            "_lo",
            "_hi",
            F.when(span > 0, bin_).otherwise(F.lit(0)).alias("_b"),
        )
        .groupBy("_k", "_lo", "_hi", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wcum = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("_k")
    cum = binned.select(
        "_k",
        "_lo",
        "_hi",
        "_b",
        "_c",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(wall).alias("_n"),
    )
    width = (F.col("_hi") - F.col("_lo")) / n_bins
    outs = [F.max("_n").cast("long").alias("n")]
    for q in qs:
        target = F.lit(q) * F.col("_n")
        prev = F.col("_cum") - F.col("_c")
        est_in_bin = (
            F.col("_lo")
            + F.col("_b") * width
            + (target - prev) / F.col("_c") * width
        )
        # FIRST bin whose cumulative count reaches the target rank —
        # argmin by bin index via min over (b, est) structs (struct
        # ordering is field-by-field, so the smallest qualifying _b
        # wins). A plain min over the estimates is wrong: in later
        # qualifying bins (target - prev) is negative, so a sparse
        # tail bin extrapolates below its own range (and below the
        # data minimum when an outlier stretches the bin width).
        est = F.min(
            F.when(
                F.col("_cum") >= target,
                F.struct(F.col("_b").alias("b"), est_in_bin.alias("est")),
            )
        ).getField("est")
        outs.append(F.round(est, 4).alias(f"est_q{int(q * 100)}"))
    return cum.groupBy(F.col("_k").alias(key_col)).agg(*outs)



def _hll_alpha(m: int, who: str) -> float:
    """Validate m and return Flajolet's alpha_m bias constant — the
    single source of the HLL contract shared by the register builder,
    the standalone estimator and the grouped NDV profiler."""
    if m < 2 or 256 % m != 0:
        raise ValueError(f"{who}: m must be >=2 and divide 256")
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def _hll_route(key: F.Column, m: int):
    """(bucket, rho) routing of one value: top md5 byte mod m picks
    the register, rho = leftmost-1-bit position of the next 48 bits
    (w = 0 -> 49). Shared verbatim by every HLL surface so the
    registers stay bit-identical to the SQL oracles' replay."""
    hx = F.md5(key)
    bucket = (F.conv(F.substring(hx, 1, 2), 16, 10).cast("long") % m).cast("int")
    w = F.conv(F.substring(hx, 3, 12), 16, 10).cast("long")
    rho = (
        F.when(w > 0, F.lit(49) - F.length(F.bin(w)))
        .otherwise(F.lit(49))
        .cast("int")
    )
    return bucket, rho


def _hll_est_expr(s: F.Column, v: F.Column, m: int, alpha: float) -> F.Column:
    """Harmonic-mean estimate from the scaled-integer Z sum ``s`` and
    empty-register count ``v``, with the linear-counting small-range
    correction — one expression so the 2^50 scale and the correction
    threshold can never diverge between HLL surfaces."""
    raw = (F.lit(alpha) * m * m * F.lit(float(1 << 50))) / s.cast("double")
    return F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)


def hll_registers(
    df: DataFrame,
    key_col: str,
    m: int = 64,
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007) over
    ``key_col``: md5-hash every value, route it to one of ``m``
    registers by its top byte, and keep per register the maximum
    ``rho`` = position of the leftmost 1-bit in the next 48 hash
    bits. Returns the FULL ``m``-row register table (empty registers
    as 0) — the sketch's mergeable state.

    Unlike KMV (``aggregates.kmv_distinct_sketch``, k · 8 bytes,
    exactly mergeable by re-min-ing), HLL state is ``m`` 6-bit
    registers that merge by element-wise MAX — the cheapest mergeable
    distinct-count state there is, and the one every production
    engine (Spark's own ``approx_count_distinct`` included) ships.
    This variant is md5-deterministic so the registers — not just the
    estimate — hash-verify against any SQL engine.

    Scale shape: NO distinct pre-pass (duplicates can't move a max),
    one hash aggregate whose map-side partials collapse to ≤ m rows
    per task before the shuffle; merging day-sketches is a second
    m-row max. ``m`` must divide 256 so the top-byte route is
    uniform.
    """
    _hll_alpha(m, "hll_registers")
    bucket, rho = _hll_route(F.col(key_col).cast("string"), m)
    regs = (
        df.filter(F.col(key_col).isNotNull())
        .select(bucket.alias("bucket"), rho.alias("_rho"))
        .groupBy("bucket")
        .agg(F.max("_rho").alias("_mx"))
    )
    spine = (
        df.sparkSession.range(m)
        .select(F.col("id").cast("int").alias("bucket"))
    )
    return spine.join(regs, "bucket", "left").select(
        "bucket", F.coalesce(F.col("_mx"), F.lit(0)).alias("reg")
    )


def hll_estimate(regs: DataFrame, m: int = 64) -> DataFrame:
    """One-row harmonic-mean estimate from an ``hll_registers`` table.

    All-integer accumulation: Z = Σ 2^-reg is scaled by 2^50 so the
    sum is an exact BIGINT (reg ≤ 49 → terms ≥ 2), making the
    cross-engine double division deterministic; the linear-counting
    small-range correction (E ≤ 2.5m with empty registers) uses ln on
    an exact ratio and is rounded where emitted. alpha_64 = 0.709
    (Flajolet's constant for m = 64).
    """
    alpha = _hll_alpha(m, "hll_estimate")
    s = F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 50 - reg)")).alias("_s")
    v = F.sum(F.when(F.col("reg") == 0, 1).otherwise(0)).alias("_v")
    agg = regs.agg(s, v)
    est = _hll_est_expr(F.col("_s"), F.col("_v"), m, alpha)
    return agg.select(est.alias("hll_raw"))


def hll_ndv_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m: int = 64,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate over an already-
    stringified value column — the NDV engine behind ANALYZE-style
    table profiling (one group per profiled column). Spine-free: a
    present register always has reg ≥ 1 (a 48-bit w > 0 gives rho ≥
    1, w = 0 gives 49), so empty-register accounting folds into
    arithmetic — S gains (m − present)·2⁵⁰, V = m − present — and
    the whole estimate is TWO hash aggregates regardless of group
    count: (group, bucket) max-rho, then an m-row-per-group sum.
    Same md5 routing and scaled-integer Z as ``hll_registers``, so
    estimates hash-verify cross-engine.
    """
    alpha = _hll_alpha(m, "hll_ndv_by")
    bucket, rho = _hll_route(F.col(value_col), m)
    regs = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col), bucket.alias("_bkt"), rho.alias("_rho"))
        .groupBy(group_col, "_bkt")
        .agg(F.max("_rho").alias("_reg"))
    )
    per = regs.groupBy(group_col).agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 50 - _reg)")).alias("_sp"),
        F.count(F.lit(1)).alias("_np"),
    )
    s = F.col("_sp") + (F.lit(m) - F.col("_np")) * F.lit(1 << 50).cast("long")
    v = F.lit(m) - F.col("_np")
    est = _hll_est_expr(s, v, m, alpha)
    return per.select(F.col(group_col), F.round(est, 4).alias("ndv_est"))
