"""Statistical modeling aggregates: per-group OLS trend lines,
MAD-based robust outlier detection, and chi-square independence.

These extend the profiling surface (SURVEY.md §2.4 A4 describe /
§2.13 beyond-ref) from *describing* distributions to *testing* them —
the checks a 100 TB telemetry pipeline runs continuously: "is this
metric drifting?" (trend slope), "how many points are anomalous?"
(robust z-score — median/MAD survives the heavy tails that wreck
mean/stddev), "are these two dimensions independent?" (chi-square).

Reference seed: the exploratory notebook fits a visual trend on the
rating/budget scatter (``Data Cleaning.ipynb:6079-6236``) and
eyeballs outliers before trusting columns — these are the
productionized, scale-safe forms of both.

Everything is a composition of single-pass hash aggregates plus (for
MAD) one exact-percentile pass — no UDFs, no collects; every op
replays in ANSI SQL so the driver hash-verifies it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_trend(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    x_scale: float = 3600.0,
) -> DataFrame:
    """Per-key ordinary-least-squares trend of y over x: slope (per
    ``x_scale`` units of x — pass 3600 for per-hour drift when x is in
    seconds), intercept, and R², plus the sample count. Semantically
    the SQL-standard ``REGR_SLOPE``/``REGR_INTERCEPT``/``REGR_R2``
    family — but computed from EXACT co-moment sums, because the
    native regr aggregates accumulate shifted doubles whose partial-
    merge order differs per engine and wiggles the 4th decimal of the
    intercept (measured Spark vs DuckDB): ``x`` must be an exact
    integer-valued column (e.g. shifted epoch seconds) and ``y``
    2-decimal data, so Σx, Σy, Σx², Σxy, Σy² are DECIMAL/BIGINT-exact
    and commutative; the final slope/intercept/r2 algebra then runs on
    identical doubles on any engine — bit parity by construction.

    One partial+final hash aggregate carrying six co-moments per key
    regardless of table size; the shuffle moves one row per key.

    Pairwise-complete semantics (the REGR_* contract): rows where x
    OR y is NULL are excluded from ``n`` AND every co-moment — a bare
    ``count(*)`` would count rows the NULL-skipping sums ignored and
    silently corrupt the slope.
    """
    # Narrow decimal widths keep every product under precision 38 on
    # any engine (DuckDB errors past 38 rather than capping): x must
    # fit 12 integer digits (epoch-shifted seconds — centuries of
    # span), y 10 integer digits at 4-decimal scale.
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    x = F.col(x_col).cast("decimal(12,0)")
    y = F.col(y_col).cast("decimal(14,4)")
    agg = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(x * y).alias("_sxy"),
        F.sum(y * y).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    syy = F.col("_syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    slope = cov / varx
    return agg.select(
        key_col,
        "n",
        F.round(slope * F.lit(x_scale), 6).alias("slope"),
        F.round((sy - slope * sx) / n, 4).alias("intercept"),
        F.round(cov * cov / (varx * (n * syy - sy * sy)), 6).alias("r2"),
    )


def mad_outlier_counts(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: float = 3.0,
    max_keys: int = 100_000,
) -> DataFrame:
    """Per-key (n, median, mad, n_outliers): the full robust-z-score
    outlier count. Three aggregation passes (median → MAD → fence
    count). The per-key median and MAD tables are FETCHED TO THE
    DRIVER between passes (one row per key — the statistics-driven
    pattern of ``filters.null_prune``): chaining them lazily instead
    makes every downstream consumer re-derive its inputs from the
    fact scan (Spark has no common-subplan reuse below the exchange
    level) — measured 8 fact scans lazy vs 3 with the fetch, and at
    100 TB each re-derivation is a full corpus pass while the fetch
    is ``#keys`` rows. There, also swap ``percentile`` for
    ``approx_percentile`` to collapse each median pass's full sort-
    free but memory-heavy exact aggregation into a sketch. Median/MAD
    are rounded(4) on both engines before the fence compare so
    interpolation ulps can't flip a boundary row.

    The driver fetch is safe only while the key cardinality is small,
    so it is GUARDED: ``approx_count_distinct(key_col)`` is checked
    first and a key space beyond ``max_keys`` (default 100k — ~ a few
    MB of (key, median) rows, comfortably broadcastable) raises
    instead of silently materializing an unbounded table on the
    driver. High-cardinality callers should pre-aggregate or bucket
    the key, or accept the 8-scan fully-lazy formulation explicitly.
    """
    spark = df.sparkSession
    n_keys = df.agg(
        F.approx_count_distinct(key_col).alias("n")
    ).collect()[0]["n"]
    if n_keys > max_keys:
        raise ValueError(
            f"mad_outlier_counts: ~{n_keys} distinct {key_col!r} keys "
            f"exceeds max_keys={max_keys}; the per-key median/MAD "
            "driver fetch would be unbounded. Bucket the key or raise "
            "max_keys explicitly if the driver can hold the rows."
        )
    v = F.col(value_col).cast("double")
    med_rows = (
        df.groupBy(key_col)
        .agg(
            F.round(F.percentile(v, F.lit(0.5)), 4).alias("med"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    if not med_rows:
        # empty input: createDataFrame([]) cannot infer a schema —
        # return the documented shape explicitly instead of crashing
        key_t = df.schema[key_col].dataType.simpleString()
        return spark.createDataFrame(
            [],
            f"{key_col} {key_t}, n long, med double, mad double, "
            "n_outliers long",
        )
    med = F.broadcast(spark.createDataFrame(med_rows))
    mad_rows = (
        df.join(med, key_col)
        .groupBy(key_col)
        .agg(
            F.round(
                F.percentile(F.abs(v - F.col("med")), F.lit(0.5)), 4
            ).alias("mad")
        )
        .collect()
    )
    mad = F.broadcast(spark.createDataFrame(mad_rows))
    return (
        df.join(med, key_col)
        .join(mad, key_col)
        .groupBy(key_col, "n", "med", "mad")
        .agg(
            F.sum(
                (F.abs(v - F.col("med")) > F.lit(k) * F.col("mad")).cast("long")
            ).alias("n_outliers")
        )
    )


def chi2_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns: returns ONE row (chi2, dof, n) from the observed-vs-
    expected contingency table, expected(i,j) = row_i * col_j / N.

    Shape: one hash aggregate builds the contingency cells (the only
    pass over the fact table — cells ≤ |A|×|B|, tiny); the OBSERVED
    cells are completed to the full |A|×|B| grid with a cross join of
    the two category lists before the fold — a never-observed
    combination still contributes (0-E)²/E = E, and skipping it
    understates χ² on sparse tables (caught by the hypothesis
    property suite against the textbook model). Rows with a NULL
    category are EXCLUDED up front (the standard contingency-table
    contract; left in, the non-null-safe grid join would lose their
    observed counts and poison the fold with 0/0 cells), and an
    empty input returns an empty frame instead of crashing schema
    inference on the driver fetch. The observed cell
    table is FETCHED to the driver once (≤|A|×|B| rows — the
    ``null_prune`` statistics pattern): deriving the grid lazily from
    the cells instead re-executes the fact aggregate per consumer
    (measured 6 fact scans vs 1). Marginals are window sums OVER THE
    GRID, not the facts; the χ² fold is a second scalar aggregate
    over the grid. At 100 TB the fact scan dominates and everything
    after it is constant-size.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    cell_rows = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(col_a, col_b)
        .agg(F.count(F.lit(1)).cast("double").alias("_o"))
        .collect()
    )
    if not cell_rows:
        return spark.createDataFrame([], "chi2 double, dof long, n long")
    cells = spark.createDataFrame(cell_rows)
    grid = (
        cells.select(col_a)
        .distinct()
        # broadcast the (tiny, already driver-bounded) category list:
        # an unhinted cross of two distincts plans as CartesianProduct,
        # which the catalog-wide plan sweep forbids — the broadcast
        # form (BroadcastNestedLoopJoin) states the boundedness in the
        # plan itself
        .crossJoin(F.broadcast(cells.select(col_b).distinct()))
    )
    full = grid.join(F.broadcast(cells), [col_a, col_b], "left").select(
        col_a, col_b, F.coalesce(F.col("_o"), F.lit(0.0)).alias("_o")
    )
    wa = Window.partitionBy(col_a)
    wb = Window.partitionBy(col_b)
    wn = Window.partitionBy()
    with_marg = full.select(
        col_a,
        col_b,
        "_o",
        F.sum("_o").over(wa).alias("_ra"),
        F.sum("_o").over(wb).alias("_cb"),
        F.sum("_o").over(wn).alias("_n"),
    )
    e = F.col("_ra") * F.col("_cb") / F.col("_n")
    return with_marg.agg(
        F.round(F.sum((F.col("_o") - e) * (F.col("_o") - e) / e), 4).alias("chi2"),
        (
            (F.count_distinct(F.col(col_a)) - 1)
            * (F.count_distinct(F.col(col_b)) - 1)
        ).alias("dof"),
        F.sum("_o").cast("long").alias("n"),
    )


def cooccurrence_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
) -> DataFrame:
    """Market-basket pair analysis: for every unordered item pair,
    the number of baskets containing BOTH, plus support and lift
    (lift = P(a,b) / (P(a)·P(b)); >1 means the items co-occur more
    than independence predicts — the association-rule signal, and the
    set-membership cousin of the sequence-order ``transition_counts``).

    Shape: (1) distinct (basket, item) — one shuffle, and the ONLY
    pass over the fact table; (2) the pair generation self-joins the
    distinct table on the basket key with ``item_a < item_b`` — fan-out
    is C(items-per-basket, 2), bounded by the per-basket item domain,
    NEVER the basket count; (3) per-item basket counts and the basket
    total are aggregates of the same distinct table, broadcast back
    onto the pair counts (item-domain-sized). Lift arithmetic runs on
    exact counts in double — identical on any engine.

    Returns (item_a, item_b, n_both, support, lift).
    """
    bi = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    n_baskets = bi.agg(
        F.count_distinct(F.col("_b")).alias("_nb")
    )
    item_counts = bi.groupBy("_i").agg(F.count(F.lit(1)).alias("_c"))
    a = bi.select(F.col("_b"), F.col("_i").alias("item_a"))
    b = bi.select(F.col("_b"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_support)
    )
    ca = item_counts.select(F.col("_i").alias("item_a"), F.col("_c").alias("_ca"))
    cb = item_counts.select(F.col("_i").alias("item_b"), F.col("_c").alias("_cb"))
    return (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_both",
            F.round(F.col("n_both") / F.col("_nb"), 6).alias("support"),
            F.round(
                (F.col("n_both").cast("double") * F.col("_nb"))
                / (F.col("_ca").cast("double") * F.col("_cb")),
                4,
            ).alias("lift"),
        )
    )


def group_trend_applyinpandas(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    x_scale: float = 3600.0,
) -> DataFrame:
    """``group_trend``'s Arrow grouped-map twin: the same per-key OLS
    fit computed inside ``groupBy().applyInPandas`` — the documented
    GROUPED-MAP extension point (one pandas frame per key), completing
    the engine's Python surface beside ``mapInPandas`` (multimodal
    codecs), ``applyInPandasWithState`` (stateful sessionization) and
    the Python UDTF (``udtf_chunk_profile``). Use this slot when the
    per-group computation genuinely needs imperative Python (scipy
    fits, per-group models); for anything expressible as aggregates
    the native ``group_trend`` is strictly better (no Python, no
    per-group materialization, map-side partials).

    Arithmetic parity is engineered, not hoped for: the UDF folds the
    SAME exact co-moments as the native DECIMAL plan (x as Python
    arbitrary-precision ints; y via its 4-decimal integer scaling),
    then runs the identical IEEE double algebra — so both paths and
    the SQL oracle agree bit-for-bit. Scale shape: ONE hash shuffle
    on the key; each group materializes as a pandas frame in an Arrow
    batch (bounded by the largest group — the reason the native
    aggregate wins at 100 TB: its state per key is six numbers, not
    the group's rows).
    """
    import pandas as pd

    out_key = key_col
    # preserve the key's real type — a hardcoded string schema would
    # coerce integer keys and break joins against group_trend's output
    key_t = df.schema[key_col].dataType.simpleString()
    empty = pd.DataFrame(
        {out_key: [], "n": [], "slope": [], "intercept": [], "r2": []}
    )

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # pairwise-complete, mirroring the native path's pre-filter:
        # NULL x/y arrives as NaN and int(NaN) would throw; a group
        # with no complete pair vanishes, as it does natively
        pdf = pdf[pdf[x_col].notna() & pdf[y_col].notna()]
        if len(pdf) == 0:
            return empty
        xs = [int(v) for v in pdf[x_col]]
        ys4 = [int(round(float(v) * 10000)) for v in pdf[y_col]]
        n_i = len(xs)
        sx_i = sum(xs)
        sy_i = sum(ys4)                      # scaled 1e4
        sxx_i = sum(v * v for v in xs)
        sxy_i = sum(a * b for a, b in zip(xs, ys4))   # scaled 1e4
        syy_i = sum(v * v for v in ys4)               # scaled 1e8
        # identical double algebra as group_trend: each exact decimal
        # becomes a double with ONE correct rounding — float(Fraction)
        # mirrors the DECIMAL->double cast exactly, where
        # float(int)/1e4 would round twice (int->double overflows 2^53
        # for the scaled squares, then the division rounds again)
        from fractions import Fraction

        n = float(n_i)
        sx = float(sx_i)
        sy = float(Fraction(sy_i, 10**4))
        sxx = float(sxx_i)
        sxy = float(Fraction(sxy_i, 10**4))
        syy = float(Fraction(syy_i, 10**8))
        cov = n * sxy - sx * sy
        varx = n * sxx - sx * sx
        slope = cov / varx
        return pd.DataFrame(
            {
                out_key: [pdf[key_col].iloc[0]],
                "n": [n_i],
                "slope": [round(slope * x_scale, 6)],
                "intercept": [round((sy - slope * sx) / n, 4)],
                "r2": [round(cov * cov / (varx * (n * syy - sy * sy)), 6)],
            }
        )

    schema = (
        f"{out_key} {key_t}, n long, slope double, intercept double, r2 double"
    )
    return df.groupBy(key_col).applyInPandas(fit, schema=schema)


def spearman_by_key(
    df: DataFrame, key_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-key tie-corrected Spearman rank correlation — Pearson on
    AVERAGE ranks, the robust complement to the raw-value Pearson
    (``corr_value_props``): monotone-but-nonlinear association scores
    1.0 here and <1 there, and heavy tails can't dominate ranks.

    Average rank folds from two windows per variable (rank() plus the
    tied-group size) — average rank = rank + (ties−1)/2, always a
    multiple of ½, so DOUBLING it gives exact integers: the co-moment
    sums then accumulate in DECIMAL (exact, commutative — the ×2
    scale cancels in the correlation), and the final ρ algebra runs
    on identical doubles on any engine, the same bit-parity recipe as
    ``group_trend``. Shape: one key shuffle shared by all four
    windows (same partition, two sort orders per variable), one hash
    aggregate; output one row per key.

    Pairwise-complete: rows with NULL x or y are excluded BEFORE
    ranking — standard Spearman semantics, and also what keeps the
    bit-parity claim true (ranking NULLs would pin them to opposite
    ends per engine: Spark windows order NULLS FIRST, DuckDB's
    default is NULLS LAST, so every non-null row's rank would shift).
    """
    from pyspark.sql import Window

    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    wx = Window.partitionBy(key_col).orderBy(x_col)
    wy = Window.partitionBy(key_col).orderBy(y_col)
    cx = Window.partitionBy(key_col, x_col)
    cy = Window.partitionBy(key_col, y_col)
    # doubled average ranks: 2*rank + ties - 1 (exact integers)
    rx = (
        F.rank().over(wx) * 2 + F.count(F.lit(1)).over(cx) - 1
    ).cast("decimal(18,0)")
    ry = (
        F.rank().over(wy) * 2 + F.count(F.lit(1)).over(cy) - 1
    ).cast("decimal(18,0)")
    ranked = df.select(F.col(key_col), rx.alias("_rx"), ry.alias("_ry"))
    agg = ranked.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_rx").alias("_sx"),
        F.sum("_ry").alias("_sy"),
        F.sum(F.col("_rx") * F.col("_rx")).alias("_sxx"),
        F.sum(F.col("_rx") * F.col("_ry")).alias("_sxy"),
        F.sum(F.col("_ry") * F.col("_ry")).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    syy = F.col("_syy").cast("double")
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select(
        key_col, "n", F.round(num / den, 4).alias("rho")
    )


def _bounded_value_counts(
    counts: DataFrame, op_name: str, max_values: int
) -> DataFrame:
    """Enforce — not assume — the "bounded value domain" precondition
    behind the rank-statistic operators' single-partition ECDF/rank
    windows, WITHOUT a second fact pass: the value-grain counts table
    (the one reduction every operator in this family starts from) is
    SNAPSHOT to scratch, a short-circuiting ``limit(max+1).count()``
    probe over the materialized rows raises with a diagnostic when
    the distinct-value cardinality exceeds ``max_values``, and the
    snapshot is returned for the window/aggregate stages to reuse —
    so the facts are scanned exactly once, the guard is exact (not
    HLL-approximate), and nothing downstream re-derives the
    reduction. Construction is deliberately eager (the
    ``mad_outlier_counts`` precedent): a raised error beats a silent
    single-partition sort of an unbounded domain. Callers with a
    genuinely huge discrete domain should quantize (round/bucket)
    the value first — which is also what makes the statistic
    meaningful there."""
    from ..sources.scratch import snapshot

    snap = snapshot(counts, prefix=f"{op_name}_vc_")
    probe = snap.limit(max_values + 1).count()
    if probe > max_values:
        raise ValueError(
            f"{op_name}: more than max_values={max_values} distinct "
            "values; the value-domain window would single-partition "
            "sort an unbounded domain. Quantize the value column "
            "(round/bucket) or raise max_values explicitly."
        )
    return snap


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    alpha_c: float = 1.358,
    max_values: int = 2_000_000,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between two groups' value
    distributions: D = sup |ECDF_a - ECDF_b| — the continuous
    distribution-drift check beside the categorical chi-square
    (``chi2_independence``), with the α=0.05 rejection threshold
    c(α)·√((n_a+n_b)/(n_a·n_b)).

    Scale shape: the fact table reduces to per-(value, group) COUNTS
    first (one hash shuffle — the only pass over the facts), and the
    ECDF window walks the DISTINCT-VALUE table, not the rows: the
    single-partition global-order window KS inherently needs runs
    over the value domain (bounded — e.g. 2-decimal telemetry has
    ≤ range×100 points), never the 100 TB of observations. ECDF
    ratios are integer/integer IEEE divisions — identical on any
    engine — and D is a max over them: exact comparisons, no sum
    accumulation anywhere.

    Returns one row (n_a, n_b, ks_stat, threshold, reject).
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    base = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        v.alias("_v"), F.col(group_col).alias("_g")
    )
    counts = _bounded_value_counts(
        base.groupBy("_v").agg(
            F.sum((F.col("_g") == group_a).cast("long")).alias("_ca"),
            F.sum((F.col("_g") == group_b).cast("long")).alias("_cb"),
        ),
        "ks_two_sample",
        max_values,
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy()
    staged = counts.select(
        "_v",
        F.sum("_ca").over(w).alias("_cuma"),
        F.sum("_cb").over(w).alias("_cumb"),
        F.sum("_ca").over(wn).alias("_na"),
        F.sum("_cb").over(wn).alias("_nb"),
    )
    fa = F.col("_cuma").cast("double") / F.col("_na").cast("double")
    fb = F.col("_cumb").cast("double") / F.col("_nb").cast("double")
    agg = staged.groupBy("_na", "_nb").agg(
        F.round(F.max(F.abs(fa - fb)), 6).alias("ks_stat")
    )
    thresh = F.round(
        F.lit(alpha_c)
        * F.sqrt(
            (F.col("_na") + F.col("_nb")).cast("double")
            / (F.col("_na") * F.col("_nb")).cast("double")
        ),
        6,
    )
    return agg.select(
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        "ks_stat",
        thresh.alias("threshold"),
        (F.col("ks_stat") > thresh).alias("reject"),
    )


def mannwhitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    max_values: int = 2_000_000,
) -> DataFrame:
    """Two-sample Mann-Whitney U (Wilcoxon rank-sum) test: does group
    a's value distribution sit HIGHER than group b's — the rank-based
    location test beside KS's shape test (``ks_two_sample``), immune
    to outliers and monotone transforms.

    Exactness recipe: DOUBLED average ranks over the combined sample
    are exact integers (the ``spearman_by_key`` trick), so the rank
    sum, U, and the tie-correction term Σ(t³−t) all accumulate
    exactly; the normal-approximation z (tie-corrected variance)
    is then one identical double expression per engine.

    Scale shape — the KS reduction (``ks_two_sample`` above): the
    raw rows reduce to one (value, count_a, count_b) row per DISTINCT
    value first, and the doubled average rank is pure count
    arithmetic over that grain — for value v with t_v total ties and
    cum(<v) rows strictly below, r2(v) = 2·cum(<v) + t_v + 1, and the
    rank sum of group a is Σ count_a(v)·r2(v)/2. The single-partition
    global-order window therefore walks the bounded value DOMAIN
    (e.g. 2-decimal telemetry: ≤ range×100 rows), never the 100 TB of
    observations; tie correction falls out of the same grain. One
    shuffle (the value-grain groupBy), one bounded window, one
    aggregate.

    Returns one row (n_a, n_b, u_a, z_score).
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    base = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        v.alias("_v"), F.col(group_col).alias("_g")
    )
    counts = _bounded_value_counts(
        base.groupBy("_v").agg(
            F.sum((F.col("_g") == group_a).cast("long")).alias("_ca"),
            F.sum((F.col("_g") == group_b).cast("long")).alias("_cb"),
        ),
        "mannwhitney_u",
        max_values,
    )
    wlt = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    t = F.col("_ca") + F.col("_cb")
    cum_lt = F.coalesce(F.sum(t).over(wlt), F.lit(0).cast("long"))
    # Doubled average rank of value v — exact integer; the per-value
    # contribution count_a(v)·r2(v) accumulates in DECIMAL(38,0) so
    # the sum is order-independent and overflow-free.
    r2 = (cum_lt * 2 + t + 1).cast("decimal(38,0)")
    staged = counts.select(
        "_ca",
        "_cb",
        (F.col("_ca").cast("decimal(38,0)") * r2).alias("_r2a"),
        # tie term in DECIMAL too: t³ passes int64 at ~2.1M ties on a
        # single value, well inside the guard's distinct-value bound
        (t.cast("decimal(38,0)") * t * t - t).alias("_t3"),
    )
    agg = staged.agg(
        F.sum("_ca").alias("na"),
        F.sum("_cb").alias("nb"),
        F.sum("_r2a").alias("sr2a"),
        F.sum("_t3").alias("_tie3"),
    )
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    n = na + nb
    # rank sum of a = sr2a / 2 (exact halves); U_a = R_a - na(na+1)/2
    ra = F.col("sr2a").cast("double") / F.lit(2.0)
    ua = ra - na * (na + F.lit(1.0)) / F.lit(2.0)
    var = (
        na * nb / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("_tie3").cast("double") / (n * (n - F.lit(1.0))))
    )
    z = (ua - na * nb / F.lit(2.0)) / F.sqrt(var)
    return agg.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(ua, 2).alias("u_a"),
        F.round(z, 4).alias("z_score"),
    )


# Poisson(1) inverse-CDF thresholds as 7-hex-char literals: the
# boundary P(X<=n)·2^28 for n = 0..3, rendered in the same domain as
# the md5 substring itself. For fixed-width lowercase hex,
# LEXICOGRAPHIC order IS numeric order, so ``substr(md5(id#chunk),
# 7·slot+1, 7) < threshold`` classifies the draw with ONE string
# compare — no hex→decimal conversion in the 15M-draw hot path
# (``conv`` measured +2.4 s at sf0.1 inside the fan-out stage). 28
# bits per draw lets ONE digest feed 4 replicates (see
# ``bootstrap_mean_ci``), quartering the md5 count. Counts beyond 4
# are truncated to 4 (P ≈ 0.37% of rows, bias negligible against
# bootstrap noise; the truncation is part of the pinned definition,
# not an approximation the oracle can disagree with).
_POISSON1_HEX = (
    "5e2d58d",  # P(0) = 1/e
    "bc5ab1b",  # P(<=1)
    "eb715e1",  # P(<=2)
    "fb23979",  # P(<=3)
)


def bootstrap_mean_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    n_replicates: int = 100,
    lo: float = 0.025,
    hi: float = 0.975,
) -> DataFrame:
    """Per-key bootstrap confidence interval for the mean via the
    POISSON BOOTSTRAP (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", 2012) — the resampling scheme that works
    in one distributed pass: instead of drawing n rows with
    replacement (which needs global coordination), each row enters
    replicate b with an independent Poisson(1) multiplicity, derived
    HERE from a 28-bit slice of md5(id, b//4) → U(0,1) → inverse CDF
    (four replicate draws per digest), so the "randomness" is
    deterministic, partition-invariant, and replayable in any engine
    with md5.

    Per (key, replicate): mean_b = Σ w·x / Σ w with the numerator in
    DECIMAL (w is a small int, so w·x is exact) — order-independent
    addition, bit-identical across engines. The CI is the
    [lo, hi] percentile over the replicate means.

    Scale shape: a ``n_replicates``-way fan-out projection (no data
    shuffle — the explode is map-side) into ONE aggregate keyed by
    (key, b) with map-side combine; the percentile pass runs over
    #keys × B rows. At 100 TB, B=100 multiplies the SCAN's row stream
    but not its I/O; the aggregate state is #keys × B cells.

    Returns (key, n_rows, mean_full, ci_lo, ci_hi).
    """
    # ONE md5 per (row, chunk-of-4-replicates): the digest has 32 hex
    # chars, each replicate draw needs only 28 bits of uniformity, so
    # four 7-hex slices per digest cut the dominant cost — the string
    # build + md5 — 4×. Measured at sf0.1 (15M draws, isolated warm):
    # 9.1 s per-replicate md5 → 3.3 s chunked. The draw for replicate
    # b = 4·chunk + slot is substr(md5(id#chunk), 7·slot+1, 7);
    # fixed-width lowercase hex compares numerically as a string, so
    # the inverse CDF stays a 4-way when-chain against 7-hex literals
    # (28-bit thresholds — the scheme IS the pinned definition, and
    # the oracle replays it digest-for-digest; conv() to integers
    # measured +2.4 s, rejected).
    n_chunks = (n_replicates + 3) // 4
    ck = F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("_ci")
    sl = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("_si")
    hs = F.substring(F.col("_h"), F.col("_si") * 7 + 1, F.lit(7))
    c0, c1, c2, c3 = _POISSON1_HEX
    w = (
        F.when(hs < c0, 0)
        .when(hs < c1, 1)
        .when(hs < c2, 2)
        .when(hs < c3, 3)
        .otherwise(4)
    )
    # 4-decimal values as scaled LONGS: w·x and Σ are exact 64-bit
    # integer arithmetic (≈3× the throughput of DECIMAL aggregation
    # at 15M rows) and still order-independent; the /10⁴ descale
    # happens once per (key, replicate) in the SAME division sequence
    # as the oracle.
    x = (F.col(value_col).cast("decimal(18,4)") * 10000).cast("long")
    # Decouple fan-out parallelism from the scan's file splits: the
    # B-way explode + per-row md5 runs in the SAME stage as the scan,
    # so a table read as 2 parquet splits would hash B·n rows on 2
    # cores (measured 25 s → 3 s at sf0.1). The narrow (key, x, id)
    # pre-shuffle is tiny next to the B× hash work it parallelizes;
    # on a real cluster with thousands of input splits it is a no-op
    # cost-wise (one extra narrow exchange).
    # NULL values are excluded up front so n_rows and the sums agree
    # (a NULL would be skipped by sum but counted by count(1))
    df = df.filter(F.col(value_col).isNotNull())
    narrow = df.select(
        F.col(key_col).alias("_k"), x.alias("_x"), F.col(id_col)
    ).repartition(F.col(id_col))
    hashed = narrow.select("_k", "_x", F.col(id_col), ck).select(
        "_k",
        "_x",
        "_ci",
        F.md5(
            F.concat_ws("#", F.col(id_col).cast("string"), F.col("_ci"))
        ).alias("_h"),
    )
    fan = hashed.select("_k", "_x", "_ci", "_h", sl).filter(
        F.col("_ci") * 4 + F.col("_si") < F.lit(n_replicates)
    )
    rep = (
        fan.select(
            "_k",
            (F.col("_ci") * 4 + F.col("_si")).alias("_bi"),
            "_x",
            w.alias("_w"),
        )
        .groupBy("_k", "_bi")
        .agg(
            F.sum(F.col("_x") * F.col("_w")).alias("_wx"),
            F.sum("_w").alias("_wsum"),
        )
        # a replicate that drew all-zero Poisson weights (probability
        # (1/e)^n — common for tiny keys) resamples NOTHING: skip it,
        # else 0/0 = NaN sorts above every double and corrupts the
        # upper percentile
        .filter(F.col("_wsum") > 0)
        .select(
            "_k",
            "_bi",
            (
                F.col("_wx").cast("double")
                / F.lit(10000.0)
                / F.col("_wsum").cast("double")
            ).alias("_mean_b"),
        )
    )
    cis = rep.groupBy("_k").agg(
        F.percentile("_mean_b", F.lit(lo)).alias("_lo"),
        F.percentile("_mean_b", F.lit(hi)).alias("_hi"),
    )
    full = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (
            F.sum(x).cast("double") / F.lit(10000.0) / F.count(F.lit(1))
        ).alias("mean_full"),
    )
    return full.join(cis, "_k").select(
        F.col("_k").alias(key_col),
        "n_rows",
        F.round("mean_full", 4).alias("mean_full"),
        F.round("_lo", 4).alias("ci_lo"),
        F.round("_hi", 4).alias("ci_hi"),
    )


def seasonal_robust_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-(key, hour-of-day) robust anomaly counts: the SEASONAL
    baseline screen — "is 3 AM traffic weird *for 3 AM*?" — median/MAD
    fences computed per seasonal cell instead of per key, so a nightly
    lull never trips a daytime threshold.

    Same rounded-median/MAD recipe as ``mad_outlier_counts`` but fully
    LAZY: the per-cell baselines (|keys|×24 rows) are SNAPSHOT to
    scratch (``sources.scratch``) instead of driver-fetched — the
    documented other side of that operator's trade, correct for
    arbitrary key cardinality; each baseline is derived once and both
    downstream passes read the materialized cells.

    Hour-of-day is integer epoch arithmetic (``epoch_s // 3600 % 24``)
    — engine-portable, no timezone/locale surface.

    Returns (key, hod, n, med, mad, n_anomalies).
    """
    from ..sources.scratch import snapshot

    hod = (
        F.pmod(
            F.floor(F.unix_timestamp(F.col(ts_col)) / 3600), F.lit(24)
        )
    ).cast("int")
    v = F.col(value_col).cast("double")
    base = df.select(
        F.col(key_col).alias("_k"), hod.alias("hod"), v.alias("_v")
    )
    med = snapshot(
        base.groupBy("_k", "hod").agg(
            F.round(F.percentile(F.col("_v"), F.lit(0.5)), 4).alias("med"),
            F.count(F.lit(1)).alias("n"),
        ),
        prefix="seasonal_med_",
    )
    with_med = base.join(F.broadcast(med), ["_k", "hod"])
    mad = snapshot(
        with_med.groupBy("_k", "hod").agg(
            F.round(
                F.percentile(F.abs(F.col("_v") - F.col("med")), F.lit(0.5)), 4
            ).alias("mad")
        ),
        prefix="seasonal_mad_",
    )
    return (
        base.join(F.broadcast(med), ["_k", "hod"])
        .join(F.broadcast(mad), ["_k", "hod"])
        .groupBy(F.col("_k").alias(key_col), "hod", "n", "med", "mad")
        .agg(
            F.sum(
                (
                    F.abs(F.col("_v") - F.col("med"))
                    > F.lit(k) * F.col("mad")
                ).cast("long")
            )
            .cast("long")
            .alias("n_anomalies")
        )
    )


def kaplan_meier(
    subjects: DataFrame,
    group_col: str,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve per stratum over right-censored
    durations — the time-to-event estimator (time-to-conversion,
    time-to-churn) that plain averages get WRONG under censoring
    (dropping censored subjects biases down, counting them as events
    biases up; KM handles them exactly).

    ``subjects``: one row per subject with a stratum, a duration and
    an observed flag (1 = event, 0 = censored). At each distinct
    event time t: S(t) = Π_{t_j ≤ t} (1 − d_j / n_j) with d_j events
    at t_j and n_j subjects still at risk (duration ≥ t_j).

    Determinism: d and n-at-risk are exact integer aggregates; the
    product runs as exp(Σ ln(1 − d/n)) over an ordered running
    window — a sequential fold both engines evaluate identically —
    with an explicit zero flag once any factor hits 0 (ln(0) is an
    error under ANSI; the flag keeps the tail exactly 0.0), and the
    curve rounds(6) on emission.

    Scale shape: one (stratum, duration) hash aggregate collapses
    subjects to distinct times; totals/cumulatives are windows
    PARTITIONED BY stratum (no global sort — strata parallelize);
    output is event-time-grained, not subject-grained.
    """
    from pyspark.sql import Window

    g = subjects.groupBy(group_col, duration_col).agg(
        F.count(F.lit(1)).alias("_n_at"),
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
    )
    wp = Window.partitionBy(group_col)
    wo = Window.partitionBy(group_col).orderBy(duration_col)
    g = (
        g.withColumn("_tot", F.sum("_n_at").over(wp))
        .withColumn("_cum", F.sum("_n_at").over(wo))
        .withColumn("n_risk", F.col("_tot") - F.col("_cum") + F.col("_n_at"))
    )
    term = F.lit(1.0) - F.col("n_events").cast("double") / F.col(
        "n_risk"
    ).cast("double")
    g = g.withColumn(
        "_lnt", F.when(term > 0, F.log(term)).otherwise(F.lit(0.0))
    ).withColumn("_z", F.when(term <= 0, F.lit(1)).otherwise(F.lit(0)))
    g = g.withColumn("_lsum", F.sum("_lnt").over(wo)).withColumn(
        "_zany", F.max("_z").over(wo)
    )
    surv = F.when(F.col("_zany") == 1, F.lit(0.0)).otherwise(
        F.exp(F.col("_lsum"))
    )
    return (
        g.filter(F.col("n_events") > 0)
        .select(
            group_col,
            duration_col,
            "n_risk",
            "n_events",
            F.round(surv, 6).alias("survival"),
        )
    )


def fd_strength(
    df: DataFrame,
    candidates: list[tuple[str, str, str]],
) -> DataFrame:
    """Functional-dependency strength profile: for each candidate
    X→Y, the normalized information dependency
    1 − H(Y|X)/H(Y) — 1.0 for an exact FD, ~0 for independent
    columns; the number schema-discovery tools rank candidate keys
    and denormalization opportunities by (complements
    ``fk_discovery_profile``'s containment check with an
    information-theoretic one that grades PARTIAL dependencies).

    ``candidates`` is a list of (name, x_col, y_col). ALL candidates
    are profiled in ONE fact scan: the pairs melt through a single
    explode-of-structs projection, then one (fd, x, y) count
    aggregate feeds both entropy sums. Determinism: entropies are
    Σ n·ln(ratio) over exact integer counts with each term
    rounded(6) and summed as DECIMAL (order-free), divided by N only
    at the end; H(Y|X) uses the chain form
    (1/N)·Σ_xy n_xy·ln(n_x/n_xy).

    Returns (fd, h_y, h_y_given_x, strength), all rounded(6);
    degenerate Y (H(Y) = 0, a constant column) reports strength 1.0
    — a constant is trivially determined by anything.
    """
    from pyspark.sql import Window

    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("fd"),
                        F.col(x).cast("string").alias("_x"),
                        F.col(y).cast("string").alias("_y"),
                    )
                    for name, x, y in candidates
                ]
            )
        ).alias("c")
    ).select("c.fd", "c._x", "c._y")
    from ..sources.scratch import snapshot

    cells = snapshot(
        melted.groupBy("fd", "_x", "_y").agg(F.count(F.lit(1)).alias("_nxy")),
        prefix="fd_cells_",
    )
    wx = Window.partitionBy("fd", "_x")
    wy = Window.partitionBy("fd", "_y")
    wn = Window.partitionBy("fd")
    terms = cells.select(
        "fd",
        "_nxy",
        F.sum("_nxy").over(wx).alias("_nx"),
        F.sum("_nxy").over(wy).alias("_ny"),
        F.sum("_nxy").over(wn).alias("_n"),
    )
    t_cond = F.round(
        F.col("_nxy").cast("double")
        * F.log(F.col("_nx").cast("double") / F.col("_nxy").cast("double")),
        6,
    ).cast("decimal(28,6)")
    per = terms.groupBy("fd").agg(
        F.sum(t_cond).alias("_sc"),
        F.max("_n").alias("_n"),
    )
    # H(Y) needs per-(fd, y) marginals — a second tiny aggregate over
    # the SNAPSHOTTED cells, never a second fact scan.
    ymarg = (
        cells.groupBy("fd", "_y")
        .agg(F.sum("_nxy").alias("_ny"))
        .withColumn("_n", F.sum("_ny").over(Window.partitionBy("fd")))
        .select(
            "fd",
            F.round(
                F.col("_ny").cast("double")
                * F.log(F.col("_n").cast("double") / F.col("_ny").cast("double")),
                6,
            )
            .cast("decimal(28,6)")
            .alias("_ty"),
        )
        .groupBy("fd")
        .agg(F.sum("_ty").alias("_sy"))
    )
    hy = F.col("_sy").cast("double") / F.col("_n").cast("double")
    hyx = F.col("_sc").cast("double") / F.col("_n").cast("double")
    return per.join(ymarg, "fd").select(
        "fd",
        F.round(hy, 6).alias("h_y"),
        F.round(hyx, 6).alias("h_y_given_x"),
        F.round(
            F.when(hy > 0, F.lit(1.0) - hyx / hy).otherwise(F.lit(1.0)), 6
        ).alias("strength"),
    )


def mann_kendall(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    z_crit: float = 1.959964,
) -> DataFrame:
    """Mann-Kendall monotonic-trend test per key: S = Σ_{i<j}
    sign(v_j − v_i) over the ``order_col`` sequence, the
    tie-corrected variance, and the normal-approximation z — the
    nonparametric "is this series drifting" test run on metric
    rollups (no distributional assumption, robust to outliers, the
    standard pick for environmental/ops monitoring series).

    Determinism: ``value_col`` must be integer-exact (quantize
    upstream); S is then an exact integer sum of ±1/0, the tie term
    Σ t(t−1)(2t+5) is exact, and z = (S∓1)/sqrt(var) is one IEEE
    division after a correctly-rounded sqrt — both engines agree
    bit-for-bit, rounded(6) in the output.

    Scale shape: the O(n²) pair join runs on the AGGREGATED series
    (|keys|·n rows, n = points per key), never the fact — callers
    roll up first (daily buckets → n≈365/year). The join is
    key-partitioned, so pairs never cross keys; ties and counts are
    two more aggregates of the same tiny input.

    Returns (key, n, s_stat, var_s, z, trend) with trend ∈
    {increasing, decreasing, no trend} at ``z_crit`` (default: the
    two-sided 5% point, a plan-time literal so both engines compare
    the same constant).
    """
    a = df.select(
        F.col(key_col),
        F.col(order_col).alias("_o"),
        F.col(value_col).cast("long").alias("_v"),
    )
    b = a.select(
        F.col(key_col), F.col("_o").alias("_o2"), F.col("_v").alias("_v2")
    )
    s = (
        a.join(b, key_col)
        .filter(F.col("_o") < F.col("_o2"))
        .groupBy(key_col)
        .agg(
            F.sum(
                F.signum((F.col("_v2") - F.col("_v")).cast("double")).cast(
                    "long"
                )
            ).alias("s_stat")
        )
    )
    n = a.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    ties = (
        a.groupBy(key_col, "_v")
        .agg(F.count(F.lit(1)).alias("_t"))
        .groupBy(key_col)
        .agg(
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            ).alias("_tie_term")
        )
    )
    nd = F.col("n").cast("double")
    var_s = (
        nd * (nd - 1) * (2 * nd + 5) - F.col("_tie_term").cast("double")
    ) / F.lit(18.0)
    sd = F.col("s_stat").cast("double")
    z = (
        F.when(var_s <= 0, F.lit(0.0))
        .when(sd > 0, (sd - 1) / F.sqrt(var_s))
        .when(sd < 0, (sd + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return (
        # LEFT join: a single-point series produces no pair rows, but
        # the key must still be REPORTED (n=1, S=0, no trend) — a
        # silent drop reads as "no data" where the truth is
        # "insufficient data"
        n.join(s, key_col, "left")
        .join(ties, key_col)
        .withColumn("s_stat", F.coalesce(F.col("s_stat"), F.lit(0)))
        .select(
            F.col(key_col),
            "n",
            "s_stat",
            F.round(var_s, 6).alias("var_s"),
            F.round(z, 6).alias("z"),
            F.when(z > F.lit(z_crit), F.lit("increasing"))
            .when(z < F.lit(-z_crit), F.lit("decreasing"))
            .otherwise(F.lit("no trend"))
            .alias("trend"),
        )
    )


def _binary_value_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    pos: str,
    neg: str,
    max_values: int = 2_000_000,
    scale: int = 100,
) -> DataFrame:
    """(value_cents, n_pos, n_neg) at DISTINCT-VALUE grain — the shared
    reduction behind the binary-classifier evaluation family (AUC /
    gains), identical in shape to the rank-test reduction
    (``ks_two_sample``): one hash shuffle over the facts, then every
    downstream window walks the bounded score domain. Scores are
    quantized to exact cents BIGINTs (2-decimal inputs — the same
    fixed-point contract as the k-means quantizer), so all cumulative
    arithmetic downstream is integer-exact."""
    base = df.filter(
        F.col(group_col).isin([pos, neg]) & F.col(value_col).isNotNull()
    ).select(
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("_v"),
        F.col(group_col).alias("_g"),
    )
    return _bounded_value_counts(
        base.groupBy("_v").agg(
            F.sum((F.col("_g") == pos).cast("long")).alias("_np"),
            F.sum((F.col("_g") == neg).cast("long")).alias("_nn"),
        ),
        "binary_value_counts",
        max_values,
    )


def roc_auc(
    df: DataFrame,
    group_col: str,
    value_col: str,
    pos: str,
    neg: str,
) -> DataFrame:
    """ROC AUC of ``value_col`` as a ranking score for ``pos`` vs
    ``neg`` rows — the probability a random positive outscores a
    random negative, ties counting half (the Mann-Whitney identity
    AUC = U/(n⁺·n⁻), which is also why this reduces EXACTLY like
    ``mannwhitney_u``).

    Exactness: at value grain, 2·numerator = Σ_v n⁺(v)·(2·cum⁻(<v) +
    n⁻(v)) is a BIGINT (every tie contributes exactly half), so AUC
    is ONE double division of exact integers — bit-identical on any
    engine, no per-row ranks, no floating accumulation. One fact
    shuffle + one bounded-domain window.

    Returns one row (n_pos, n_neg, auc).
    """
    from pyspark.sql import Window

    counts = _binary_value_counts(df, group_col, value_col, pos, neg)
    wlt = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    cum_neg = F.coalesce(F.sum("_nn").over(wlt), F.lit(0).cast("long"))
    # DECIMAL(38,0) BEFORE the multiply: the pairwise numerator is
    # O(n⁺·n⁻) and the per-value PRODUCT itself passes int64 near
    # ~3e9 rows per class (casting only the product would overflow
    # first and then cast garbage); DuckDB's HUGEINT sum mirrors it.
    staged = counts.select(
        "_np",
        "_nn",
        (
            F.col("_np").cast("decimal(38,0)")
            * (cum_neg * 2 + F.col("_nn")).cast("decimal(38,0)")
        ).alias("_c"),
    )
    agg = staged.agg(
        F.sum("_np").alias("n_pos"),
        F.sum("_nn").alias("n_neg"),
        F.sum("_c").alias("_num2"),
    )
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(
            F.col("_num2").cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            ),
            6,
        ).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    group_col: str,
    value_col: str,
    pos: str,
    neg: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + ECE for ``value_col`` min-max-normalized
    as a pseudo-probability of the ``pos`` class: rows land in
    ``n_bins`` equal-width score bins, and each bin reports its mean
    normalized score against the observed positive rate — the gap
    between the two is the mis-calibration the diagram visualizes,
    and ECE is the n-weighted mean absolute gap repeated on every row
    (scalar column — the driver canonicalizer takes no structs).

    Exactness recipe: bin assignment is floor((v−min)·n_bins /
    (max−min)) over cents-scaled BIGINTs — the operands are exact
    integers well under 2^53, so the one IEEE division is the SAME
    double on every engine and its floor is engine-invariant (the
    oracle replays the identical expression; never mix this with
    integer ``//``, whose rounding can differ from the float floor at
    exact bucket boundaries). Per-bin mean score exploits linearity,
    mean(p̂) = (mean(v)−min)/(max−min), and the ECE sum is
    INTEGER-exact — rounded-gap micro-units × n, mirroring the
    oracle term-for-term — so no order-dependent double accumulation
    exists on either engine. The min/max bounds are a 2-value driver
    fetch off the value-grain snapshot (embedded as literals — the
    statistics-driven pattern), which also lets a DEGENERATE range
    (single distinct score) raise a clear error instead of emitting
    engine-dependent 0/0 NaNs.
    """
    from pyspark.sql import Window

    counts = _binary_value_counts(df, group_col, value_col, pos, neg)
    [bounds] = counts.agg(
        F.min("_v").alias("lo"), F.max("_v").alias("hi")
    ).collect()
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None:
        raise ValueError(
            "calibration_bins: no rows in either class after filtering"
        )
    if lo == hi:
        raise ValueError(
            "calibration_bins: all scores share one value — the "
            "min-max normalization is degenerate (0/0); a constant "
            "score cannot be calibrated"
        )
    b = F.least(
        F.floor(
            (F.col("_v") - F.lit(lo)) * n_bins / F.lit(hi - lo)
        ).cast("long"),
        F.lit(n_bins - 1),
    )
    t = F.col("_np") + F.col("_nn")
    binned = (
        counts.select(
            b.alias("bin"),
            "_np",
            "_nn",
            # DECIMAL: Σ count·cents passes int64 around 9e18
            (t.cast("decimal(38,0)") * F.col("_v")).alias("_vsum"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.col("_np") + F.col("_nn")).alias("_n"),
            F.sum("_np").alias("_pos"),
            F.sum("_vsum").alias("_vs"),
        )
    )
    mean_p = (
        F.col("_vs").cast("double") / F.col("_n").cast("double")
        - F.lit(float(lo))
    ) / F.lit(float(hi - lo))
    rate = F.col("_pos").cast("double") / F.col("_n").cast("double")
    gap = F.round(F.abs(mean_p - rate), 6)
    w_all = Window.partitionBy()
    staged = binned.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("_n").cast("long").alias("n"),
        F.col("_pos").cast("long").alias("n_pos"),
        F.round(mean_p, 6).alias("mean_score"),
        F.round(rate, 6).alias("pos_rate"),
        gap.alias("gap"),
        # micro-unit integer weight: exact, order-free sum
        (
            F.round(gap * 1000000, 0).cast("long") * F.col("_n")
        ).alias("_wgap_u"),
    )
    ece = F.round(
        F.sum("_wgap_u").over(w_all).cast("double")
        / (F.lit(1000000.0) * F.sum("n").over(w_all).cast("double")),
        6,
    )
    return staged.select(
        "bin", "n", "n_pos", "mean_score", "pos_rate", "gap",
        ece.alias("ece"),
    )


def gains_deciles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    pos: str,
    neg: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Cumulative-gains table: rank rows by score DESCENDING, cut into
    ``n_buckets`` population slices, and report per slice how much of
    the total positive class the prefix has captured (capture_rate)
    and its lift over random targeting — the campaign-targeting /
    risk-triage readout of a ranking model.

    Tie policy (pinned): a distinct score lands WHOLLY in the bucket
    of its cumulative row count — bucket = ceil(B·cum_n/N) on exact
    integers — unlike NTILE, which splits ties arbitrarily across
    engines. The window walks the distinct-value table ordered
    descending (bounded domain, the family's standard shape); capture
    and lift are one-shot divisions of integer sums.

    Returns one row per non-empty bucket: (bucket, n, n_pos,
    capture_rate, lift).
    """
    from pyspark.sql import Window

    counts = _binary_value_counts(df, group_col, value_col, pos, neg)
    wd = Window.orderBy(F.desc("_v")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    t = F.col("_np") + F.col("_nn")
    staged = counts.select(
        "_np",
        "_nn",
        F.sum(t).over(wd).alias("_cum_n"),
        F.sum("_np").over(wd).alias("_cum_pos"),
        F.sum(t).over(wall).alias("_n_tot"),
        F.sum("_np").over(wall).alias("_p_tot"),
    )
    bucket = F.ceil(
        F.col("_cum_n") * n_buckets / F.col("_n_tot")
    ).cast("long")
    per = (
        staged.select(
            bucket.alias("bucket"),
            (F.col("_np") + F.col("_nn")).alias("_t"),
            "_np",
            "_cum_pos",
            "_cum_n",
            "_n_tot",
            "_p_tot",
        )
        .groupBy("bucket", "_n_tot", "_p_tot")
        .agg(
            F.sum("_t").alias("_n"),
            F.sum("_np").alias("_pos"),
            F.max("_cum_pos").alias("_cpos"),
            F.max("_cum_n").alias("_cn"),
        )
    )
    capture = F.col("_cpos").cast("double") / F.col("_p_tot").cast("double")
    lift = (
        F.col("_cpos").cast("double") * F.col("_n_tot").cast("double")
    ) / (F.col("_cn").cast("double") * F.col("_p_tot").cast("double"))
    return per.select(
        "bucket",
        F.col("_n").cast("long").alias("n"),
        F.col("_pos").cast("long").alias("n_pos"),
        F.round(capture, 6).alias("capture_rate"),
        F.round(lift, 6).alias("lift"),
    )


def average_precision(
    df: DataFrame,
    group_col: str,
    value_col: str,
    pos: str,
    neg: str,
    max_values: int = 2_000_000,
) -> DataFrame:
    """Average precision (area under the precision-recall curve,
    sklearn's ``average_precision_score`` definition): thresholds
    sweep the DISTINCT scores descending, each contributing
    ΔRecall·Precision — the ranking readout that stays informative
    under class imbalance where ROC AUC (``roc_auc``) saturates.

    Exactness: at value grain, tp/fp at each threshold are exact
    cumulative BIGINTs; each term (n⁺_v/P)·(tp/(tp+fp)) is a fixed
    two-division IEEE chain over those integers — identical on any
    engine — and the cross-threshold sum is made ORDER-FREE by
    floor-truncating every term to integer micro-units first (the
    repo's per-term-quantize pattern; terms are ≤1 so the 1e12 scale
    keeps the sum far under 2^63 at any corpus size).

    Scale shape: one fact shuffle to (value, n⁺, n⁻) counts, one
    bounded-domain cumulative window, one scalar aggregate. Returns
    one row (n_pos, n_neg, ap).
    """
    from pyspark.sql import Window

    counts = _binary_value_counts(
        df, group_col, value_col, pos, neg, max_values
    )
    wge = Window.orderBy(F.desc("_v")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy()
    staged = counts.select(
        "_np",
        F.sum("_np").over(wge).alias("_tp"),
        F.sum("_nn").over(wge).alias("_fp"),
        F.sum("_np").over(wn).alias("_p"),
        F.sum("_nn").over(wn).alias("_n"),
    )
    term = (
        F.col("_np").cast("double") / F.col("_p").cast("double")
    ) * (
        F.col("_tp").cast("double")
        / (F.col("_tp") + F.col("_fp")).cast("double")
    )
    # agg (not groupBy) keeps the roc_auc siblings' single-row shape
    # on empty input, and the np>0 gate skips the 0/0 NaN a
    # zero-positive slice would otherwise feed ANSI floor/cast
    # (np=0 thresholds contribute exactly 0 to AP anyway).
    agg = staged.agg(
        F.max("_p").alias("_p"),
        F.max("_n").alias("_n"),
        F.sum(
            F.when(
                F.col("_np") > 0,
                F.floor(term * F.lit(1000000000000.0)).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("_ap_micro"),
    )
    return agg.select(
        F.coalesce(F.col("_p"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_neg"),
        F.round(
            F.coalesce(F.col("_ap_micro"), F.lit(0)).cast("double")
            / F.lit(1000000000000.0),
            6,
        ).alias("ap"),
    )


def isotonic_calibration(
    df: DataFrame,
    group_col: str,
    value_col: str,
    pos: str,
    neg: str,
    max_values: int = 8192,
    scale: int = 100,
) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of the score →
    P(pos) mapping — the non-parametric calibrator beside the binned
    reliability diagram (``calibration_bins``), fit here via the
    MINIMAX characterization of isotonic regression:

        iso(v_i) = max_{j≤i} min_{k≥j} mean(y over scores v_j..v_k)

    which is a closed-form, ORDER-FREE formula over the distinct-score
    grain — no sequential pool-adjacent-violators state, so both the
    engine and the (fully independent) SQL oracle compute it from
    joins and windows alone. The classic PAV sweep is O(n) against
    this formulation's O(n²) pairs, but n is the DISTINCT quantized
    score count (cents — bounded by the score range, not the corpus),
    the pair join streams straight into a per-j min aggregate
    (nothing materializes), and the closed form is what keeps the
    oracle from replaying engine code — the repo's independence rule
    for verification. ``max_values`` (default 8192 ⇒ ≤67M pairs)
    enforces the boundedness; ``scale`` sets the fixed-point
    quantization (100 = cents) — drop it to coarsen the domain when
    the score range grows (the calibrator's resolution, not the
    corpus, is what it bounds).

    Exactness: segment means are single IEEE divisions of exact
    cumulative BIGINTs; min/max over identical doubles are exact
    comparisons (no accumulation), so every fitted probability is
    bit-identical across engines, round(6) only at output.

    Returns one row per distinct score: (score_fp = value·scale, n,
    n_pos, emp_rate, iso_p) — iso_p non-decreasing in score_fp.
    """
    from pyspark.sql import Window

    counts = _binary_value_counts(
        df, group_col, value_col, pos, neg, max_values, scale
    )
    wle = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "_v",
        "_np",
        "_nn",
        F.sum("_np").over(wle).alias("_cp"),
        (F.sum("_np").over(wle) + F.sum("_nn").over(wle)).alias("_ct"),
    )
    j = cum.select(
        F.col("_v").alias("_jv"),
        F.col("_np").alias("_jnp"),
        (F.col("_np") + F.col("_nn")).alias("_jt"),
        F.col("_cp").alias("_jcp"),
        F.col("_ct").alias("_jct"),
    )
    k = cum.select(
        F.col("_v").alias("_kv"),
        F.col("_cp").alias("_kcp"),
        F.col("_ct").alias("_kct"),
    )
    seg_mean = (
        (F.col("_kcp") - F.col("_jcp") + F.col("_jnp")).cast("double")
        / (F.col("_kct") - F.col("_jct") + F.col("_jt")).cast("double")
    )
    mins = (
        j.join(k, F.col("_jv") <= F.col("_kv"))
        .groupBy("_jv")
        .agg(F.min(seg_mean).alias("_mj"))
    )
    wmax = Window.orderBy("_jv").rowsBetween(Window.unboundedPreceding, 0)
    iso = mins.select(
        F.col("_jv").alias("_v"), F.max("_mj").over(wmax).alias("_iso")
    )
    return (
        counts.join(iso, "_v")
        .select(
            F.col("_v").alias("score_fp"),
            (F.col("_np") + F.col("_nn")).cast("long").alias("n"),
            F.col("_np").cast("long").alias("n_pos"),
            F.round(
                F.col("_np").cast("double")
                / (F.col("_np") + F.col("_nn")).cast("double"),
                6,
            ).alias("emp_rate"),
            F.round(F.col("_iso"), 6).alias("iso_p"),
        )
    )


def _bounded_conformal_counts(counts: DataFrame, max_values: int) -> DataFrame:
    """Enforce — not assume — the bounded distinct-score precondition
    behind ``conformal_interval``'s per-group quantile window, the
    same snapshot + short-circuiting limit-probe contract as
    ``_bounded_value_counts`` (the grain differs: (group, score)
    cells across ALL groups, since every group's window walks its own
    score domain)."""
    from ..sources.scratch import snapshot

    snap = snapshot(counts, prefix="conformal_vc_")
    probe = snap.limit(max_values + 1).count()
    if probe > max_values:
        raise ValueError(
            f"conformal_interval: more than max_values={max_values} "
            "distinct (group, score) cells; the per-group quantile "
            "window would sort an unbounded score domain. Quantize "
            "the value column or raise max_values explicitly."
        )
    return snap


def conformal_interval(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    coverage_pct: int = 90,
    max_values: int = 2_000_000,
) -> DataFrame:
    """Split-conformal prediction intervals per group, with their
    empirical coverage on a held-out half — the distribution-free
    uncertainty readout modern eval stacks attach to any point
    predictor. Rows split deterministically (md5 of the row id) into
    a CALIBRATION half (fits the per-group mean predictor and the
    nonconformity quantile) and a TEST half (measures how often the
    interval actually covers); finite-sample theory puts coverage at
    ≥ coverage_pct for exchangeable data.

    Exactness — the whole procedure is INTEGER arithmetic: with
    values as cents v and the calibration sums (n, S), the
    nonconformity score |v − S/n| ranks identically to the integer
    |v·n − S|, so the conformal quantile is the k-th ORDER STATISTIC
    of integers, k = ceil((n+1)·pct/100) computed integrally, found
    as the first distinct score whose cumulative count reaches k
    (the sketches' first-qualifying-bin pattern); the coverage test
    |v·n − S| ≤ q compares integers. No doubles exist until the two
    round(6) output ratios. k > n (tiny calibration sets) yields the
    infinite interval — q NULL, everything covered — on both engines.

    Scale shape: three COLUMN-PRUNED fact scans (the calibration
    stats, the calibration scores, the test evaluation — Spark has
    no subplan reuse below the exchange, and materializing the
    fact-grain split to avoid two extra pruned scans would cost more
    than it saves at 100 TB); per-group (n, S) is a broadcast of one
    row per group; the quantile window is PARTITIONED by group and
    walks distinct scores (bounded by the value domain, not the
    corpus — and ENFORCED by a snapshot + limit-probe guard, the
    ``_bounded_value_counts`` contract); coverage is a plain grouped
    aggregate.

    Returns one row per group: (group, n_cal, n_test, q_halfwidth,
    coverage).
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("conf:"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.round(F.col(value_col).cast("double") * 100, 0)
        .cast("long")
        .alias("_v"),
        (h % 2 == 0).alias("_cal"),
    )
    cal_stats = (
        base.filter(F.col("_cal"))
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_ncal"), F.sum("_v").alias("_s"))
    )
    joined = base.join(F.broadcast(cal_stats), "_g")
    # decimal(38,0) BEFORE the v*n product — the same widening
    # roc_auc/mannwhitney use: raw int64 v*ncal wraps silently near
    # 9.2e18 under non-ANSI Spark (large cents x very large
    # calibration groups) while the oracle's HUGEINT does not, a
    # latent cross-engine divergence. decimal keeps the order
    # statistics exact at any magnitude.
    score = F.abs(
        F.col("_v").cast("decimal(38,0)") * F.col("_ncal") - F.col("_s")
    )
    k = F.floor(
        ((F.col("_ncal") + 1) * F.lit(coverage_pct) + 99) / F.lit(100.0)
    ).cast("long")
    cal_counts = _bounded_conformal_counts(
        joined.filter(F.col("_cal"))
        .groupBy("_g", "_ncal", score.alias("_sc"))
        .agg(F.count(F.lit(1)).alias("_c")),
        max_values,
    )
    wcum = Window.partitionBy("_g").orderBy("_sc").rowsBetween(
        Window.unboundedPreceding, 0
    )
    q = (
        cal_counts.withColumn("_cum", F.sum("_c").over(wcum))
        .groupBy("_g")
        .agg(
            F.min(F.when(F.col("_cum") >= k, F.col("_sc"))).alias("_q")
        )
    )
    test = (
        joined.filter(~F.col("_cal"))
        .join(F.broadcast(q), "_g")
        .groupBy("_g", "_ncal", "_q")
        .agg(
            F.count(F.lit(1)).alias("_ntest"),
            F.sum(
                F.when(F.col("_q").isNull(), 1)
                .when(score <= F.col("_q"), 1)
                .otherwise(0)
            ).alias("_cov"),
        )
    )
    return test.select(
        F.col("_g").alias(group_col),
        F.col("_ncal").cast("long").alias("n_cal"),
        F.col("_ntest").cast("long").alias("n_test"),
        F.round(
            F.col("_q").cast("double")
            / (F.lit(100.0) * F.col("_ncal").cast("double")),
            6,
        ).alias("q_halfwidth"),
        F.round(
            F.col("_cov").cast("double") / F.col("_ntest").cast("double"), 6
        ).alias("coverage"),
    )
