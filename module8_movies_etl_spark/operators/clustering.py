"""Distributed k-means clustering over embedding columns — the
curation-side complement to the ANN index family in ``similarity``.

Where ``similarity.train_ivf_centroids`` fits centroids on a bounded
512-row driver sample (an *index* wants speed, not balance), the
operators here run Lloyd's algorithm over the FULL corpus with the
classic scalable decomposition: centroids are a k×dim driver-side
constant (broadcast into every task), assignment is a pure map-side
argmin (no shuffle), and the update step is one ``(cluster, pos)``
grouped aggregate per round — the exact shape MLlib's KMeans uses,
expressed in DataFrame ops. At 100 TB the per-round cost is one
column-pruned scan + one k·dim-key aggregate; the only driver
traffic is k·dim integers per round.

Cross-engine exactness (the DuckDB oracle replays every round in
SQL): all arithmetic is INTEGER. Components are quantized once to
fixed-point (``round(x·10⁴)`` as BIGINT — both engines round
half-away-from-zero on identical IEEE doubles), distances are exact
integer sums of squares, and the centroid mean is the half-up
integer division ``(2·|S| + n) // (2·n)`` with the sign reattached —
no floating point ever enters a comparison, so the argmin (ties →
lowest centroid index) is bit-identical in Spark, Python and DuckDB.

Reference seed: the reference has no clustering surface; this is the
beyond-ref §2.13 training-data path (cluster-balanced "diversity"
sampling à la DeepSeekMath / DCLM corpus curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmeans_assign", "kmeans_diversity_sample"]

_SCALE = 10_000


def _half_up_div(s: int, n: int) -> int:
    """Round-half-away-from-zero integer division ``s / n`` (n > 0),
    in exact integer arithmetic — mirrored verbatim by the oracle SQL
    (DuckDB ``//`` truncates, so operands are kept non-negative)."""
    if s >= 0:
        return (2 * s + n) // (2 * n)
    return -((2 * -s + n) // (2 * n))


def _quantize(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, _q: array<bigint>) — fixed-point components. float→double
    is exact, ·10⁴ and the half-away round are identical IEEE ops in
    both engines, so the integers agree bit-for-bit with the oracle's
    ``CAST(round(x·10000) AS BIGINT)``."""
    return df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * _SCALE, 0).cast("long"),
        ).alias("_q"),
    )


def _dist_cols(centroids: list[list[int]]):
    """Exact squared-L2 distance to each centroid literal as a pure
    map-side fold (zip_with + aggregate, BIGINT throughout), plus the
    first-match argmin — ties resolve to the LOWEST centroid index via
    ``array_position`` on the distance array."""
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("_q"),
                    F.array(*[F.lit(int(c)) for c in cen]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            for cen in centroids
        ]
    )
    d = F.array_min(dists)
    cluster = (F.array_position(dists, d) - 1).cast("int")
    return d, cluster


def kmeans_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_rounds: int = 2,
) -> DataFrame:
    """Lloyd's k-means over the full corpus, fixed ``n_rounds``
    assignment rounds (init → [assign → update]×(n_rounds−1) →
    assign), returning ``(id, cluster, dist_q)`` — ``dist_q`` the
    exact integer squared distance in quantized units.

    Deterministic init: the k vectors with the smallest
    ``md5(CAST(id AS STRING))`` (rank order = centroid index) — no
    RNG, reproducible across engines. Empty clusters keep their
    previous centroid (same rule as ``similarity.lloyd_spherical``).

    Scale shape: per round, ONE column-pruned scan + map-side
    assignment (centroids are a k·dim literal — broadcast-free
    constant folding) + one ``(cluster, pos)`` aggregate whose result
    (k·dim rows of exact integer sums) is the only driver collect —
    bounded at k·dim·16 bytes, the textbook distributed-k-means
    driver payload, NOT a data-dependent fetch.
    """
    if k < 1 or n_rounds < 1:
        raise ValueError("kmeans_assign: k and n_rounds must be >= 1")
    q = _quantize(emb, id_col, vec_col)

    seeds = (
        q.select(
            F.md5(F.col(id_col).cast("string")).alias("_m"), F.col(id_col), "_q"
        )
        .orderBy("_m", id_col)
        .limit(k)
    )
    # bounded driver fetch #1: the k seed vectors (k·dim ints) via
    # TakeOrderedAndProject — a distributed top-k, NOT a global sort
    # (a row_number window here would single-partition the corpus).
    centroids: list[list[int]] = [
        list(r["_q"])
        for r in sorted(seeds.collect(), key=lambda r: (r["_m"], r[id_col]))
    ]
    if not centroids:
        raise ValueError("kmeans_assign: empty corpus — nothing to cluster")
    # fewer rows than k: every row is its own seed — shrink k so the
    # update step never indexes a centroid that was never seeded
    k = len(centroids)
    dim = len(centroids[0])

    for _ in range(n_rounds - 1):
        d, cluster = _dist_cols(centroids)
        assigned = q.select(cluster.alias("_c"), "_q")
        stats = (
            assigned.select("_c", F.posexplode("_q").alias("_p", "_x"))
            .groupBy("_c", "_p")
            .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
        )
        # bounded driver fetch #2 (per round): k·dim exact integer
        # sums — the distributed-k-means update payload.
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats.collect():
            by_cluster.setdefault(r["_c"], {})[r["_p"]] = (int(r["_s"]), int(r["_n"]))
        centroids = [
            [
                _half_up_div(*by_cluster[c][p]) if c in by_cluster else centroids[c][p]
                for p in range(dim)
            ]
            for c in range(k)
        ]

    d, cluster = _dist_cols(centroids)
    return q.select(
        F.col(id_col),
        cluster.alias("cluster"),
        d.alias("dist_q"),
    )


def kmeans_diversity_sample(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_rounds: int = 2,
    per_cluster: int = 16,
) -> DataFrame:
    """Cluster-balanced "diversity" sample: k-means the corpus, then
    keep the ``per_cluster`` smallest-md5 members of every cluster —
    the curation move that caps any one mode of the embedding space
    (boilerplate, template spam) at a fixed quota regardless of how
    much of the corpus it occupies. Emits EVERY row with its cluster,
    exact quantized distance, cluster size, deterministic within-
    cluster rank and the keep flag, so both the clustering and the
    sampling decision are hash-verifiable.
    """
    a = kmeans_assign(emb, id_col, vec_col, k=k, n_rounds=n_rounds)
    cw = Window.partitionBy("cluster")
    rw = Window.partitionBy("cluster").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return a.select(
        id_col,
        "cluster",
        "dist_q",
        F.count(F.lit(1)).over(cw).alias("n_cluster"),
        F.row_number().over(rw).alias("samp_rank"),
        (F.row_number().over(rw) <= per_cluster).alias("is_sampled"),
    )
