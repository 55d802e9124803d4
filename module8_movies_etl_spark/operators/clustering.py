"""Distributed k-means clustering over embedding columns — the
curation-side complement to the ANN index family in ``similarity``.

Where ``similarity.train_ivf_centroids`` fits centroids on a bounded
512-row driver sample (an *index* wants speed, not balance), the
operators here run Lloyd's algorithm over the FULL corpus with the
classic scalable decomposition: centroids are a k×dim driver-side
constant (shipped into every task), assignment is a pure map-side
argmin (no shuffle) run as one exact-int64 Arrow batch computation
per partition (r12 — the interpreted per-row k×dim fold chain it
replaces dominated every pass), and the update step is one
``(cluster, pos)`` grouped aggregate per round, partially reduced to
≤ k·dim rows per batch inside the same Arrow pass — the exact shape
MLlib's KMeans uses. At 100 TB the per-round cost is one
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


def _assign_table(
    q: DataFrame, id_col: str, centroids: list[list[int]]
) -> DataFrame:
    """(id, cluster, dist_q) — nearest centroid per row, one Arrow
    int64 batch computation per partition (the
    ``similarity.hyperplane_bucket_table`` scale shape; the previous
    per-row k×dim interpreted ``zip_with``+``aggregate`` fold chain
    dominated every pass — measured r12).

    EXACTNESS is preserved bit-for-bit: quantized components and
    centroids are int64, ‖x−c‖² sums of squares stay far inside int64
    (|q| ≤ ~10⁵ ⇒ per-term ≤ 4·10¹⁰, ×dim ≪ 2⁶³), numpy integer
    arithmetic is exact, and ``np.argmin`` returns the FIRST minimum —
    the same ties→lowest-centroid rule as the oracle's
    ``array_position`` replay."""
    import numpy as np
    import pandas as pd

    c = np.array(centroids, dtype=np.int64)  # (k, dim)
    id_type = q.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, cluster int, dist_q long"

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf["_q"].to_numpy()).astype(np.int64)  # (n, dim)
            d2 = ((v[:, None, :] - c[None, :, :]) ** 2).sum(-1)  # (n, k)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster": np.argmin(d2, axis=1).astype("int32"),
                    "dist_q": d2.min(axis=1),
                }
            )

    return q.select(id_col, "_q").mapInPandas(gen, schema)


def _update_stats(q: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(_c, _p, _s, _n) — per-(cluster, position) exact integer
    component sums and counts for the Lloyd update, partially
    aggregated INSIDE the Arrow pass: each batch emits at most k·dim
    rows, so the shuffle carries k·dim·batches rows instead of the
    n·dim posexplode blowup the previous form shipped (guide §2.3
    aggregate-before-shuffle). int64 sums are exact (n·|q| ≪ 2⁶³ at
    any feasible batch size); the final groupBy re-sums exact
    integers, so the centroid update is bit-identical."""
    import numpy as np
    import pandas as pd

    c = np.array(centroids, dtype=np.int64)  # (k, dim)
    k, dim = c.shape

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf["_q"].to_numpy()).astype(np.int64)  # (n, dim)
            d2 = ((v[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            assign = np.argmin(d2, axis=1)  # (n,)
            present = np.unique(assign)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, assign, v)
            counts = np.bincount(assign, minlength=k)
            yield pd.DataFrame(
                {
                    "_c": np.repeat(present, dim).astype("int32"),
                    "_p": np.tile(np.arange(dim, dtype="int32"), len(present)),
                    "_s": sums[present].reshape(-1),
                    "_n": counts[present].repeat(dim),
                }
            )

    return (
        q.select("_q")
        .mapInPandas(gen, "_c int, _p int, _s long, _n long")
        .groupBy("_c", "_p")
        .agg(F.sum("_s").alias("_s"), F.sum("_n").alias("_n"))
    )


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

    Scale shape: per round, ONE column-pruned scan + map-side Arrow
    assignment (centroids are a k·dim constant shipped inside the
    batch function — ``_assign_table``) + one ``(cluster, pos)``
    aggregate, partially reduced inside the Arrow pass to ≤ k·dim
    rows per batch, whose result (k·dim rows of exact integer sums)
    is the only driver collect — bounded at k·dim·16 bytes, the
    textbook distributed-k-means driver payload, NOT a data-dependent
    fetch.
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
        stats = _update_stats(q, centroids)
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

    return _assign_table(q, id_col, centroids)


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
