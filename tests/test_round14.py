"""Round-11 additions: the constant-degree ring+chord graph fixture
(VERDICT r10 task #6) and the catalog-wide SinglePartition budget
(task #4 lives in test_plan_sweep.py; the fixture structure is pinned
here against a pure-Python replay)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _ring_pairs_py(n: int, a: int = 48271, b: int = 11) -> set[tuple[int, int]]:
    """Pure-Python replay of graphs.ring_chord_graph's edge set over
    node indices 0..n-1."""
    raw = []
    for i in range(n):
        raw.append((i, (i + 1) % n))
        raw.append((i, (i + 2) % n))
        raw.append((i, (a * i + b) % n))
    return {(min(s, t), max(s, t)) for s, t in raw if s != t}


def test_ring_chord_graph_matches_replay_and_is_constant_degree(spark):
    """The fixture must (a) equal the pure-Python edge replay, (b) use
    key RANK — not key arithmetic — for node ids (scaled custkeys are
    non-contiguous, the make_scaled_sf pitfall), and (c) keep degree
    bounded by 6 (2-regular ring + <=2 chord endpoints)."""
    from module8_movies_etl_spark.operators.graphs import ring_chord_graph

    # deliberately non-contiguous, unsorted keys: rank order is the
    # only correct node index
    keys = [1000, 7, 300, 42, 9999, 512, 64, 2048, 31, 150, 777]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        (r["id_a"], r["id_b"])
        for r in ring_chord_graph(df, "k").collect()
    }
    assert got == _ring_pairs_py(len(keys))
    # constant degree: every node touches >=3 and <=6 edges
    from collections import Counter

    deg = Counter()
    for a_, b_ in got:
        deg[a_] += 1
        deg[b_] += 1
    assert set(deg) == set(range(len(keys)))
    assert all(3 <= d <= 6 for d in deg.values()), dict(deg)


def test_ring_chord_graph_edges_scale_linearly(spark):
    """edges ∝ n — the property the fixture exists for (the dup-graph
    fixture's edges densify quadratically with sf)."""
    from module8_movies_etl_spark.operators.graphs import ring_chord_graph

    counts = {}
    for n in (20, 40):
        df = spark.range(n).select((F.col("id") * 13 + 5).alias("k"))
        counts[n] = ring_chord_graph(df, "k").count()
        assert counts[n] == len(_ring_pairs_py(n))
    # doubling nodes doubles edges within the dedup slack of the
    # chord overlaps (exact counts already pinned above)
    assert 1.5 <= counts[40] / counts[20] <= 2.5


def test_semantic_decontaminate_flags_planted_leak(spark):
    """A corpus vector that IS a benchmark vector (cosine 1.0) must be
    flagged with that benchmark as best match; an orthogonal vector
    must survive — on BOTH the exact broadcast form (the production
    default) and the capped-LSH variant (whose bands trivially catch
    a same-direction pair)."""
    from module8_movies_etl_spark.operators.similarity import (
        semantic_decontaminate,
        semantic_decontaminate_lsh,
    )

    dim = 64

    def unit(axis: int) -> list[float]:
        v = [0.0] * dim
        v[axis] = 1.0
        return v

    bench = spark.createDataFrame(
        [(1, unit(0)), (2, unit(1))], "vec_id long, embedding array<double>"
    )
    leak = [0.0] * dim
    leak[0] = 3.0  # same direction as benchmark 1, different norm
    corpus = spark.createDataFrame(
        [(10, leak), (11, unit(5)), (12, [0.0] * dim)],
        "vec_id long, embedding array<double>",
    )
    for fn in (semantic_decontaminate, semantic_decontaminate_lsh):
        rows = {r["vec_id"]: r for r in
                fn(bench, corpus, threshold=0.5).collect()}
        assert set(rows) == {10}, fn.__name__
        assert rows[10]["benchmark_id"] == 1
        assert abs(rows[10]["cosine_sim"] - 1.0) < 1e-9


def test_adamic_adar_hub_cap_changes_the_question(spark):
    """The hub-cap trade, pinned on a hand-traceable fixture
    (BENCH_AA_CAP.json measured it at sf1.0: sub-hub caps zero the
    top-k): a star hub is the ONLY common neighbor of its leaves, so
    capping below the hub degree removes every wedge — the capped
    result is empty, not merely reweighted. AA hot centers carry the
    signal mass, unlike minhash hot buckets."""
    from module8_movies_etl_spark.operators.graphs import adamic_adar_links

    # star: hub 0 with leaves 1..5 (hub degree 5), plus one ring edge
    # 1-2 so the graph has a non-edge with a LOW-degree common
    # neighbor too (wedge 1-0-2 is suppressed; wedge via nothing else)
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(1, 2)],
        "id_a long, id_b long",
    )
    uncapped = adamic_adar_links(pairs, top_k=100, max_hub_degree=10)
    capped = adamic_adar_links(pairs, top_k=100, max_hub_degree=4)
    n_un = uncapped.count()
    # every leaf pair has the hub as common neighbor: C(5,2) = 10
    # non-edges minus the real edge (1,2) = 9 scored non-edges, plus
    # wedges through leaves 1 and 2 (degree 2) score (0,?) pairs: the
    # (1-0, 1-2) and (2-0, 2-1) wedges rediscover existing edges only.
    assert n_un == 9
    # cap 4 < hub degree 5: the hub's wedges vanish; leaves 1,2 have
    # degree 2 <= 4 but their wedges only connect existing edges —
    # nothing survives
    assert capped.count() == 0
