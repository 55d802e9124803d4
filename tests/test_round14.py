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
