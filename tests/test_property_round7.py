"""Property tests (hypothesis) for the round-7 families: gap fill,
chi-square, basket lift, triangle census, and PageRank against
independent pure-Python models over generated inputs.

Each example batch becomes ONE Spark job (createDataFrame over the
whole list); exact-integer outputs compare exactly, double outputs
compare within 1e-9 of the model (the operators round their outputs,
so the model rounds too — the tolerance only absorbs sum-order ulps).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from module8_movies_etl_spark.operators import stats
from module8_movies_etl_spark.operators.graphs import count_triangles, pagerank

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_EDGES = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=40,
).map(
    # canonicalize (a<b) and dedup — the operators' input contract
    lambda es: sorted({(min(a, b), max(a, b)) for a, b in es})
)


@given(edges=_EDGES)
@settings(**SETTINGS)
def test_triangle_census_property(spark, edges):
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    [r] = count_triangles(df).collect()
    eset = set(edges)
    nodes = sorted({v for e in edges for v in e})
    tri = sum(
        1
        for i, a in enumerate(nodes)
        for b in nodes[i + 1:]
        for c in nodes
        if c > b
        and (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    assert r.n_triangles == tri
    assert r.n_edges == len(edges)
    assert r.n_nodes == len(nodes)
    deg = Counter(v for e in edges for v in e)
    dout = Counter()
    for a, b in edges:
        dout[a if (deg[a], a) < (deg[b], b) else b] += 1
    assert r.n_wedges == sum(d * (d - 1) // 2 for d in dout.values())


@given(edges=_EDGES)
@settings(**SETTINGS)
def test_pagerank_property(spark, edges):
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    got = {r.node: r.rank for r in pagerank(df, 0.85, 3).collect()}
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    n = len(adj)
    p = {v: 1 / n for v in adj}
    for _ in range(3):
        p = {
            v: 0.15 / n + 0.85 * sum(p[u] / len(adj[u]) for u in adj[v])
            for v in adj
        }
    assert set(got) == set(adj)
    for v in adj:
        # got is rounded(6): allow the rounding half-width
        assert abs(got[v] - p[v]) < 6e-7, (v, got[v], p[v])
    # ranks form a probability vector (no dangling mass on an
    # undirected graph)
    assert abs(sum(got.values()) - 1.0) < 1e-4


_BASKETS = st.lists(
    st.tuples(st.integers(0, 9), st.sampled_from("abcde")),
    min_size=1,
    max_size=50,
)


@given(rows=_BASKETS)
@settings(**SETTINGS)
def test_basket_lift_property(spark, rows):
    df = spark.createDataFrame(rows, "b long, i string")
    got = {
        (r.item_a, r.item_b): (r.n_both, r.support, r.lift)
        for r in stats.cooccurrence_lift(df, "b", "i").collect()
    }
    baskets: dict[int, set[str]] = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    nb = len(baskets)
    ic = Counter(i for items in baskets.values() for i in items)
    pairs = Counter(
        (a, b)
        for items in baskets.values()
        for a in items
        for b in items
        if a < b
    )
    assert set(got) == set(pairs)
    for (a, b), n_both in pairs.items():
        gn, gs, gl = got[(a, b)]
        assert gn == n_both
        assert gs == round(n_both / nb, 6)
        assert abs(gl - n_both * nb / (ic[a] * ic[b])) < 1e-3


_CAT_ROWS = st.lists(
    st.tuples(st.sampled_from("xy"), st.sampled_from("pqr")),
    min_size=4,
    max_size=60,
)


@given(rows=_CAT_ROWS)
@settings(**SETTINGS)
def test_chi2_property(spark, rows):
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = stats.chi2_independence(df, "a", "b").collect()
    cells = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    chi2 = sum(
        (cells[(a, b)] - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
        for a in ra
        for b in cb
    )
    assert abs(r.chi2 - chi2) < 1e-3
    assert r.dof == (len(ra) - 1) * (len(cb) - 1)
    assert r.n == n
    assert r.chi2 >= 0
