"""Build-round-10 pins: synchronous LPA's oscillation behavior on
bipartite structures is DEFINED by the fixed round count — these
goldens hand-trace two 2-cycling graphs and pin that n_rounds parity
is part of the contract (the round-9 verdict's task #7: the existing
bridged-triangles golden converges, so nothing exercised the
oscillating case the docstring warns about).
"""

from __future__ import annotations

import pytest

from module8_movies_etl_spark.operators.graphs import label_propagation


def _run(spark, edges, n_rounds):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = label_propagation(pairs, n_rounds=n_rounds).collect()
    return {r.node: (r.community, r.community_size) for r in rows}


def test_lpa_oscillates_on_4cycle_and_round_count_defines_result(spark):
    # C4 is bipartite: {1,3} vs {2,4}. Hand trace (neighbor-majority,
    # ties -> min, synchronous, no self-vote):
    #   round 1: 1->2 (nbrs {2,4}), 2->1, 3->2, 4->1
    #   round 2: 1->1 (nbrs both labeled 1), 2->2, 3->1, 4->2
    #   round 3: == round 1;  round 4: == round 2  (period-2 cycle)
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    even = _run(spark, edges, n_rounds=4)
    assert even == {
        1: (1, 2), 3: (1, 2),   # community 1 = {1, 3}
        2: (2, 2), 4: (2, 2),   # community 2 = {2, 4}
    }
    # odd parity lands on the OTHER phase of the cycle — same
    # partition of the nodes, flipped label names
    odd = _run(spark, edges, n_rounds=3)
    assert odd == {
        1: (2, 2), 3: (2, 2),
        2: (1, 2), 4: (1, 2),
    }
    assert even != odd  # the oscillation is real, not a convergence


def test_lpa_oscillates_on_star(spark):
    # K_{1,3} star, center 0: center and leaves swap labels forever.
    #   round 1: 0 -> 1 (min of leaf labels), leaves -> 0
    #   round 2: 0 -> 0 (all leaves labeled 0), leaves -> 1
    #   rounds 3/4 repeat 1/2
    edges = [(0, 1), (0, 2), (0, 3)]
    even = _run(spark, edges, n_rounds=4)
    assert even == {
        0: (0, 1),              # center alone under label 0
        1: (1, 3), 2: (1, 3), 3: (1, 3),
    }
    odd = _run(spark, edges, n_rounds=3)
    assert odd == {
        0: (1, 1),
        1: (0, 3), 2: (0, 3), 3: (0, 3),
    }


def test_chunk_sliding_windows_boundary_cases(spark):
    from module8_movies_etl_spark.operators.text import (
        chunk_sliding_windows,
    )

    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    df = spark.createDataFrame(
        [
            (1, words(10, "a")),   # short doc: one short chunk
            (2, words(32, "b")),   # exactly one window: one chunk
            (3, words(33, "c")),   # one past the window: two chunks
            (4, words(80, "d")),   # 1 + ceil((80-32)/24) = 3 chunks
        ],
        "doc_id long, text string",
    )
    rows = (
        chunk_sliding_windows(df, "doc_id", "text")
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    got = [(r.doc_id, r.chunk_idx, r.n_tokens, r.first_token, r.last_token)
           for r in rows]
    assert got == [
        (1, 0, 10, "a0", "a9"),
        (2, 0, 32, "b0", "b31"),
        (3, 0, 32, "c0", "c31"),
        (3, 1, 9, "c24", "c32"),   # starts at stride 24, covers the tail
        (4, 0, 32, "d0", "d31"),
        (4, 1, 32, "d24", "d55"),
        (4, 2, 32, "d48", "d79"),
    ]
    # every token is covered: last chunk reaches the final word
    # and consecutive chunks overlap by window - stride = 8
    import hashlib

    # chunk_sha is the md5 of the space-joined window — recompute one
    w = [f"d{i}" for i in range(80)]
    expect = hashlib.md5(" ".join(w[24:56]).encode()).hexdigest()
    assert rows[5].chunk_sha == expect


def test_paragraph_dedup_fractions_hand_golden(spark):
    from module8_movies_etl_spark.operators.dedup import (
        paragraph_dedup_fractions,
    )

    shared = "one two three four five six seven eight"  # one 8-word block
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(8))  # noqa: E731
    df = spark.createDataFrame(
        [
            # doc 1: shared block + a unique block -> 1/2 duplicated
            (1, shared + " " + uniq("x")),
            # doc 2: shared block + 2 unique blocks -> 1/3 duplicated
            (2, shared + " " + uniq("y") + " " + uniq("z")),
            # doc 3: all unique -> 0 duplicated
            (3, uniq("q") + " " + uniq("r")),
            # doc 4: the shared block REPEATED within one doc only is
            # repetition, not cross-doc duplication... but the block
            # also appears in docs 1-2, so both copies count as dup
            (4, shared + " " + shared),
        ],
        "doc_id long, text string",
    )
    rows = paragraph_dedup_fractions(df, "doc_id", "text").collect()
    got = {
        r.doc_id: (r.n_paragraphs, r.n_dup_paragraphs, r.dup_fraction, r.keep)
        for r in rows
    }
    assert got == {
        1: (2, 1, 0.5, True),       # exactly at the 50% boundary: kept
        2: (3, 1, 0.333333, True),
        3: (2, 0, 0.0, True),
        4: (2, 2, 1.0, False),
    }


def test_paragraph_dedup_within_doc_repeat_is_not_duplication(spark):
    from module8_movies_etl_spark.operators.dedup import (
        paragraph_dedup_fractions,
    )

    block = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = spark.createDataFrame(
        # the repeated block exists ONLY inside doc 1 — min(id)=max(id)
        # so it is repetition (curation's job), not duplication
        [(1, block + " " + block), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    rows = paragraph_dedup_fractions(df, "doc_id", "text").collect()
    got = {r.doc_id: (r.n_dup_paragraphs, r.keep) for r in rows}
    assert got == {1: (0, True), 2: (0, True)}


def test_knn_shapley_matches_bruteforce_shapley(spark):
    # The closed-form recurrence (Jia et al. 2019) vs the DEFINITION:
    # brute-force Shapley over all n! permutations of a 5-point
    # training set, utility = (1/K)·(matching labels among the
    # min(K,|S|) nearest). Independence layer: the reference below
    # shares no code with the operator — it literally enumerates
    # permutations.
    import hashlib
    import itertools
    import math

    from module8_movies_etl_spark.operators.similarity import (
        knn_shapley_values,
    )

    K, PANEL = 2, 2
    pts = {
        # id: (x, y, label) — distinct pairwise distances, mixed labels
        1: (0.0, 0.0, 0),
        2: (1.0, 0.0, 1),
        3: (0.0, 2.0, 0),
        4: (3.0, 1.0, 1),
        5: (1.5, 2.5, 0),
        6: (4.0, 4.0, 1),
        7: (0.5, 3.5, 0),
    }
    ids = sorted(pts)
    by_md5 = sorted(
        ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    val, train = by_md5[:PANEL], sorted(set(ids) - set(by_md5[:PANEL]))

    def qv(i):  # the operator's integer quantization
        return (round(pts[i][0] * 1e6), round(pts[i][1] * 1e6))

    def d2(a, b):
        qa, qb = qv(a), qv(b)
        return (qa[0] - qb[0]) ** 2 + (qa[1] - qb[1]) ** 2

    def utility(subset, v):
        if not subset:
            return 0.0
        near = sorted(subset, key=lambda t: (d2(t, v), t))[: min(K, len(subset))]
        return sum(1 for t in near if pts[t][2] == pts[v][2]) / K

    shap = dict.fromkeys(train, 0.0)
    for v in val:
        for perm in itertools.permutations(train):
            acc = []
            for t in perm:
                shap[t] += utility(acc + [t], v) - utility(acc, v)
                acc.append(t)
    nperm = math.factorial(len(train))
    expected = {t: shap[t] / (nperm * len(val)) for t in train}

    df = spark.createDataFrame(
        [(i, [pts[i][0], pts[i][1]], pts[i][2]) for i in ids],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        r.vec_id: r.knn_shapley
        for r in knn_shapley_values(df, k=K, panel=PANEL).collect()
    }
    assert set(got) == set(expected)
    for t in train:
        assert abs(got[t] - expected[t]) < 2e-6, (t, got[t], expected[t])
    # the values must actually discriminate (not all equal), and the
    # total must equal the average full-set utility (Shapley
    # efficiency axiom: sum of values = u(N) - u(empty))
    assert len(set(round(v, 6) for v in expected.values())) > 1
    full = sum(utility(train, v) for v in val) / len(val)
    assert abs(sum(got.values()) - full) < 5e-6


def test_leakage_safe_split_keeps_near_dups_together(spark):
    # the property the cluster-keyed split exists for: two near-dup
    # docs whose PER-DOC hashes land in different splits must land in
    # the SAME split under the cluster rule
    import hashlib

    from module8_movies_etl_spark.operators.dedup import (
        connected_components,
    )
    from module8_movies_etl_spark.operators.sampling import hash_split

    def u01(key):
        return int(
            hashlib.md5(f"split:{key}".encode()).hexdigest()[:15], 16
        ) / float(1 << 60)

    # find a near-dup pair whose per-doc assignments DIFFER
    def label(u):
        return "train" if u < 0.8 else ("val" if u < 0.9 else "test")

    a, b = next(
        (i, j)
        for i in range(100)
        for j in range(i + 1, 100)
        if label(u01(i)) != label(u01(j))
    )
    nodes = spark.createDataFrame(
        [(a,), (b,), (7777,)], "vec_id long"
    )
    pairs = spark.createDataFrame([(a, b)], "id_a long, id_b long")
    cc = connected_components(pairs, nodes, id_col="vec_id")
    s = hash_split(
        cc, "cluster_id", boundaries={"train": 0.8, "val": 0.9},
        default_label="test",
    )
    rows = {r.vec_id: r.split for r in s.collect()}
    # per-doc rule would separate a and b; cluster rule must not
    assert label(u01(a)) != label(u01(b))
    assert rows[a] == rows[b] == label(u01(min(a, b)))
    # and the isolated doc keeps its own (cluster-of-one) assignment
    assert rows[7777] == label(u01(7777))


def test_krippendorff_alpha_matches_coincidence_matrix_replay(spark):
    # independent reference: build Krippendorff's coincidence matrix
    # LITERALLY (every ordered within-item pair weighted 1/(n_u - 1))
    # and compute alpha from it — no shared arithmetic with the
    # operator's bucketed integer form. Includes Krippendorff's own
    # textbook property checks: perfect agreement -> alpha = 1.
    import itertools
    from collections import Counter, defaultdict

    from module8_movies_etl_spark.plans.benchmark_queries import (
        annotator_agreement_alpha,
    )

    ratings = [
        # item: labels (variable raters per item, incl. a 1-rater
        # item that must be EXCLUDED)
        (1, ["a", "a", "b"]),
        (2, ["b", "b", "b", "c"]),
        (3, ["a", "c"]),
        (4, ["c", "c", "c"]),
        (5, ["a"]),          # no pair information
        (6, ["a", "b", "b", "b", "a"]),
    ]

    def reference_alpha(data):
        coin = defaultdict(float)
        for _, labs in data:
            if len(labs) < 2:
                continue
            for i, j in itertools.permutations(range(len(labs)), 2):
                coin[(labs[i], labs[j])] += 1.0 / (len(labs) - 1)
        n_c = Counter()
        for (c, _), v in coin.items():
            n_c[c] += v
        n = sum(n_c.values())
        d_o = sum(v for (c, cp), v in coin.items() if c != cp) / n
        d_e = sum(
            n_c[c] * n_c[cp] for c in n_c for cp in n_c if c != cp
        ) / (n * (n - 1))
        return 1.0 - d_o / d_e, d_o, d_e, n

    exp_alpha, exp_do, exp_de, exp_n = reference_alpha(ratings)

    # feed the SAME ratings through the catalog query's operator path
    # by writing them as a fake orders table
    import tempfile

    rows = [
        (item, lab)
        for item, labs in ratings
        for lab in labs
    ]
    df = spark.createDataFrame(
        [(i, item, "O", 1.0, "2024-01-01 00:00:00", lab)
         for i, (item, lab) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/orders.parquet")
        out = annotator_agreement_alpha(spark, d).collect()[0]
    assert out.n_ratings == exp_n
    assert out.n_items == 5 and out.n_categories == 3
    assert abs(out.alpha - exp_alpha) < 2e-6, (out.alpha, exp_alpha)
    assert abs(out.do_rate - exp_do) < 2e-6
    assert abs(out.de_rate - exp_de) < 2e-6

    # perfect agreement: every item unanimous -> alpha exactly 1
    uni = spark.createDataFrame(
        [(i, i % 4, "O", 1.0, "2024-01-01", ["a", "b"][i % 2 == 0])
         for i in range(40)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        uni.write.parquet(f"{d}/orders.parquet")
        out = annotator_agreement_alpha(spark, d).collect()[0]
    assert out.alpha == 1.0 and out.do_rate == 0.0


def test_dsir_matches_pure_python_replay(spark, sf_dir):
    # independent reference: recompute the Laplace-smoothed unigram
    # log-ratios and every doc score with plain Python math.log over
    # the same sf0.001 corpus, then check the engine's top-100 set,
    # order, and scores
    import math
    from collections import Counter

    from module8_movies_etl_spark.plans.benchmark_queries import (
        dsir_importance_select,
    )
    from module8_movies_etl_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    src, tgt = Counter(), Counter()
    toks = {}
    for r in docs:
        ws = r.text.strip().split()
        toks[r.doc_id] = (r.lang, ws)
        src.update(ws)
        if r.lang == "en":
            tgt.update(ws)
    n_s, n_t, v = sum(src.values()), sum(tgt.values()), len(src)
    lam = {
        w: math.log(((tgt.get(w, 0) + 1) * (n_s + v))
                    / ((src[w] + 1) * (n_t + v)))
        for w in src
    }
    scored = sorted(
        (
            (round(sum(lam[w] for w in ws), 6), did, lang, len(ws))
            for did, (lang, ws) in toks.items()
        ),
        key=lambda t: (-t[0], t[1]),
    )[:100]

    got = dsir_importance_select(spark, sf_dir).collect()
    assert [(r.doc_id, r.lang, r.n_tokens) for r in got] == [
        (d, lang, n) for _, d, lang, n in scored
    ]
    for row, (score, *_rest) in zip(got, scored):
        assert abs(row.dsir_score - score) < 2e-6
    # the selection must actually skew toward the target slice
    en_share_all = sum(1 for r in docs if r.lang == "en") / len(docs)
    en_share_sel = sum(1 for r in got if r.lang == "en") / len(got)
    assert en_share_sel > en_share_all
