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
