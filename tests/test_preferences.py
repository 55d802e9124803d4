"""Bradley-Terry preference fitting (round 9) — independent layers:
a pure-Python MM replay on a literal fixture (no Spark/SQL arithmetic
reused), ordering sanity, and the zero-win boundary."""

from __future__ import annotations

import pytest

from module8_movies_etl_spark.operators.preferences import (
    bradley_terry_strengths,
)


def _bt_python(prefs: list[tuple[int, int]], n_iters: int) -> dict[int, float]:
    """Independent plain-Python MM replay (Hunter 2004) with the same
    mean-1 renormalization per round."""
    comps: dict[tuple[int, int], int] = {}
    wins: dict[int, int] = {}
    for w, l in prefs:
        comps[(w, l)] = comps.get((w, l), 0) + 1
        comps[(l, w)] = comps.get((l, w), 0) + 1
        wins[w] = wins.get(w, 0) + 1
    items = sorted({i for i, _ in comps})
    p = {i: 1.0 for i in items}
    for _ in range(n_iters):
        praw = {}
        for i in items:
            d = sum(
                n / (p[i] + p[j])
                for (a, j), n in comps.items()
                if a == i
            )
            praw[i] = wins.get(i, 0) / d
        s = sum(praw.values())
        p = {i: praw[i] * len(items) / s for i in items}
    return p


PREFS = [(1, 2), (1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (1, 4)]


def test_matches_pure_python_replay(spark):
    df = spark.createDataFrame(PREFS, "w long, l long")
    got = {
        r["item"]: (r["strength"], r["n_wins"], r["n_comparisons"])
        for r in bradley_terry_strengths(df, "w", "l", n_iters=8).collect()
    }
    want = _bt_python(PREFS, 8)
    assert set(got) == {1, 2, 3, 4}
    for item, (s, nw, nc) in got.items():
        assert s == pytest.approx(want[item], abs=2e-6), item
    # exact count columns
    assert got[1][1:] == (4, 4)   # item 1 wins all 4 of its comparisons
    assert got[4][1:] == (0, 3)   # item 4 loses all 3
    # strengths reflect the dominance order 1 > 2 > 3 > 4
    s = {i: got[i][0] for i in got}
    assert s[1] > s[2] > s[3] > s[4]
    # the all-loser's MLE is 0; eight rounds are already there
    assert s[4] == pytest.approx(0.0, abs=1e-6)


def test_probability_sanity(spark):
    # fitted strengths imply P(1 beats 2) = s1/(s1+s2) > 1/2 exactly
    # when 1 beat 2 more often — check on an asymmetric head-to-head
    prefs = [(1, 2)] * 3 + [(2, 1)] * 1 + [(1, 3), (2, 3), (3, 1)]
    df = spark.createDataFrame(prefs, "w long, l long")
    got = {
        r["item"]: r["strength"]
        for r in bradley_terry_strengths(df, "w", "l", n_iters=8).collect()
    }
    assert got[1] / (got[1] + got[2]) > 0.5
    want = _bt_python(prefs, 8)
    for item, s in got.items():
        assert s == pytest.approx(want[item], abs=2e-6)
