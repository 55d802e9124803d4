"""The bench harness's automatic mover triage (VERDICT r8 task #2).

Rounds 7 and 8 each had a >1.8x drift-normalized mover slip through a
MANUAL triage sweep (round 8: curation_pipeline_v2, because the sweep
ran before the final catalog re-run). The rule now lives in bench.py
itself: any non-machinery query whose min-of-N exceeds the prior
committed BENCH_DETAIL figure by >TRIAGE_FACTOR x (normalized by the
shared-query median drift) gets an automatic isolated 3-run appended
to the triage dict. These tests drive the rule with synthetic priors
so it can't silently rot.
"""

from __future__ import annotations

import bench


def _prior(queries: dict[str, float]) -> dict:
    return {"queries": queries, "sf": 0.1}


def _stable_queries(n: int = 12) -> dict[str, float]:
    # enough shared stable queries (>=10) for the median drift model
    return {f"q{i}": 1.0 for i in range(n)}


def _fake_catalog(spark, names):
    # the triage re-run calls queries[name](spark, sf_dir) and writes
    # to the noop sink — a trivial range() satisfies the contract
    return {n: (lambda s, d: s.range(10)) for n in names}


def test_auto_triage_flags_normalized_mover(spark):
    old = _stable_queries()
    old["mover"] = 2.0
    new = {k: 1.0 for k in _stable_queries()}
    new["mover"] = 5.0  # 2.5x vs prior, drift median = 1.0
    out = bench._auto_triage(
        _prior(old), new, _fake_catalog(spark, new), spark, "unused"
    )
    assert set(out) == {"mover"}
    note = out["mover"]
    assert note.startswith("AUTO-TRIAGE"), note
    assert "isolated 3-run" in note
    # the trivial re-run is fast, so the note must self-classify the
    # bump as a session placement effect, not a plan change
    assert "placement effect" in note


def test_auto_triage_normalizes_out_host_drift(spark):
    # EVERY query 2x slower = host drift; nothing should be flagged
    old = _stable_queries()
    old["mover"] = 2.0
    new = {k: 2.0 for k in old}
    new["mover"] = 4.0
    out = bench._auto_triage(
        _prior(old), new, _fake_catalog(spark, new), spark, "unused"
    )
    assert out == {}


def test_auto_triage_skips_machinery_small_deltas_and_no_prior(spark):
    old = _stable_queries()
    # machinery entry: 3x but flagged as harness-cost — never triaged
    machinery_name = sorted(bench.MACHINERY)[0]
    old[machinery_name] = 2.0
    # sub-threshold absolute delta: 0.2 -> 0.5 s is noise, not a mover
    old["tiny"] = 0.2
    new = {k: 1.0 for k in _stable_queries()}
    new[machinery_name] = 6.0
    new["tiny"] = 0.5
    out = bench._auto_triage(
        _prior(old), new, _fake_catalog(spark, new), spark, "unused"
    )
    assert out == {}
    assert bench._auto_triage(None, new, {}, spark, "unused") == {}
    assert bench._auto_triage({}, new, {}, spark, "unused") == {}


def test_auto_triage_needs_enough_shared_queries(spark):
    # fewer than 10 shared queries = no drift model = no flags
    old = {f"q{i}": 1.0 for i in range(5)}
    old["mover"] = 1.0
    new = dict(old)
    new["mover"] = 9.0
    out = bench._auto_triage(
        _prior(old), new, _fake_catalog(spark, new), spark, "unused"
    )
    assert out == {}


def test_prior_detail_comes_from_last_commit_not_working_tree(tmp_path):
    # Round 9's two escaped movers slipped through because the final
    # auto-triage compared against a same-session baseline. The rule:
    # the baseline is git-committed BENCH_DETAIL.json; a bench run
    # that overwrote the working-tree file earlier in the session
    # must NOT become its own baseline.
    import json
    import subprocess

    repo = tmp_path / "r"
    repo.mkdir()
    detail = repo / "BENCH_DETAIL.json"
    committed = {"queries": {"q": 1.0}, "sf": 0.1, "which": "committed"}
    detail.write_text(json.dumps(committed))
    env = {
        "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
        "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
        "HOME": str(tmp_path),
    }
    for cmd in (
        ["git", "init", "-q"],
        ["git", "add", "BENCH_DETAIL.json"],
        ["git", "commit", "-q", "-m", "x"],
    ):
        subprocess.run(cmd, cwd=repo, check=True, env=env)
    # a same-session run overwrites the working tree...
    detail.write_text(
        json.dumps({"queries": {"q": 9.0}, "sf": 0.1, "which": "session"})
    )
    # ...but the baseline must still be the committed figures
    assert bench._load_prior_detail(str(detail)) == committed


def test_prior_detail_falls_back_to_file_outside_git(tmp_path):
    import json

    detail = tmp_path / "BENCH_DETAIL.json"
    doc = {"queries": {"q": 2.0}, "sf": 0.1}
    detail.write_text(json.dumps(doc))
    assert bench._load_prior_detail(str(detail)) == doc
    assert bench._load_prior_detail(str(tmp_path / "missing.json")) is None
