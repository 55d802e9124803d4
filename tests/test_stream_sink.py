"""Python DataSource STREAMING writer (graftstreamsink) — the
two-phase manifest-commit contract, verified at the protocol level
(the catalog entry ``pyds_stream_sink`` value-verifies the data path
against DuckDB; these tests pin the transactional semantics the
oracle can't see: staged-file invisibility, per-epoch manifests,
checksum integrity, abort cleanup)."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F


def _drain_stream_to(spark, out: str, rows: int = 40, batch: int = 10):
    from module8_movies_etl_spark.sources import pyds

    pyds.register_stream(spark)
    pyds.register_stream_sink(spark)
    os.makedirs(out, exist_ok=True)
    src = (
        spark.readStream.format("grafttick")
        .option("rows", rows)
        .option("batch", batch)
        .load()
    )
    q = (
        src.writeStream.format("graftstreamsink")
        .option("path", out)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="gss_ckpt_")
        )
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stream_sink_epoch_manifests_and_checksums(spark):
    from module8_movies_etl_spark.sources import pyds

    out = tempfile.mkdtemp(prefix="gss_out_")
    _drain_stream_to(spark, out, rows=40, batch=10)

    manifests = sorted(
        f for f in os.listdir(out) if f.startswith("_manifest-")
    )
    assert manifests == [f"_manifest-{b}.json" for b in range(4)]

    # per-epoch row counts and checksums replayed independently:
    # epoch b covers ids [10b, 10b+10); checksum folds every BIGINT
    # field (id and v)
    for b in range(4):
        with open(os.path.join(out, f"_manifest-{b}.json")) as fh:
            m = json.load(fh)
        ids = range(10 * b, 10 * b + 10)
        expect = sum(i + (i * 2654435761) % 1000003 for i in ids)
        assert m["batch_id"] == b
        assert m["n_rows"] == 10
        assert m["checksum"] == expect % (1 << 60)
        for name in m["files"]:
            assert os.path.exists(os.path.join(out, name))

    # committed data round-trips exactly
    files = pyds.committed_files(out)
    got = (
        spark.read.schema("id long, v long")
        .json(files)
        .agg(F.count(F.lit(1)), F.sum("id"))
        .collect()[0]
    )
    assert got[0] == 40 and got[1] == sum(range(40))

    # nothing left staged after a clean drain
    staged = os.listdir(os.path.join(out, "_staging"))
    assert staged == []


def test_stream_sink_uncommitted_files_invisible(spark):
    from module8_movies_etl_spark.sources import pyds

    out = tempfile.mkdtemp(prefix="gss_out_")
    _drain_stream_to(spark, out, rows=20, batch=10)
    before = pyds.committed_files(out)

    # a crashed task's staged leftovers and an orphan data file that
    # no manifest names must both stay invisible to readers
    with open(os.path.join(out, "_staging", "orphan.jsonl"), "w") as fh:
        fh.write('{"id": 999, "v": 999}\n')
    with open(os.path.join(out, "epoch-9-0.jsonl"), "w") as fh:
        fh.write('{"id": 998, "v": 998}\n')

    assert pyds.committed_files(out) == before
    total = (
        spark.read.schema("id long, v long")
        .json(pyds.committed_files(out))
        .count()
    )
    assert total == 20


def test_stream_sink_restart_is_exactly_once(spark):
    """Resume from a checkpoint: run 1 drains offsets [0, 1000), a
    second query over the SAME checkpoint with a longer source drains
    [1000, 2000) — the committed manifests across both runs must
    cover every offset exactly once (epoch ids continue, nothing
    re-emitted, nothing lost). This is the recovery contract the
    streaming reader's readBetweenOffsets and the sink's manifest
    commit exist to provide."""
    from module8_movies_etl_spark.sources import pyds

    pyds.register_stream(spark)
    pyds.register_stream_sink(spark)
    out = tempfile.mkdtemp(prefix="gss_restart_")
    ckpt = tempfile.mkdtemp(prefix="gss_restart_ckpt_")
    os.makedirs(out, exist_ok=True)

    def run(rows: int):
        src = (
            spark.readStream.format("grafttick")
            .option("rows", rows)
            .option("batch", 500)
            .load()
        )
        q = (
            src.writeStream.format("graftstreamsink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(1000)
    first = sorted(f for f in os.listdir(out) if f.startswith("_manifest"))
    assert first == ["_manifest-0.json", "_manifest-1.json"]

    run(2000)  # same checkpoint: resumes at offset 1000, epochs 2..3
    second = sorted(f for f in os.listdir(out) if f.startswith("_manifest"))
    assert second == [f"_manifest-{b}.json" for b in range(4)]

    ids = sorted(
        r[0]
        for r in spark.read.schema("id long, v long")
        .json(pyds.committed_files(out))
        .select("id")
        .collect()
    )
    assert ids == list(range(2000))


def test_stream_sink_failed_epoch_stays_invisible(spark):
    """Failure injection: a task raises mid-epoch (after staging some
    rows). The failed epoch must produce NO manifest and NO visible
    data file — earlier committed epochs stay readable, and the
    poisoned epoch's partial work remains quarantined in _staging
    (orphaned staging is invisible by construction; real sinks sweep
    it with maintenance jobs)."""
    import pytest

    from module8_movies_etl_spark.sources import pyds

    pyds.register_stream(spark)
    pyds.register_stream_sink(spark)
    out = tempfile.mkdtemp(prefix="gss_poison_")
    os.makedirs(out, exist_ok=True)
    src = (
        spark.readStream.format("grafttick")
        .option("rows", 40)
        .option("batch", 10)
        .load()
    )
    q = (
        src.writeStream.format("graftstreamsink")
        .option("path", out)
        .option("poison_id", 25)  # third epoch [20, 30) fails
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="gss_poison_ck_")
        )
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        with pytest.raises(Exception, match="poisoned id"):
            q.processAllAvailable()
    finally:
        q.stop()

    manifests = sorted(
        f for f in os.listdir(out) if f.startswith("_manifest")
    )
    assert manifests == ["_manifest-0.json", "_manifest-1.json"]
    ids = sorted(
        r[0]
        for r in spark.read.schema("id long, v long")
        .json(pyds.committed_files(out))
        .select("id")
        .collect()
    )
    assert ids == list(range(20))
    # no data file of the failed epoch escaped staging
    visible = [
        f for f in os.listdir(out)
        if f.endswith(".jsonl") and f.startswith("epoch-2")
    ]
    assert visible == []


def test_stream_sink_abort_removes_staged():
    from module8_movies_etl_spark.sources.pyds import (
        GraftStreamSinkWriter,
        _EpochStageCommit,
    )

    out = tempfile.mkdtemp(prefix="gss_abort_")
    staging = os.path.join(out, "_staging")
    os.makedirs(staging, exist_ok=True)
    staged = os.path.join(staging, "deadbeef.jsonl")
    with open(staged, "w") as fh:
        fh.write('{"id": 1, "v": 2}\n')

    w = GraftStreamSinkWriter({"path": out})
    w.abort([_EpochStageCommit(staged, 1, 3), None], batchId=7)
    assert not os.path.exists(staged)
    # abort must leave no manifest behind
    assert not any(f.startswith("_manifest-") for f in os.listdir(out))


def test_stream_sink_commit_sweeps_stale_staged_orphans():
    """A failed/retried task's staged file is named in no commit
    message, so only commit-time age sweeping reclaims it (ADVICE r8):
    files older than the stale cutoff vanish at the next commit, while
    fresh staged files (a concurrent in-flight epoch's) survive."""
    from module8_movies_etl_spark.sources.pyds import (
        GraftStreamSinkWriter,
        _EpochStageCommit,
    )

    out = tempfile.mkdtemp(prefix="gss_sweep_")
    staging = os.path.join(out, "_staging")
    os.makedirs(staging, exist_ok=True)
    stale = os.path.join(staging, "dead-task-orphan.jsonl")
    fresh = os.path.join(staging, "in-flight.jsonl")
    for p in (stale, fresh):
        with open(p, "w") as fh:
            fh.write('{"id": 1, "v": 2}\n')
    old = os.path.getmtime(stale) - GraftStreamSinkWriter._STALE_STAGE_SECONDS - 60
    os.utime(stale, (old, old))

    committed = os.path.join(staging, "committed-task.jsonl")
    with open(committed, "w") as fh:
        fh.write('{"id": 2, "v": 5}\n')
    w = GraftStreamSinkWriter({"path": out})
    w.commit([_EpochStageCommit(committed, 1, 7)], batchId=3)

    assert not os.path.exists(stale), "stale orphan must be swept"
    assert os.path.exists(fresh), "fresh staged file must survive"
    assert os.path.exists(os.path.join(out, "epoch-3-0.jsonl"))
    with open(os.path.join(out, "_manifest-3.json")) as fh:
        assert json.load(fh)["files"] == ["epoch-3-0.jsonl"]
