"""Versioned-table semantics (pipetree_spark/versioned.py): linear
history, time travel, O(1) rollback, commit-conflict detection, vacuum
retention. Parametrized over a bare local root AND a ``file:``-scheme
root so the Hadoop-FileSystem manifest I/O path (the same code an
``s3a://`` root would take) is exercised end-to-end."""

from __future__ import annotations

import os

import pytest

import pipetree_spark.versioned as V
from pipetree_spark.versioned import CommitConflict, VersionedTable


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


@pytest.fixture(params=["bare", "file-scheme"])
def root(request, tmp_path):
    return str(tmp_path) if request.param == "bare" else f"file://{tmp_path}"


def test_versioned_append_overwrite_timetravel_rollback(spark, root):
    t = VersionedTable(root, "docs")
    a = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    b = spark.createDataFrame([(3, "c")], "k long, v string")
    c = spark.createDataFrame([(9, "z")], "k long, v string")

    assert t.write(a, mode="overwrite") == 0
    assert t.write(b, mode="append") == 1
    assert t.write(c, mode="overwrite") == 2

    # latest = the overwrite; time travel sees every prior state
    assert _rows(t.read(spark)) == [(9, "z")]
    assert _rows(t.read(spark, 0)) == [(1, "a"), (2, "b")]
    assert _rows(t.read(spark, 1)) == [(1, "a"), (2, "b"), (3, "c")]

    # rollback commits a NEW version with v1's content — history intact
    assert t.rollback(1) == 3
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]
    assert _rows(t.read(spark, 2)) == [(9, "z")]
    acts = [m["action"] for m in t.history()]
    assert acts == ["overwrite", "append", "overwrite", "rollback:1"]

    # append after rollback builds on the rolled-back state
    t.write(c, mode="append")
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b"), (3, "c"), (9, "z")]


def test_versioned_commit_conflict_and_vacuum(spark, root, tmp_path):
    t = VersionedTable(root, "docs")
    a = spark.createDataFrame([(1, "a")], "k long, v string")
    t.write(a, mode="overwrite")
    t.write(a, mode="overwrite")  # v1 orphans v0's snapshot

    # vacuum(1) deletes only the snapshot no retained version references
    snaps_before = {e for e in os.listdir(tmp_path / "docs") if e.startswith("snap-")}
    assert len(snaps_before) == 2
    deleted = t.vacuum(retain_last=1)
    assert len(deleted) == 1
    assert _rows(t.read(spark)) == [(1, "a")]  # latest untouched
    with pytest.raises(Exception):
        t.read(spark, 0).collect()  # vacuumed version is gone

    # a racing writer that lost the promotion race must get
    # CommitConflict: simulate the stale view by pinning latest_version
    # one commit back, so _commit targets the already-taken slot
    from unittest import mock

    with mock.patch.object(
        VersionedTable, "latest_version", return_value=t.latest_version() - 1
    ):
        with pytest.raises(CommitConflict):
            t.write(a, mode="overwrite")


def test_commit_is_create_exclusive_not_clobber(spark, tmp_path):
    """The lost-commit race the ADVICE flagged: two writers that BOTH
    passed any exists-style check must still serialize — the loser gets
    CommitConflict and the winner's manifest survives byte-identical
    (os.rename would silently replace it)."""
    t = VersionedTable(str(tmp_path), "docs")
    t._commit(["snap-winner"], "overwrite")  # v0 = the winner, already durable
    from unittest import mock

    # loser computed latest=None before the winner landed → targets v0 too
    with mock.patch.object(VersionedTable, "latest_version", return_value=None):
        with pytest.raises(CommitConflict):
            t._commit(["snap-loser"], "overwrite")
    assert t._manifest(0)["dirs"] == ["snap-winner"]
    # no tmp litter left behind by the losing writer
    assert [f for f in os.listdir(t.log_dir.replace("file://", "")) if ".tmp-" in f] == []


def test_commit_hadoop_rename_branch(spark, tmp_path, monkeypatch):
    """Route the commit through the non-local (Hadoop rename) branch by
    disabling the local-path fast path — the code an hdfs:// root runs,
    exercised against the local FileSystem implementation."""
    monkeypatch.setattr(V, "_local_path", lambda fs, jpath: None)
    t = VersionedTable(f"file://{tmp_path}", "docs")
    assert t._commit(["snap-a"], "overwrite") == 0
    assert t._manifest(0)["dirs"] == ["snap-a"]
    from unittest import mock

    with mock.patch.object(VersionedTable, "latest_version", return_value=None):
        with pytest.raises(CommitConflict):
            t._commit(["snap-b"], "overwrite")
    assert t._manifest(0)["dirs"] == ["snap-a"]
    assert [f for f in os.listdir(tmp_path / "docs" / "_versions") if ".tmp-" in f] == []


def test_streaming_dedup_ingest_into_versioned_table(spark, tmp_path):
    """END-TO-END production ingest: foreachBatch incremental dedup
    feeding a VersionedTable — each micro-batch's admitted rows commit
    as one version, so the corpus is time-travelable batch-by-batch and
    a bad ingest day rolls back in O(1) without touching the data."""
    from pipetree_spark.ops.streaming import incremental_dedup_batch

    schema = "doc_id long, text string, lang string"
    batches = [
        spark.createDataFrame(
            [(1, "alpha beta gamma", "en"), (2, "delta epsilon", "en")], schema
        ),
        spark.createDataFrame(
            [(3, "alpha beta gamma", "en"), (4, "zeta eta theta", "en")], schema
        ),
        spark.createDataFrame([(5, "iota kappa", "en")], schema),
    ]
    ledger = str(tmp_path / "ledger")
    t = VersionedTable(str(tmp_path), "corpus")
    for i, b in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        admitted = incremental_dedup_batch(b, i, ledger, stage)
        if admitted:
            t.write(spark.read.parquet(f"{stage}/batch_id={i}"), mode="append")

    # batch 2's doc 3 is an exact dup of doc 1 → never admitted
    assert sorted(r.doc_id for r in t.read(spark).collect()) == [1, 2, 4, 5]
    # time travel: the corpus as of each ingest batch
    assert sorted(r.doc_id for r in t.read(spark, 0).collect()) == [1, 2]
    assert sorted(r.doc_id for r in t.read(spark, 1).collect()) == [1, 2, 4]
    # O(1) rollback of the last ingest
    t.rollback(1)
    assert sorted(r.doc_id for r in t.read(spark).collect()) == [1, 2, 4]
