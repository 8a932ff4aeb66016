"""Commit-protocol tests for the manifest table format
(pypiper_spark/tableformat.py): snapshot isolation, time travel,
crash-between-write-and-swap recovery, optimistic-concurrency
conflict, and orphan GC."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pypiper_spark import tableformat as tf


@pytest.fixture()
def small_df(spark):
    return spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_create_read_roundtrip(spark, small_df, tmp_path):
    root = str(tmp_path / "t")
    snap = tf.create(spark, root, small_df)
    assert snap == 1 and tf.current_id(root) == 1
    got = tf.read(spark, root).orderBy("k").collect()
    assert [(r.k, r.v) for r in got] == [(i, 2 * i) for i in range(100)]


def test_append_and_time_travel(spark, small_df, tmp_path):
    root = str(tmp_path / "t")
    tf.create(spark, root, small_df)
    extra = spark.range(100, 150).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    assert tf.append(spark, root, extra) == 2
    assert tf.read(spark, root).count() == 150
    # time travel: snapshot 1 is byte-identical history, not a diff replay
    assert tf.read(spark, root, snapshot_id=1).count() == 100
    hist = tf.snapshots(root)
    assert [m["operation"] for m in hist] == ["create", "append"]
    assert [m["n_records"] for m in hist] == [100, 150]


def test_merge_updates_and_inserts(spark, small_df, tmp_path):
    root = str(tmp_path / "t")
    tf.create(spark, root, small_df)
    changes = spark.createDataFrame(
        [(0, 999), (1, 998), (500, 5)], "k long, v long"
    )
    tf.merge(spark, root, changes, key="k")
    got = {r.k: r.v for r in tf.read(spark, root).collect()}
    assert got[0] == 999 and got[1] == 998        # matched -> update
    assert got[500] == 5                          # unmatched -> insert
    assert got[50] == 100 and len(got) == 101     # untouched pass through
    # parent snapshot unchanged (readers under snapshot isolation)
    old = {r.k: r.v for r in tf.read(spark, root, snapshot_id=1).collect()}
    assert old[0] == 0 and 500 not in old


def test_crash_between_write_and_swap_recovers(spark, small_df, tmp_path):
    """Simulate a writer dying after data+manifest writes but before
    the pointer swap: CURRENT still serves the old snapshot, the
    orphan scanner finds exactly the dead writer's residue, gc clears
    it, and the retried commit lands as the same snapshot id."""
    root = str(tmp_path / "t")
    tf.create(spark, root, small_df)
    extra = spark.range(100, 120).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    # steps 1-2 of the protocol by hand, then "crash" before the swap
    files = tf._write_data_files(extra, root)
    mpath = tf._snap_path(root, 2)
    os.makedirs(os.path.dirname(mpath), exist_ok=True)
    with open(mpath, "w") as fh:
        json.dump(
            {"snapshot_id": 2, "parent_id": 1, "operation": "append",
             "files": tf.read_manifest(root, 1)["files"] + files,
             "n_files": len(files), "n_records": 120},
            fh,
        )
    # reader sees the committed world only
    assert tf.current_id(root) == 1
    assert tf.read(spark, root).count() == 100
    # residue is visible and precisely scoped
    assert set(tf.orphan_files(root)) == set(files)
    assert tf.uncommitted_manifests(root) == [2]
    # the blocked commit id surfaces as a conflict, not corruption
    with pytest.raises(tf.CommitConflict):
        tf.append(spark, root, extra)
    removed = tf.gc_orphans(root)
    # gc clears the crash residue AND the failed retry's data files
    # (a conflicted commit leaves its step-1 writes as orphans too)
    assert set(files) | {"snapshots/snap-00000002.json"} <= set(removed)
    assert tf.orphan_files(root) == [] and tf.uncommitted_manifests(root) == []
    # retry lands
    assert tf.append(spark, root, extra) == 2
    assert tf.read(spark, root).count() == 120


def test_concurrent_commit_conflict(spark, small_df, tmp_path):
    """Two writers race from the same parent: the second commit (same
    snapshot id) must raise CommitConflict, and the winner's data must
    be untouched by the loser's attempt."""
    root = str(tmp_path / "t")
    tf.create(spark, root, small_df)
    a = spark.range(200, 210).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    # writer A wins
    tf.append(spark, root, a)
    # writer B read parent=1 before A committed; its manifest claim fails
    files_b = tf._write_data_files(a, root)
    with pytest.raises(tf.CommitConflict):
        tf._commit(root, 1, files_b, "append", 110)
    assert tf.current_id(root) == 2
    assert tf.read(spark, root).count() == 110
    # B's data files are orphans, reclaimable
    assert set(files_b) <= set(tf.orphan_files(root))


def test_overwrite_keeps_history(spark, small_df, tmp_path):
    root = str(tmp_path / "t")
    tf.create(spark, root, small_df)
    replacement = spark.range(5).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v")
    )
    tf.overwrite(spark, root, replacement)
    assert tf.read(spark, root).count() == 5
    assert tf.read(spark, root, snapshot_id=1).count() == 100


def test_empty_table_read_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        tf.read(spark, str(tmp_path / "nope"))
