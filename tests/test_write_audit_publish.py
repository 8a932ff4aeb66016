"""Write-audit-publish staging tests (tableformat.stage_append /
publish / abort_staged, r12): a staged commit is readable by id,
invisible to CURRENT readers, spared by gc, blocking for concurrent
writers, and either published (atomic swap, clean manifest) or
aborted (slot freed, files collected)."""

import os

import pytest
from pyspark.sql import functions as F

from pypiper_spark import tableformat as tf


@pytest.fixture()
def wap_table(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 1_000).select(
        F.col("id"), (F.col("id") % 3).alias("grp")
    )
    tf.create(spark, root, df.repartition(2))
    return root


def _batch(spark, lo, hi, grp=9):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(grp).cast("bigint").alias("grp")
    )


def test_staged_is_readable_by_id_invisible_to_current(spark, wap_table):
    sid = tf.stage_append(spark, wap_table, _batch(spark, 5_000, 5_100))
    assert sid == 2
    assert tf.current_id(wap_table) == 1  # pointer untouched
    assert tf.read(spark, wap_table).count() == 1_000  # prod readers
    # the audit read: full committed-shape fidelity at the staged id
    staged = tf.read(spark, wap_table, snapshot_id=sid)
    assert staged.count() == 1_100
    assert staged.filter("grp = 9").count() == 100
    assert tf.staged_snapshots(wap_table) == [sid]
    # history shows only published snapshots
    assert [m["snapshot_id"] for m in tf.snapshots(wap_table)] == [1]


def test_publish_swaps_and_cleans_mark(spark, wap_table):
    sid = tf.stage_append(spark, wap_table, _batch(spark, 5_000, 5_100))
    assert tf.publish(wap_table, sid) == sid
    assert tf.current_id(wap_table) == sid
    m = tf.read_manifest(wap_table, sid)
    assert "staged" not in m  # indistinguishable from a direct commit
    assert m["n_records"] == 1_100
    assert tf.read(spark, wap_table).count() == 1_100
    assert tf.staged_snapshots(wap_table) == []


def test_abort_frees_slot_and_collects_files(spark, wap_table):
    files_before = set(os.listdir(os.path.join(wap_table, "data")))
    sid = tf.stage_append(spark, wap_table, _batch(spark, 5_000, 5_100))
    removed = tf.abort_staged(wap_table, sid)
    assert f"snapshots/snap-{sid:08d}.json" in removed
    assert any(r.startswith("data/") for r in removed)
    assert set(os.listdir(os.path.join(wap_table, "data"))) == files_before
    # the slot is free: the next commit claims the same id
    assert tf.append(spark, wap_table, _batch(spark, 6_000, 6_010)) == sid
    assert tf.read(spark, wap_table).count() == 1_010


def test_staged_holds_the_commit_slot(spark, wap_table):
    tf.stage_append(spark, wap_table, _batch(spark, 5_000, 5_100))
    with pytest.raises(tf.CommitConflict):
        tf.append(spark, wap_table, _batch(spark, 6_000, 6_010))
    with pytest.raises(tf.CommitConflict):
        tf.delete_where(spark, wap_table, "grp = 0")


def test_gc_spares_staged_collects_residue(spark, wap_table):
    sid = tf.stage_append(spark, wap_table, _batch(spark, 5_000, 5_100))
    staged_files = set(tf.read_manifest(wap_table, sid)["files"])
    # plant true crash residue next to the staged work
    orphan = os.path.join(wap_table, "data", "ffffffffffff-99999.parquet")
    open(orphan, "wb").close()
    removed = tf.gc_orphans(wap_table)
    assert removed == ["data/ffffffffffff-99999.parquet"]
    assert staged_files <= set(
        f"data/{f}" for f in os.listdir(os.path.join(wap_table, "data"))
    )
    assert tf.staged_snapshots(wap_table) == [sid]
    # staged work is still publishable after the gc pass
    tf.publish(wap_table, sid)
    assert tf.read(spark, wap_table).count() == 1_100


def test_publish_non_staged_rejected(spark, wap_table):
    with pytest.raises(ValueError):
        tf.publish(wap_table, 1)
    with pytest.raises(ValueError):
        tf.abort_staged(wap_table, 1)


def test_stage_on_dv_table_carries_vector(spark, wap_table):
    tf.delete_where(spark, wap_table, "grp = 0")  # 666 visible
    sid = tf.stage_append(spark, wap_table, _batch(spark, 5_000, 5_100))
    staged = tf.read(spark, wap_table, snapshot_id=sid)
    assert staged.filter("grp = 0").count() == 0  # deletes hold in audit
    assert staged.count() == 666 + 100
    tf.publish(wap_table, sid)
    assert tf.read(spark, wap_table).count() == 666 + 100


def test_wap_workflow_bad_batch_never_lands(spark, wap_table):
    """The WAP loop end to end: a bad batch stages, fails its audit,
    aborts; the good batch stages, passes, publishes. Production
    history never contains the bad rows."""
    bad = _batch(spark, 5_000, 5_100).withColumn(
        "grp", F.when(F.col("id") % 10 == 0, -1).otherwise(F.col("grp"))
    )
    sid = tf.stage_append(spark, wap_table, bad)
    audit_fail = (
        tf.read(spark, wap_table, snapshot_id=sid).filter("grp < 0").count()
    )
    assert audit_fail > 0
    tf.abort_staged(wap_table, sid)

    good = _batch(spark, 5_000, 5_100)
    sid2 = tf.stage_append(spark, wap_table, good)
    assert (
        tf.read(spark, wap_table, snapshot_id=sid2).filter("grp < 0").count()
        == 0
    )
    tf.publish(wap_table, sid2)
    cur = tf.read(spark, wap_table)
    assert cur.count() == 1_100 and cur.filter("grp < 0").count() == 0
    # every retained manifest is clean history
    assert [m["operation"] for m in tf.snapshots(wap_table)] == [
        "create",
        "append",
    ]


def test_expire_spares_staged_files(spark, wap_table):
    """Retention running during an audit window must not collect the
    staged snapshot's files — its parent is CURRENT, which retention
    never expires, so staged work is always publishable afterwards."""
    tf.append(spark, wap_table, _batch(spark, 6_000, 6_010))  # snap 2
    sid = tf.stage_append(spark, wap_table, _batch(spark, 5_000, 5_100))
    staged_files = set(tf.read_manifest(wap_table, sid)["files"])
    removed = tf.expire_snapshots(wap_table, keep_last=1)  # drops snap 1
    assert any(r.startswith("snapshots/") for r in removed)
    for f in staged_files:
        assert os.path.exists(os.path.join(wap_table, f)), f
    tf.publish(wap_table, sid)
    assert tf.read(spark, wap_table).count() == 1_110
