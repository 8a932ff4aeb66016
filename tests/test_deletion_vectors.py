"""Deletion-vector tests (tableformat.delete_where, r12): row-level
DELETE with zero data-file rewrites. The coordinate system is the
parquet reader's own (_metadata.file_path, _metadata.row_index), so
the invariants under test are the ones a 100 TB deployment leans on:
no file rewritten by a delete, positions split-invariant, the vector
carried by every commit that keeps the physical rows (append,
evolution, rollback) and materialized by every commit that rewrites
them (overwrite/merge/compact), GC and retention collecting vectors
exactly like data files, and the whole path driver-bounded."""

import os

import pytest
from pyspark.sql import functions as F

from pypiper_spark import tableformat as tf


@pytest.fixture()
def dv_table(spark, tmp_path):
    """4-file table of 10k rows: (id, grp=id%5, val=id*3)."""
    root = str(tmp_path / "t")
    df = spark.range(0, 10_000).select(
        F.col("id"),
        (F.col("id") % 5).alias("grp"),
        (F.col("id") * 3).alias("val"),
    )
    tf.create(spark, root, df.repartition(4), stats_cols=("id",))
    return root


def test_delete_rewrites_no_files_and_counts_exactly(spark, dv_table):
    files1 = tf.read_manifest(dv_table, 1)["files"]
    data_before = sorted(os.listdir(os.path.join(dv_table, "data")))
    s2 = tf.delete_where(spark, dv_table, "grp = 0")
    m2 = tf.read_manifest(dv_table, s2)
    # THE deletion-vector property: same file list, nothing rewritten
    assert m2["files"] == files1
    assert sorted(os.listdir(os.path.join(dv_table, "data"))) == data_before
    assert m2["operation"] == "delete" and m2["dv_rows"] == 2_000
    assert m2["n_records"] == 8_000
    assert tf.read(spark, dv_table).count() == 8_000
    # time travel: the pre-delete snapshot still reads every row
    assert tf.read(spark, dv_table, snapshot_id=1).count() == 10_000


def test_second_delete_is_cumulative_and_exact(spark, dv_table):
    tf.delete_where(spark, dv_table, "grp = 0")
    s3 = tf.delete_where(spark, dv_table, F.col("val") > 24_000)
    truth = {i for i in range(10_000) if i % 5 != 0 and i * 3 <= 24_000}
    m3 = tf.read_manifest(dv_table, s3)
    assert m3["n_records"] == len(truth)
    assert m3["dv_rows"] == 10_000 - len(truth)
    got = {r.id for r in tf.read(spark, dv_table).select("id").collect()}
    assert got == truth


def test_delete_matching_nothing_commits_cleanly(spark, dv_table):
    s = tf.delete_where(spark, dv_table, "id < 0")
    m = tf.read_manifest(dv_table, s)
    assert m["dv_rows"] == 0 and m["n_records"] == 10_000
    assert tf.read(spark, dv_table).count() == 10_000


def test_positions_are_split_invariant(spark, dv_table):
    """The vector written under one scan split must drop the same
    rows under any other split geometry — _metadata.row_index is the
    in-file position, not a partition-relative counter."""
    tf.delete_where(spark, dv_table, "id % 7 = 0")
    truth = {i for i in range(10_000) if i % 7 != 0}
    old = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64k")
        got = {r.id for r in tf.read(spark, dv_table).select("id").collect()}
    finally:
        if old is None:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
        else:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert got == truth


def test_append_carries_vector_incremental_stays_exact(spark, dv_table):
    tf.delete_where(spark, dv_table, "grp = 0")
    extra = spark.range(20_000, 20_100).select(
        F.col("id"),
        F.lit(1).cast("bigint").alias("grp"),
        (F.col("id") * 3).alias("val"),
    )
    s3 = tf.append(spark, dv_table, extra)
    m3 = tf.read_manifest(dv_table, s3)
    assert m3["dv"] == tf.read_manifest(dv_table, 2)["dv"]
    assert m3["n_records"] == 8_100
    assert tf.read(spark, dv_table).count() == 8_100
    # increment since create = exactly the appended rows (delete
    # commits add no files — file-grain contract)
    assert tf.read_incremental(spark, dv_table, since=1).count() == 100


def test_delete_after_append_reaches_new_files(spark, dv_table):
    extra = spark.range(20_000, 20_100).select(
        F.col("id"),
        F.lit(0).cast("bigint").alias("grp"),
        (F.col("id") * 3).alias("val"),
    )
    tf.append(spark, dv_table, extra)
    tf.delete_where(spark, dv_table, "grp = 0")
    assert tf.read(spark, dv_table).count() == 8_000  # appended grp=0 gone too
    # and the increment read is dv-aware: the appended rows are deleted
    assert tf.read_incremental(spark, dv_table, since=1).count() == 0


def test_compact_materializes_deletes_and_drops_vector(spark, dv_table):
    tf.delete_where(spark, dv_table, "grp = 0")
    s = tf.compact(spark, dv_table, target_files=2)
    m = tf.read_manifest(dv_table, s)
    assert "dv" not in m and m["n_records"] == 8_000
    assert len(m["files"]) == 2
    assert tf.read(spark, dv_table).count() == 8_000


def test_overwrite_and_merge_materialize_deletes(spark, dv_table):
    tf.delete_where(spark, dv_table, "grp = 0")
    ch = spark.range(0, 10).select(
        (F.col("id") * 5 + 1).alias("id"),
        F.lit(9).cast("bigint").alias("grp"),
        F.lit(0).cast("bigint").alias("val"),
    )
    s = tf.merge(spark, dv_table, ch, key="id")
    m = tf.read_manifest(dv_table, s)
    assert "dv" not in m
    out = tf.read(spark, dv_table)
    assert out.filter("grp = 0").count() == 0  # deletes stayed deleted
    assert out.filter("grp = 9").count() == 10


def test_merge_partial_falls_back_to_full_merge_on_dv_table(spark, dv_table):
    tf.delete_where(spark, dv_table, "grp = 0")
    ch = spark.range(0, 10).select(
        (F.col("id") * 5 + 2).alias("id"),
        F.lit(9).cast("bigint").alias("grp"),
        F.lit(0).cast("bigint").alias("val"),
    )
    s = tf.merge_partial(spark, dv_table, ch, key="id")
    m = tf.read_manifest(dv_table, s)
    assert m["operation"] == "merge" and "dv" not in m
    out = tf.read(spark, dv_table)
    assert out.filter("grp = 0").count() == 0
    assert out.filter("grp = 9").count() == 10


def test_schema_evolution_carries_vector(spark, dv_table):
    """A rename/add/drop is a metadata-only commit over the SAME
    physical rows — dropping the vector there would resurrect every
    deleted row (the bug the first cut of r12 had)."""
    tf.delete_where(spark, dv_table, "id % 7 = 0")
    tf.rename_column(dv_table, "val", "tripled")
    s = tf.delete_where(spark, dv_table, "tripled >= 29900")
    truth = [i for i in range(10_000) if i % 7 != 0 and i * 3 < 29_900]
    assert tf.read_manifest(dv_table, s)["n_records"] == len(truth)
    tf.drop_column(dv_table, "grp")
    tf.add_column(dv_table, "note", "string")
    out = tf.read(spark, dv_table)
    assert out.columns == ["id", "tripled", "note"]
    assert out.count() == len(truth)


def test_rollback_restores_vector(spark, dv_table):
    tf.delete_where(spark, dv_table, "grp = 0")  # snap 2
    tf.compact(spark, dv_table, target_files=1)  # snap 3: dv gone
    s4 = tf.rollback(dv_table, to_snapshot=2)
    m4 = tf.read_manifest(dv_table, s4)
    assert m4["dv"] == tf.read_manifest(dv_table, 2)["dv"]
    assert tf.read(spark, dv_table).count() == 8_000


def test_expire_collects_unreferenced_vectors_only(spark, dv_table):
    tf.delete_where(spark, dv_table, "grp = 0")  # snap 2, dv A
    tf.delete_where(spark, dv_table, "grp = 1")  # snap 3, dv B (cumulative)
    dv_a = tf.read_manifest(dv_table, 2)["dv"]
    dv_b = tf.read_manifest(dv_table, 3)["dv"]
    removed = tf.expire_snapshots(dv_table, keep_last=1)
    assert dv_a in removed
    assert not os.path.exists(os.path.join(dv_table, dv_a))
    assert os.path.isdir(os.path.join(dv_table, dv_b))
    assert tf.read(spark, dv_table).count() == 6_000


def test_gc_collects_crash_residue_vector(spark, dv_table):
    tf.delete_where(spark, dv_table, "grp = 0")
    residue = os.path.join(dv_table, "dv", "deadbeef0000")
    os.makedirs(os.path.join(residue, "x"))
    assert "dv/deadbeef0000" in tf.orphan_files(dv_table)
    removed = tf.gc_orphans(dv_table)
    assert "dv/deadbeef0000" in removed and not os.path.exists(residue)
    # the live vector was untouched
    assert tf.read(spark, dv_table).count() == 8_000


def test_delete_conflicts_like_any_commit(spark, dv_table):
    """Optimistic concurrency holds for deletes: a delete prepared
    against a parent that moved raises CommitConflict and leaves the
    winner's state intact (the loser's dv dir is residue for gc)."""
    parent = tf.current_id(dv_table)
    # simulate the race: another writer claims snapshot parent+1 first
    tf.delete_where(spark, dv_table, "grp = 1")
    # now a delete that believes CURRENT is still `parent`
    m = tf.read_manifest(dv_table, parent)
    with pytest.raises(tf.CommitConflict):
        tf._commit(
            dv_table,
            parent,
            list(m["files"]),
            "delete",
            0,
            extra={"dv": "dv/loser", "dv_rows": 0},
        )
    assert tf.read(spark, dv_table).count() == 8_000


def test_delete_where_is_driver_bounded(spark, dv_table, monkeypatch):
    """The artifact-builder rule (VERDICT r10 #1 / r11 #1) applied to
    the newest builder: delete_where must never pull row-level data
    through the driver — the vector is executor-written, the commit's
    only driver scalars are footer counts. toPandas is banned
    outright; any collect during the delete must return 0 rows (there
    are none by design)."""
    from pyspark.sql import DataFrame

    sizes = []
    orig_collect = DataFrame.collect

    def counting_collect(self):
        rows = orig_collect(self)
        sizes.append(len(rows))
        return rows

    def banned_topandas(self):
        raise AssertionError("delete_where pulled a frame via toPandas")

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    monkeypatch.setattr(DataFrame, "toPandas", banned_topandas)
    s = tf.delete_where(spark, dv_table, "grp = 0")
    assert sizes == [], sizes
    assert tf.read_manifest(dv_table, s)["n_records"] == 8_000


def test_dv_read_plan_prunes_and_broadcasts(spark, dv_table):
    """Scale shape of the dv-aware read: column pruning reaches the
    parquet scan through the anti-join (a 2-column projection must
    not read the table's other columns), and the vector — the small
    side by design — is the broadcast build side, never a shuffled
    exchange of the data at this size."""
    tf.delete_where(spark, dv_table, "grp = 0")
    df = tf.read(spark, dv_table).select("id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the data-side scan is the one carrying the reader's row-index
    # metadata column (Location strings are width-truncated by Spark,
    # so path matching is unreliable)
    data_reads = [
        ln
        for ln in plan.splitlines()
        if "ReadSchema" in ln and "row_index" in ln
    ]
    assert data_reads, plan
    for ln in data_reads:
        schema = ln.split("ReadSchema:")[1]
        assert "val" not in schema and "grp" not in schema, ln  # pruned
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert df.count() == 8_000


def test_merge_on_read_replaces_without_rewrites(spark, dv_table):
    files1 = tf.read_manifest(dv_table, 1)["files"]
    ch = spark.range(0, 100).select(
        (F.col("id") * 10).alias("id"),          # keys 0,10,...,990
        F.lit(9).cast("bigint").alias("grp"),
        F.lit(-5).cast("bigint").alias("val"),
    )
    s = tf.merge_on_read(spark, dv_table, ch, key="id")
    m = tf.read_manifest(dv_table, s)
    # every parent file carried unrewritten; deltas appended
    assert set(files1) <= set(m["files"]) and len(m["files"]) > len(files1)
    assert m["operation"] == "merge_on_read"
    assert m["dv_rows"] == 100 and m["n_records"] == 10_000
    out = tf.read(spark, dv_table)
    assert out.count() == 10_000
    assert out.filter("grp = 9").count() == 100
    assert out.filter("id = 10").select("val").first().val == -5
    # unmatched rows untouched; time travel sees the original
    assert out.filter("id = 11").select("val").first().val == 33
    assert tf.read(spark, dv_table, snapshot_id=1).filter(
        "grp = 9"
    ).count() == 0


def test_merge_on_read_inserts_new_keys(spark, dv_table):
    ch = spark.range(20_000, 20_050).select(
        F.col("id"),
        F.lit(7).cast("bigint").alias("grp"),
        F.lit(1).cast("bigint").alias("val"),
    )
    s = tf.merge_on_read(spark, dv_table, ch, key="id")
    m = tf.read_manifest(dv_table, s)
    assert m["dv_rows"] == 0 and m["n_records"] == 10_050
    assert tf.read(spark, dv_table).filter("grp = 7").count() == 50


def test_merge_on_read_whole_row_null_wins(spark, dv_table):
    """MOR is whole-row replacement: a NULL in the change row lands,
    unlike merge()'s coalesce-to-base."""
    ch = spark.createDataFrame(
        [(5, None, None)], "id bigint, grp bigint, val bigint"
    )
    tf.merge_on_read(spark, dv_table, ch, key="id")
    row = tf.read(spark, dv_table).filter("id = 5").first()
    assert row.grp is None and row.val is None


def test_merge_on_read_composes_with_delete_and_compact(spark, dv_table):
    tf.delete_where(spark, dv_table, "grp = 4")  # 2000 gone
    ch = spark.range(0, 10).select(
        (F.col("id") * 5 + 4).alias("id"),  # grp-4 keys: already deleted
        F.lit(2).cast("bigint").alias("grp"),
        F.lit(0).cast("bigint").alias("val"),
    )
    s = tf.merge_on_read(spark, dv_table, ch, key="id")
    m = tf.read_manifest(dv_table, s)
    # deleted rows are NOT visible, so they are inserts, not matches
    assert m["n_records"] == 8_010
    out = tf.read(spark, dv_table)
    assert out.count() == 8_010
    assert out.filter("grp = 2 AND val = 0").count() == 10
    s2 = tf.compact(spark, dv_table, target_files=2)
    m2 = tf.read_manifest(dv_table, s2)
    assert "dv" not in m2 and m2["n_records"] == 8_010
    assert tf.read(spark, dv_table).count() == 8_010


def test_merge_on_read_is_driver_bounded(spark, dv_table, monkeypatch):
    from pyspark.sql import DataFrame

    sizes = []
    orig_collect = DataFrame.collect

    def counting_collect(self):
        rows = orig_collect(self)
        sizes.append(len(rows))
        return rows

    def banned_topandas(self):
        raise AssertionError("merge_on_read pulled a frame via toPandas")

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    monkeypatch.setattr(DataFrame, "toPandas", banned_topandas)
    ch = spark.range(0, 10).select(
        F.col("id"),
        F.lit(9).cast("bigint").alias("grp"),
        F.lit(0).cast("bigint").alias("val"),
    )
    s = tf.merge_on_read(spark, dv_table, ch, key="id")
    assert sizes == [], sizes
    assert tf.read_manifest(dv_table, s)["n_records"] == 10_000


def test_merge_on_read_txn_stamp_and_replay_noop(spark, dv_table):
    """The exactly-once hook for streaming CDC-upsert sinks: MOR
    commits carry the writer-transaction stamp, and a sink checking
    last_txn_version no-ops a replayed batch (the
    replay-after-commit-before-checkpoint hole)."""
    ch = spark.range(0, 10).select(
        F.col("id"),
        F.lit(9).cast("bigint").alias("grp"),
        F.lit(0).cast("bigint").alias("val"),
    )
    assert tf.last_txn_version(dv_table, "cdc") == -1
    tf.merge_on_read(spark, dv_table, ch, key="id", txn=("cdc", 0))
    assert tf.last_txn_version(dv_table, "cdc") == 0
    n = tf.read(spark, dv_table).count()
    # the sink's idempotence guard: batch 0 redelivered -> skip
    if not tf.last_txn_version(dv_table, "cdc") >= 0:  # pragma: no cover
        tf.merge_on_read(spark, dv_table, ch, key="id", txn=("cdc", 0))
    assert tf.read(spark, dv_table).count() == n
    tf.merge_on_read(spark, dv_table, ch, key="id", txn=("cdc", 1))
    assert tf.last_txn_version(dv_table, "cdc") == 1
