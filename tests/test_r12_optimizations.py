"""Focused pins for the r12 optimization round's internal changes.

Covers the three internals the round restructured:
- twins._stream_shuffle_partitions (size-adaptive streaming state
  partitions — the formula, its floor, and its session cap);
- twins._stage_slices (fingerprint-keyed executor-written staging —
  reuse on second call, rebuild on incomplete dir);
- dedup._star_components (fixpoint fused into the round rollup —
  labels identical to a reference union-find on known graphs; the
  equivalence suite pins the corpus-level hashes, this pins the
  primitive on adversarial shapes).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pypiper_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(app_name="r12-opt-tests", shuffle_partitions=8)


def test_stream_partitions_floor_for_tiny_input(spark, tmp_path):
    from pypiper_spark.streaming.twins import (
        _STREAM_PARTITION_FLOOR,
        _stream_shuffle_partitions,
    )

    (tmp_path / "events.parquet").write_bytes(b"x" * 1024)  # 1 KB
    assert _stream_shuffle_partitions(spark, str(tmp_path)) == (
        _STREAM_PARTITION_FLOOR
    )


def test_stream_partitions_scale_with_input_capped_at_session(spark, tmp_path):
    from pypiper_spark.streaming.twins import (
        _STREAM_PARTITION_TARGET_BYTES,
        _stream_shuffle_partitions,
    )

    # 5 targets worth of bytes -> 5 partitions (below the session cap of 8)
    with open(tmp_path / "events.parquet", "wb") as fh:
        fh.seek(5 * _STREAM_PARTITION_TARGET_BYTES - 1)
        fh.write(b"\0")
    assert _stream_shuffle_partitions(spark, str(tmp_path)) == 5
    # 100 targets worth -> capped at the session default (8 here)
    with open(tmp_path / "events.parquet", "wb") as fh:
        fh.seek(100 * _STREAM_PARTITION_TARGET_BYTES - 1)
        fh.write(b"\0")
    assert _stream_shuffle_partitions(spark, str(tmp_path)) == 8


def test_stream_partitions_missing_table_falls_back_to_session(spark, tmp_path):
    from pypiper_spark.streaming.twins import _stream_shuffle_partitions

    assert _stream_shuffle_partitions(spark, str(tmp_path / "nope")) == 8


def test_stage_slices_reuses_complete_dir_and_rebuilds_incomplete(spark, tmp_path):
    from pypiper_spark.streaming.twins import _stage_slices

    df = spark.range(100).select(F.col("id").alias("event_id"))
    stage = str(tmp_path / "stage")
    _stage_slices(df, stage, 2, lambda k: F.col("event_id") % 2 == k)
    names = sorted(os.listdir(stage))
    assert names == ["batch0.parquet", "batch1.parquet"]
    mtimes = [os.stat(os.path.join(stage, n)).st_mtime_ns for n in names]
    # deterministic ascending mtimes (the replay-order contract)
    assert mtimes[0] < mtimes[1]
    # second call: complete dir is reused untouched (no rewrite)
    inodes = [os.stat(os.path.join(stage, n)).st_ino for n in names]
    _stage_slices(df, stage, 2, lambda k: F.col("event_id") % 2 == k)
    assert [os.stat(os.path.join(stage, n)).st_ino for n in names] == inodes
    # incomplete dir (one file missing) is rebuilt whole
    os.unlink(os.path.join(stage, "batch1.parquet"))
    _stage_slices(df, stage, 2, lambda k: F.col("event_id") % 2 == k)
    assert sorted(os.listdir(stage)) == ["batch0.parquet", "batch1.parquet"]
    # content round-trips: both slices together are the input set
    got = sorted(
        r.event_id for r in spark.read.parquet(stage).collect()
    )
    assert got == list(range(100))


def _reference_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to final roots
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "edges",
    [
        # chain (worst case for naive propagation)
        [(i, i + 1) for i in range(60)],
        # two stars sharing one bridge + an isolated pair
        [(0, i) for i in range(1, 10)]
        + [(100, 100 + i) for i in range(1, 10)]
        + [(9, 100)]
        + [(500, 501)],
        # cycle
        [(i, (i + 1) % 17) for i in range(17)],
    ],
)
def test_star_components_fused_fixpoint_matches_union_find(spark, edges):
    from pypiper_spark.queries.dedup import _star_components

    sym_rows = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    sym = spark.createDataFrame(sym_rows, "a long, b long")
    labels, rounds = _star_components(sym)
    got = {r.node: r.lbl for r in labels.collect()}
    want = _reference_components(edges)
    # every node labeled with its component's minimum id
    comp_min: dict[int, int] = {}
    for n, root in want.items():
        comp_min[root] = min(comp_min.get(root, n), n)
    want_min = {n: comp_min[root] for n, root in want.items()}
    assert got == want_min
    assert rounds <= 64
