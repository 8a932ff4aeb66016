"""Restart / recovery semantics of the incremental pipeline API:
the exactly-once bookkeeping a periodic 100 TB ingestion job leans
on (checkpointed file-source progress + idempotent sinks).
"""

import os

import pandas as pd
from pyspark.sql import functions as F

from pypiper_spark.catalog import load_table
from pypiper_spark.streaming.incremental import (
    incremental_foreach_batch,
    incremental_parquet_pipeline,
)


def _stage(pdf: pd.DataFrame, path: str) -> None:
    pdf.to_parquet(path, index=False, coerce_timestamps="us")


def _events_pdf(spark, sf_dir) -> pd.DataFrame:
    return load_table(spark, sf_dir, "events").toPandas()


def test_incremental_run_picks_up_only_new_files(spark, sf_dir, tmp_path):
    """Run 1 sees file A; run 2 (same checkpoint) sees only file B;
    output holds every row exactly once; run 3 is a no-op."""
    pdf = _events_pdf(spark, sf_dir)
    inp, out, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    os.makedirs(inp)
    a = pdf[pdf.event_id % 2 == 0]
    b = pdf[pdf.event_id % 2 == 1]
    _stage(a, f"{inp}/a.parquet")

    def xf(df):
        return df.filter(F.col("value") >= 0).withColumn(
            "value_bucket", F.floor(F.col("value") / 10)
        )

    n1 = incremental_parquet_pipeline(spark, inp, out, cp, transform=xf)
    assert n1 >= 1
    got1 = spark.read.parquet(out)
    assert got1.count() == len(a)

    _stage(b, f"{inp}/b.parquet")
    n2 = incremental_parquet_pipeline(spark, inp, out, cp, transform=xf)
    assert n2 >= 1
    got2 = spark.read.parquet(out)
    # every event exactly once across the two runs — no replay of file A
    assert got2.count() == len(pdf)
    assert got2.select("event_id").distinct().count() == len(pdf)

    n3 = incremental_parquet_pipeline(spark, inp, out, cp, transform=xf)
    assert n3 == 0, "no new files -> no batches"
    assert spark.read.parquet(out).count() == len(pdf)


def test_foreach_batch_ids_stable_and_exactly_once(spark, sf_dir, tmp_path):
    """foreachBatch delivery: all rows exactly once across batches,
    and a drained checkpoint delivers nothing on rerun."""
    pdf = _events_pdf(spark, sf_dir)
    inp, cp = str(tmp_path / "in"), str(tmp_path / "cp")
    os.makedirs(inp)
    for i in range(3):
        _stage(pdf[pdf.event_id % 3 == i], f"{inp}/f{i}.parquet")

    seen: dict[int, int] = {}

    def sink(batch_df, batch_id):
        seen[batch_id] = batch_df.count()

    n = incremental_foreach_batch(
        spark, inp, cp, sink, max_files_per_trigger=1
    )
    assert n == len(seen) == 3
    assert sum(seen.values()) == len(pdf)
    assert sorted(seen) == [0, 1, 2], "batch ids are a dense restart-stable sequence"

    seen.clear()
    n_again = incremental_foreach_batch(spark, inp, cp, sink)
    assert n_again == 0 and seen == {}, "drained checkpoint redelivers nothing"


def test_sink_failure_then_restart_redelivers_same_batch_id(spark, sf_dir, tmp_path):
    """Crash mid-run: the failed batch is redelivered on restart with
    the SAME batch_id (the idempotent-upsert contract), and committed
    batches are not replayed."""
    pdf = _events_pdf(spark, sf_dir)
    inp, cp = str(tmp_path / "in"), str(tmp_path / "cp")
    os.makedirs(inp)
    for i in range(3):
        _stage(pdf[pdf.event_id % 3 == i], f"{inp}/f{i}.parquet")

    delivered: list[int] = []

    def failing_sink(batch_df, batch_id):
        batch_df.count()  # force evaluation before the crash
        if batch_id == 1:
            raise RuntimeError("sink exploded mid-pipeline")
        delivered.append(batch_id)

    try:
        incremental_foreach_batch(
            spark, inp, cp, failing_sink, max_files_per_trigger=1
        )
        raise AssertionError("expected the streaming query to fail")
    except Exception as e:  # noqa: BLE001 — Spark wraps it
        assert "sink exploded" in str(e)
    assert delivered == [0], "batch 0 committed before the crash"

    redelivered: list[int] = []

    def ok_sink(batch_df, batch_id):
        redelivered.append(batch_id)

    incremental_foreach_batch(spark, inp, cp, ok_sink, max_files_per_trigger=1)
    assert redelivered[0] == 1, "failed batch comes back first, same id"
    assert 0 not in redelivered, "committed batch 0 is never replayed"
    assert sorted(delivered + redelivered) == [0, 1, 2]
