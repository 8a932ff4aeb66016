"""Incremental pipeline runs: checkpointed availableNow batches.

The production shape of a 100 TB training-data pipeline is not an
always-on stream — it is a *periodic incremental job*: each run picks
up exactly the files that arrived since the last run, transforms
them, and appends to the output exactly once, surviving crashes and
restarts. Structured Streaming gives this for free when driven as
``readStream`` + ``trigger(availableNow=True)`` + a checkpoint:

- the checkpoint's file-source log records which input files each
  committed micro-batch consumed -> a restart never re-reads them;
- the parquet sink's transaction log (``_spark_metadata``) records
  which output files each batch committed -> a crash between write
  and commit is rolled forward idempotently;
- ``availableNow`` drains everything currently present, then stops —
  a cron-able batch job with streaming's exactly-once bookkeeping.

The reference's pipeline model (push items, at-most-once, in-memory)
has no analog for any of this; it is what Spark adds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def incremental_parquet_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    max_files_per_trigger: int | None = None,
) -> int:
    """One incremental run: process files not yet seen by this
    checkpoint, append results to ``output_dir`` exactly once, stop.

    Returns the number of micro-batches this run committed (0 when
    no new files had arrived — a cheap no-op, safe to cron).
    ``transform`` must be stateless row-wise logic (select / filter /
    withColumn / UDF); stateful aggregation wants watermarks and the
    twins in streaming/twins.py instead.
    """
    schema = spark.read.parquet(input_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(input_dir)
    if transform is not None:
        df = transform(df)
    q = (
        df.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.recentProgress
    return sum(1 for p in progress if p["numInputRows"] > 0)


def incremental_foreach_batch(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    transform: Callable[[DataFrame], DataFrame] | None = None,
    max_files_per_trigger: int | None = None,
) -> int:
    """Incremental run delivering each micro-batch to ``batch_fn(df,
    batch_id)`` — the escape hatch for sinks Spark has no connector
    for (feature stores, JDBC upserts, manifest writers).

    Exactly-once contract: ``batch_id`` is stable across restarts —
    a batch replayed after a crash arrives with the SAME id, so a
    sink keyed on (or overwriting by) batch_id is idempotent. The
    checkpoint advances only after ``batch_fn`` returns.
    Returns the number of batches delivered this run.
    """
    schema = spark.read.parquet(input_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(input_dir)
    if transform is not None:
        df = transform(df)

    delivered = 0

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal delivered
        delivered += 1
        batch_fn(batch_df, batch_id)

    q = (
        df.writeStream.foreachBatch(_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return delivered
