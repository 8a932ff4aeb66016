"""Multi-micro-batch streaming: state must carry ACROSS batches.

The single-file twins in test_streaming.py run as one micro-batch;
here events are split into 5 files (maxFilesPerTrigger=1 -> 5
batches), so windowed aggregation state genuinely accumulates
incrementally. Plus a hand-crafted late-data fixture proving the
watermark drops what it promises to drop.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pypiper_spark.catalog import load_table
from pypiper_spark.queries.events_streaming import tumbling_transform
from pypiper_spark.streaming.twins import EVENTS_RAW_SCHEMA
from tests.parity import assert_query_matches


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    """events split into 5 parquet files by event_id stripe."""
    out = tmp_path_factory.mktemp("events_split")
    ev = load_table(spark, sf_dir, "events")
    pdf = ev.toPandas()
    for i in range(5):
        stripe = pdf[pdf.event_id % 5 == i]
        # coerce to us: pandas writes ns by default, which the session's
        # nanosAsLong conf would surface as LongType
        stripe.to_parquet(out / f"part-{i}.parquet", index=False, coerce_timestamps="us")
    return str(out)


def _read_stream(spark, path):
    import pyspark.sql.types as T

    schema = T.StructType(
        [f for f in EVENTS_RAW_SCHEMA if f.name != "ts"]
        + [T.StructField("ts", T.TimestampNTZType())]
    )
    # the split files were written from the already-normalized frame
    # (ts is timestamp_ntz/us), so no ns handling needed here
    return (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_windowed_agg_accumulates_across_five_batches(spark, sf_dir, split_events_dir):
    import uuid

    batch = tumbling_transform(load_table(spark, sf_dir, "events"))
    name = f"mb_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_transform(_read_stream(spark, split_events_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(q.recentProgress) >= 5, "expected one micro-batch per file"
    assert_query_matches(spark.table(name), batch.toPandas(), name="multibatch-tumbling")


def _events_pdf(ids, times):
    return pd.DataFrame(
        {
            "event_id": ids,
            "ts": pd.to_datetime(times),
            "user_id": [1] * len(ids),
            "event_type": ["click"] * len(ids),
            "value": [1.0] * len(ids),
            "props": ["{}"] * len(ids),
        }
    )


def test_watermark_emit_once_drops_late_update(spark, tmp_path):
    """APPEND mode's contract: a window is emitted exactly once, when
    the watermark passes its end; a late row targeting an
    already-emitted (evicted) window is DROPPED, never re-emitted.

    (Observed Spark 4 subtlety, documented here: a late row whose
    window was never materialized opens fresh state and still gets
    emitted — the drop guarantee applies to evicted windows, not to
    arbitrarily old timestamps.)

    batch 0: 10:05, 11:05, 12:00   -> wm after: 11:50; [10:00) and
                                      [11:00) emitted with n=1
    batch 1: 12:30                 -> wm after: 12:20
    batch 2: LATE 10:10            -> its window already emitted ->
                                      must be dropped (no second row)
    """
    d = tmp_path / "late"
    d.mkdir()
    files = [
        _events_pdf([1, 2, 3], ["2024-01-01 10:05", "2024-01-01 11:05", "2024-01-01 12:00"]),
        _events_pdf([4], ["2024-01-01 12:30"]),
        _events_pdf([5], ["2024-01-01 10:10"]),  # late for emitted [10:00, 11:00)
    ]
    for i, pdf in enumerate(files):
        p = d / f"part-{i}.parquet"
        pdf.to_parquet(p, index=False, coerce_timestamps="us")
    base = int(os.path.getmtime(d / "part-2.parquet"))
    for i in range(3):  # file source orders micro-batches by mtime
        os.utime(d / f"part-{i}.parquet", (base - 120 * (2 - i),) * 2)

    import uuid

    src = (
        spark.readStream.schema(spark.read.parquet(str(d)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    agg = (
        src.withColumn("ts_ltz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_ltz", "10 minutes")
        .groupBy(F.window("ts_ltz", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").cast("string").alias("ws"), "n")
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = [(r.ws, r.n) for r in spark.table(name).collect()]
    ten = [r for r in rows if r[0] == "2024-01-01 10:00:00"]
    # exactly one emission, with the ON-TIME count only (late 10:10 dropped)
    assert ten == [("2024-01-01 10:00:00", 1)], f"late update leaked: {rows}"
    assert ("2024-01-01 11:00:00", 1) in rows
