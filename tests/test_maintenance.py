"""Table-maintenance behaviors that don't fit a hash-gated query:
small-file compaction (file counts are physical, not logical) and the
schema-evolution read path details."""

import glob
import os
import tempfile

from pyspark.sql import functions as F

from pypiper_spark.catalog import load_table


def _parquet_files(path: str) -> list[str]:
    return [f for f in glob.glob(os.path.join(path, "*.parquet"))]


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir):
    """Compaction = rewrite with a sane partition count: 64 shards of
    a small table become 4, and not a row changes. At 100 TB this runs
    per partition-directory with maxRecordsPerFile bounding output."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    small = os.path.join(tempfile.gettempdir(), "pypiper_compact_small")
    big = os.path.join(tempfile.gettempdir(), "pypiper_compact_big")
    ev.repartition(64).write.mode("overwrite").parquet(small)
    assert len(_parquet_files(small)) == 64

    spark.read.parquet(small).repartition(4).write.mode("overwrite").parquet(big)
    assert len(_parquet_files(big)) == 4

    n_before = ev.count()
    after = spark.read.parquet(big)
    assert after.count() == n_before
    # content identical, not just count: checksum both sides
    chk = lambda df: df.agg(
        F.sum(F.hash("event_id", "user_id")).alias("h")
    ).collect()[0].h
    assert chk(after) == chk(ev)


def test_schema_evolution_nulls_only_pre_evolution_rows(spark, sf_dir):
    from pypiper_spark.registry import all_queries

    out = all_queries()["q_scan_schema_evolution"].fn(spark, sf_dir).toPandas()
    assert "<pre-evolution>" in set(out.priority)
    # the sentinel bucket holds exactly the pre-1996 rows
    o = load_table(spark, sf_dir, "orders")
    n_pre = o.filter(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    ).count()
    assert int(out.set_index("priority").loc["<pre-evolution>", "n_orders"]) == n_pre
