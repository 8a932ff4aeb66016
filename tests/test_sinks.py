"""Sink/source roundtrips + partition pruning on partitioned output."""

import pytest
from pyspark.sql import functions as F

from pypiper_spark.catalog import load_table
from pypiper_spark.sources import read_table_any, write_table


@pytest.fixture()
def orders_small(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_roundtrip(spark, orders_small, tmp_path, fmt):
    path = str(tmp_path / f"out_{fmt}")
    write_table(orders_small, path, fmt=fmt)
    schema = None if fmt == "parquet" else orders_small.schema
    back = read_table_any(spark, path, fmt=fmt, schema=schema)
    a = sorted(map(tuple, orders_small.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_partitioned_write_prunes_on_read(spark, orders_small, tmp_path):
    path = str(tmp_path / "out_part")
    write_table(orders_small, path, partition_by=["o_orderstatus"])
    back = read_table_any(spark, path).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must appear as PartitionFilters, not a post-scan Filter
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    n_f = orders_small.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == n_f


def test_write_rejects_unknown_format(orders_small, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(orders_small, str(tmp_path / "x"), fmt="avro")
