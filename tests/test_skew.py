"""Skew handling: salted join equivalence + AQE skew-join smoke
(FIXTURES.md skewed_keys fixture)."""

import pytest
from pyspark.sql import functions as F

from pypiper_spark.functions.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # 1 hot key (90% of rows) + long tail — the classic hot-partition shape
    left = spark.range(20000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    return left, right


def test_salted_join_equals_plain_join(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    salted = salted_join(left, right, "k", salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_join_distributes_hot_key(spark, skewed):
    left, _ = skewed
    from pypiper_spark.functions.skew import salted_join as _  # noqa: F401

    # the scatter column must actually split the hot key's rows
    scatter = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)).cast("int"),
    )
    counts = (
        scatter.filter(F.col("k") == 7)
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(counts) == 8, "hot key must scatter across all salt buckets"
    sizes = [r["count"] for r in counts]
    assert max(sizes) < 2 * min(sizes), f"scatter is unbalanced: {sizes}"


def test_salt_validation(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, "k", salt=0)


def test_aqe_skew_join_correct_under_skew(spark, skewed):
    left, right = skewed
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out = left.join(right, "k").agg(F.count(F.lit(1)).alias("n")).first()
    exp = left.groupBy("k").count().join(right, "k").agg(
        F.sum("count").alias("n")
    ).first()
    assert out.n == exp.n
