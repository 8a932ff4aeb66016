"""Bucketed co-located join (SURVEY.md scale toolbox): pre-bucketing
both sides of a recurring join key removes the per-query shuffle — on
100 TB pipelines this is how the nightly join stops paying exchange
cost. Asserted on the physical plan, not assumed."""

import pytest
from pyspark.sql import functions as F

from pypiper_spark.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown.
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(t_orders)
        li = spark.table(t_lineitem)
        joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        # the join inputs must come straight from the bucketed scans —
        # no Exchange between scan and join
        before_join = plan.split("SortMergeJoin")[1]
        assert "Exchange hashpartitioning" not in before_join, plan
        # correctness vs the unbucketed join
        plain = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_ensure_bucketed_identity_includes_key_and_buckets(spark, sf_dir):
    """ADVICE r5: the catalog-twin identity must include key_col and
    n_buckets — a later call asking for the same table bucketed
    differently must get a DIFFERENT twin, never silently reuse one
    bucketed on the wrong key."""
    from pypiper_spark.bucketing import ensure_bucketed

    a = ensure_bucketed(spark, sf_dir, "orders", "o_orderkey", 8)
    b = ensure_bucketed(spark, sf_dir, "orders", "o_custkey", 8)
    c = ensure_bucketed(spark, sf_dir, "orders", "o_orderkey", 4)
    same = ensure_bucketed(spark, sf_dir, "orders", "o_orderkey", 8)
    assert len({a, b, c}) == 3
    assert same == a
    for name in {a, b, c}:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
