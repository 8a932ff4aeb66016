"""Projections, filters, predicates, conditionals (SURVEY.md 2B).

These are the reference's emit-1:1 / emit-0-or-1 node analogs
(SURVEY.md 2A rows A3-A4), expressed as Catalyst expressions so they
fuse into whole-stage codegen with the scan.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypiper_spark.catalog import load_table
from pypiper_spark.registry import register


@register(
    "q_project_rename",
    oracle="""
      SELECT
        c_custkey AS customer_id,
        upper(c_name) AS customer_name,
        c_acctbal AS balance,
        c_acctbal * CAST(1.1 AS DOUBLE) AS boosted_balance,
        c_mktsegment AS segment
      FROM customer
    """,
    tags=("projection",),
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename + computed column; column pruning reaches the scan."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.upper("c_name").alias("customer_name"),
        F.col("c_acctbal").alias("balance"),
        (F.col("c_acctbal") * 1.1).alias("boosted_balance"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "q_filter_simple",
    oracle="SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 150000.0",
    tags=("filter",),
)
def filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-predicate filter, pushed to the parquet scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice") > 150000.0).select("o_orderkey", "o_totalprice")


@register(
    "q_filter_compound",
    oracle="""
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
      WHERE (o_orderstatus IN ('F', 'P') OR o_totalprice BETWEEN 50000.0 AND 100000.0)
        AND NOT (o_orderpriority LIKE '5%')
    """,
    tags=("filter",),
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/IN/BETWEEN predicate tree, pushed down as a conjunction."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (
            F.col("o_orderstatus").isin("F", "P")
            | F.col("o_totalprice").between(50000.0, 100000.0)
        )
        & ~F.col("o_orderpriority").like("5%")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "q_filter_null_semantics",
    oracle="""
      WITH t AS (
        SELECT o_orderkey,
               nullif(o_orderstatus, 'P') AS status_np,
               nullif(o_orderpriority, '1-URGENT') AS prio_nu
        FROM orders
      )
      SELECT
        o_orderkey,
        status_np,
        (status_np IS NULL) AS status_is_null,
        (status_np IS NOT DISTINCT FROM prio_nu) AS null_safe_eq,
        coalesce(status_np, 'FALLBACK') AS status_filled
      FROM t
      WHERE status_np IS NULL OR prio_nu IS NOT NULL
    """,
    tags=("filter", "null"),
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL three-valued logic + null-safe equality (<=>), on nulls we
    derive deterministically (the testdata itself is null-free)."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_np"),
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio_nu"),
    )
    return t.select(
        "o_orderkey",
        "status_np",
        F.col("status_np").isNull().alias("status_is_null"),
        F.col("status_np").eqNullSafe(F.col("prio_nu")).alias("null_safe_eq"),
        F.coalesce(F.col("status_np"), F.lit("FALLBACK")).alias("status_filled"),
    ).filter(F.col("status_np").isNull() | F.col("prio_nu").isNotNull())


@register(
    "q_case_when",
    oracle="""
      SELECT
        o_orderkey,
        CASE
          WHEN o_totalprice >= 200000.0 THEN 'jumbo'
          WHEN o_totalprice >= 100000.0 THEN 'large'
          WHEN o_totalprice >= 25000.0 THEN 'medium'
          ELSE 'small'
        END AS size_class,
        CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open' ELSE 'other' END
          AS status_word
      FROM orders
    """,
    tags=("projection", "conditional"),
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch CASE WHEN tiering (the reference's per-item if/else chain, in codegen)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000.0, "jumbo")
        .when(F.col("o_totalprice") >= 100000.0, "large")
        .when(F.col("o_totalprice") >= 25000.0, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_word"),
    )
