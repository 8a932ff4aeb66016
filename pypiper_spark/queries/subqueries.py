"""Subquery operators: IN / NOT IN / correlated EXISTS / scalar /
correlated scalar (SURVEY.md 2B breadth extras).

The reference composes these imperatively (a filter node holding a
set built by an upstream pipeline); SQL engines express them as
subqueries. Spark-first story: Catalyst *rewrites* every subquery
form into a join (IN -> left semi, NOT IN -> null-aware anti,
EXISTS -> semi, scalar -> broadcast cross join, correlated scalar ->
aggregate + equi join), so at 100 TB each runs as a shuffle- or
broadcast-bounded join, never a per-row probe. Half the queries here
author the subquery in SQL text (proving the surface), half author
the rewritten join directly in the DataFrame API (proving the plan) —
both compile to the same physical strategies.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypiper_spark.catalog import load_table, register_views
from pypiper_spark.compare import cents
from pypiper_spark.registry import register

# One SQL text, two engines (dialect-neutral — see q_sql_api).
_IN_SQL = """
  SELECT c_custkey, c_name, c_acctbal
  FROM customer
  WHERE c_custkey IN (SELECT o_custkey FROM orders
                      WHERE o_totalprice > CAST(400000.0 AS DOUBLE))
"""


@register("q_subquery_in", oracle=_IN_SQL, tags=("subquery", "semi"))
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery surface: Catalyst rewrites to LEFT SEMI join, so
    the orders side is aggregated/deduped by the join itself — no
    materialized key set on the driver (the reference's approach)."""
    register_views(spark, sf_dir)
    return spark.sql(_IN_SQL)


_NOT_IN_ORACLE = """
  SELECT p_partkey, p_name
  FROM part
  WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                          WHERE l_quantity > 45)
"""


@register("q_subquery_not_in", oracle=_NOT_IN_ORACLE, tags=("subquery", "anti"))
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN re-expressed as LEFT ANTI join — legal because
    l_partkey is non-null (NOT IN over a nullable subquery is
    three-valued and returns nothing once a NULL appears; the anti
    join is the sane, scalable semantics). SQL NOT IN forces Spark's
    null-aware anti join, which degrades to broadcast-nested-loop;
    the explicit anti join keeps a hash join at 100 TB."""
    part = load_table(spark, sf_dir, "part")
    hot = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select(F.col("l_partkey").alias("p_partkey"))
    )
    return part.join(hot, on="p_partkey", how="left_anti").select(
        "p_partkey", "p_name"
    )


_EXISTS_SQL = """
  SELECT s_suppkey, s_name, s_acctbal
  FROM supplier s
  WHERE EXISTS (SELECT 1 FROM lineitem li
                WHERE li.l_suppkey = s.s_suppkey
                  AND li.l_returnflag = 'R' AND li.l_quantity > 49)
"""


@register("q_subquery_exists", oracle=_EXISTS_SQL, tags=("subquery", "exists"))
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: Catalyst pulls the correlated predicate up
    into a LEFT SEMI join condition — one shuffle (or broadcast of
    supplier), no per-supplier rescan of lineitem."""
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


_SCALAR_ORACLE = """
  SELECT o_orderkey, o_custkey, o_totalprice
  FROM orders
  WHERE CAST(round(o_totalprice * 100) AS BIGINT)
        * (SELECT count(*) * 2 FROM orders)
        > 3 * (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) FROM orders)
"""


@register("q_subquery_scalar", oracle=_SCALAR_ORACLE, tags=("subquery", "scalar"))
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (orders above 1.5x the global
    average price), as its Spark plan: a 1-row global aggregate
    broadcast-cross-joined to the fact side. The comparison stays in
    exact integer cents (cents*2*n > 3*sum_cents <=> price > 1.5*avg)
    so the threshold is partitioning-independent — compare.py rule 1
    applied to a *predicate*, not just an output column."""
    o = load_table(spark, sf_dir, "orders")
    glob = o.agg(
        F.count(F.lit(1)).alias("_n"), F.sum(cents("o_totalprice")).alias("_sum_c")
    )
    return (
        o.crossJoin(F.broadcast(glob))
        .filter(cents("o_totalprice") * F.col("_n") * 2 > F.col("_sum_c") * 3)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_CORR_SCALAR_ORACLE = """
  SELECT o_orderkey, o_custkey, o_totalprice
  FROM orders o
  WHERE CAST(round(o.o_totalprice * 100) AS BIGINT)
        * (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        > (SELECT CAST(sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
                       AS BIGINT)
           FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""


@register(
    "q_subquery_corr_scalar",
    oracle=_CORR_SCALAR_ORACLE,
    tags=("subquery", "scalar", "correlated"),
)
def subquery_corr_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each order vs its own customer's
    average), de-correlated by hand the way Catalyst would: one
    grouped aggregate + one equi join on the correlation key. Two
    scans of orders but a single shuffle each — at 100 TB this is a
    co-partitioned join on o_custkey, not |orders| subquery probes.
    Exact-cents predicate as in q_subquery_scalar."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("_n"), F.sum(cents("o_totalprice")).alias("_sum_c")
    )
    return (
        o.join(per_cust, on="o_custkey")
        .filter(cents("o_totalprice") * F.col("_n") > F.col("_sum_c"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
