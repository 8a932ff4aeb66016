"""Flagship query: TPC-H Q1-shaped pricing summary (SURVEY.md section 7.2).

One query exercising scan -> filter(pushdown) -> project -> hash agg
(partial+final) -> sort. At 100 TB this is a single shuffle on a
6-value grouping key; the parquet scan prunes to 8 of 11 columns and
pushes the l_shipdate predicate to row groups.

Money expressions are computed in exact integer-cents arithmetic
(compare.py rules 1-2) so results are bit-identical at any
partitioning — on the DuckDB oracle and on a 1000-executor cluster —
at plain-double speed (exact decimal costs ~2x; bench-verified).
Per-group cent-product sums stay far below 2^53 at driver scales, so
the final double conversion is exact in both engines.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypiper_spark.catalog import load_table
from pypiper_spark.compare import cents, davg, dsum, sql_cents, sql_davg, sql_dsum
from pypiper_spark.registry import register

_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  (CAST(sum({sql_cents('l_extendedprice')} * {sql_cents('1.0 - l_discount')}) AS DOUBLE)
   / 10000) AS sum_disc_price,
  (CAST(sum({sql_cents('l_extendedprice')} * {sql_cents('1.0 - l_discount')}
            * {sql_cents('1.0 + l_tax')}) AS DOUBLE) / 1000000) AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q_pricing_summary", oracle=_ORACLE, tags=("flagship", "aggregate"))
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship TPC-H Q1 shape: scan -> pushed filter -> exact-cents hash agg -> sort (module docstring has the scale story)."""
    li = load_table(spark, sf_dir, "lineitem")
    ext = cents("l_extendedprice")
    disc1 = cents(F.lit(1.0) - F.col("l_discount"))
    tax1 = cents(F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            (F.sum(ext * disc1).cast("double") / 10000).alias("sum_disc_price"),
            (F.sum(ext * disc1 * tax1).cast("double") / 1000000).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
