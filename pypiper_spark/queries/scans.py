"""Sources & scans (SURVEY.md section 2B: scans / sources / sinks).

Scale notes: q_scan_projection_pushdown / q_scan_filter_pushdown exist
to *prove* (tests assert on the physical plan) that column pruning and
predicate pushdown reach the parquet scan — the difference between
reading 2 columns and 11 at 100 TB.
"""

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypiper_spark.catalog import TABLES, load_table
from pypiper_spark.registry import register

_COUNTS_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS tbl, count(*) AS n_rows FROM {t}" for t in TABLES
)


@register("q_scan_parquet", oracle=_COUNTS_ORACLE, tags=("scan",))
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan + count of every table (reference source-node analog)."""
    frames = [
        load_table(spark, sf_dir, t)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit(t).alias("tbl"), "n_rows")
        for t in TABLES
    ]
    return reduce(DataFrame.unionByName, frames)


@register(
    "q_scan_projection_pushdown",
    oracle="SELECT l_orderkey, l_extendedprice FROM lineitem",
    tags=("scan",),
)
def scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-of-11-column projection; ReadSchema must show only these two."""
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")


@register(
    "q_scan_filter_pushdown",
    oracle="""
      SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1999-01-01 00:00:00' AND l_quantity > 40
    """,
    tags=("scan",),
)
def scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate reaches the scan (PushedFilters in the plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_quantity") > 40)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@register(
    "q_source_range",
    oracle="""
      SELECT id, id * 2 AS doubled, id * id AS squared
      FROM range(0, 1000) t(id)
      WHERE id % 7 = 3
    """,
    tags=("scan", "source"),
)
def source_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic generator source (reference Generate node analog)."""
    return (
        spark.range(0, 1000)
        .filter(F.col("id") % 7 == 3)
        .select(
            "id",
            (F.col("id") * 2).alias("doubled"),
            (F.col("id") * F.col("id")).alias("squared"),
        )
    )
