"""SQL-text entry point (SURVEY.md 1.2: one engine, two authoring
surfaces). The same ANSI-ish SQL runs on Spark (over registered temp
views) and on the DuckDB oracle — dialect-neutral by construction.
"""

from pyspark.sql import DataFrame, SparkSession

from pypiper_spark.catalog import register_views
from pypiper_spark.registry import register

# One SQL text, two engines: only dialect-neutral constructs.
_SQL = """
  SELECT c.c_mktsegment,
         count(*) AS n_orders,
         (CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100)
           AS segment_revenue,
         max(o.o_totalprice) AS max_order
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderstatus <> 'P'
  GROUP BY c.c_mktsegment
"""


@register("q_sql_api", oracle=_SQL, tags=("sql",))
def sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql over the registered catalog views — proves the SQL
    surface shares the DataFrame engine (same Catalyst plan)."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL)
