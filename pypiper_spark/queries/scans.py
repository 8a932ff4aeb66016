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


_RT_CSV_ORACLE = """
  SELECT c_mktsegment, count(*) AS n_cust,
         (CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100)
           AS total_bal,
         min(c_name) AS first_name
  FROM customer GROUP BY c_mktsegment
"""


@register("q_roundtrip_csv", oracle=_RT_CSV_ORACLE, tags=("scan", "sink", "csv"))
def roundtrip_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink+source fidelity as a QUERY: customer -> CSV (header,
    explicit schema on re-read — CSV carries no types) -> grouped
    aggregate, oracled against the original parquet. Proves the text
    format round-trips longs/doubles/strings losslessly. Writes land
    in a per-(sf,table) temp dir, overwritten on re-run."""
    import hashlib
    import tempfile

    cust = load_table(spark, sf_dir, "customer")
    key = hashlib.md5(f"{sf_dir}/customer".encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/pypiper_rt_csv_{key}"
    cust.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema(cust.schema).option("header", True).csv(path)
    )
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        (F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).cast("double") / 100)
        .alias("total_bal"),
        F.min("c_name").alias("first_name"),
    )


_RT_JSON_ORACLE = """
  SELECT s_nationkey, count(*) AS n_supp,
         (CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100)
           AS total_bal
  FROM supplier GROUP BY s_nationkey
"""


@register("q_roundtrip_json", oracle=_RT_JSON_ORACLE, tags=("scan", "sink", "json"))
def roundtrip_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier -> JSON-lines -> grouped aggregate, oracled against
    the original parquet (schema-on-read with the original schema;
    JSON doubles survive via shortest-roundtrip printing)."""
    import hashlib
    import tempfile

    supp = load_table(spark, sf_dir, "supplier")
    key = hashlib.md5(f"{sf_dir}/supplier".encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/pypiper_rt_json_{key}"
    supp.write.mode("overwrite").json(path)
    back = spark.read.schema(supp.schema).json(path)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        (F.sum(F.round(F.col("s_acctbal") * 100).cast("long")).cast("double") / 100)
        .alias("total_bal"),
    )


_RT_ORC_ORACLE = """
  SELECT p_brand, count(*) AS n_parts,
         (CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS DOUBLE) / 100)
           AS total_price,
         max(p_size) AS max_size
  FROM part GROUP BY p_brand
"""


@register("q_roundtrip_orc", oracle=_RT_ORC_ORACLE, tags=("scan", "sink", "orc"))
def roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part -> ORC -> grouped aggregate, oracled against the original
    parquet. ORC is Spark's other native columnar format (typed,
    predicate-pushdown-capable), so unlike the CSV/JSON roundtrips no
    schema-on-read is needed — the file carries the types."""
    import hashlib
    import tempfile

    part = load_table(spark, sf_dir, "part")
    key = hashlib.md5(f"{sf_dir}/part".encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/pypiper_rt_orc_{key}"
    part.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum(F.round(F.col("p_retailprice") * 100).cast("long")).cast("double") / 100)
        .alias("total_price"),
        F.max("p_size").alias("max_size"),
    )
