"""Spark-4 API surface: Python Data Source connector, LATERAL
correlated joins, VARIANT semi-structured access, recursive CTEs.

These are the modern equivalents of surfaces the reference exposes in
Python terms (custom generator sources, per-item expansion, dict
payloads, iterative expansion) — expressed the Spark-4-native way and
held to the same DuckDB hash gate as everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from pypiper_spark.catalog import load_table, register_views
from pypiper_spark.registry import register

# ---------------------------------------------------------------------------
# Python Data Source API: a custom parallel connector in pure Python
# ---------------------------------------------------------------------------

_SYNTH_N = 2000
_SYNTH_PARTS = 8


class _SynthPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _SynthReader(DataSourceReader):
    """Deterministic generator reader: each partition independently
    produces its id slice — the connector-side contract (split into
    InputPartitions, read each on an executor) that every real source
    (JDBC chunks, object-store listings, message queues) follows."""

    def __init__(self, options):
        self.n = int(options.get("n", _SYNTH_N))
        self.parts = int(options.get("partitions", _SYNTH_PARTS))

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [
            _SynthPartition(i * step, min((i + 1) * step, self.n))
            for i in range(self.parts)
            if i * step < self.n
        ]

    def read(self, partition):
        import hashlib

        for i in range(partition.start, partition.end):
            yield (i, i * i % 97, hashlib.md5(str(i).encode()).hexdigest())


class SyntheticRowsSource(DataSource):
    """`spark.read.format("pypiper_synthetic")` — the reference's
    generator-source node as a first-class Spark connector (Python
    Data Source API, Spark 4): schema + partition planning on the
    driver, per-partition generation on executors."""

    @classmethod
    def name(cls) -> str:
        return "pypiper_synthetic"

    def schema(self) -> str:
        return "id long, v long, h string"

    def reader(self, schema) -> DataSourceReader:
        return _SynthReader(self.options)


@register(
    "q_source_python_ds",
    oracle=f"""
      SELECT i AS id,
             i * i % 97 AS v,
             md5(CAST(i AS VARCHAR)) AS h
      FROM range(0, {_SYNTH_N}) t(i)
    """,
    tags=("scan", "source", "datasource"),
)
def source_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector via the Python Data Source API: an 8-way
    parallel deterministic row generator registered as a named format.
    The oracle recomputes the same rows from DuckDB's range() — md5
    hex digests agree byte-for-byte with hashlib.

    Scale shape: partition planning is driver-side metadata only; row
    production happens per-partition on executors (verified: 8 tasks).
    A production connector adds filter/column pushdown via the same
    API's pushFilters hook; generation here is already minimal so
    there is nothing to push."""
    spark.dataSource.register(SyntheticRowsSource)
    return (
        spark.read.format("pypiper_synthetic")
        .option("n", _SYNTH_N)
        .option("partitions", _SYNTH_PARTS)
        .load()
    )


# ---------------------------------------------------------------------------
# Python Data Source STREAMING source
# ---------------------------------------------------------------------------

_PYDS_STREAM_N = 1000
_PYDS_STREAM_CHUNK = 256  # 4 micro-batches of 256 + a 232 tail


class _SynthStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked deterministic generator: micro-batch k reads
    [pos, pos+chunk); readBetweenOffsets replays any committed range
    bit-identically (the exactly-once recovery hook)."""

    def __init__(self, options):
        self.n = int(options.get("n", _PYDS_STREAM_N))
        self.chunk = int(options.get("chunk", _PYDS_STREAM_CHUNK))

    def _rows(self, lo: int, hi: int):
        return iter([(i, i * i % 97) for i in range(lo, hi)])

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        p = start["pos"]
        if p >= self.n:
            return iter([]), start
        e = min(p + self.chunk, self.n)
        return self._rows(p, e), {"pos": e}

    def readBetweenOffsets(self, start, end):
        return self._rows(start["pos"], end["pos"])


class SyntheticStreamSource(DataSource):
    """`spark.readStream.format("pypiper_synth_stream")` — the
    reference's generator source as a real STREAMING connector
    (emit-until-close, A2/A5) with explicit offsets."""

    @classmethod
    def name(cls) -> str:
        return "pypiper_synth_stream"

    def schema(self) -> str:
        return "id bigint, v bigint"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SynthStreamReader(self.options)


@register(
    "q_source_python_ds_stream",
    oracle=f"""
      SELECT i % 8 AS bucket,
             count(*) AS n_rows,
             CAST(sum(i * i % 97) AS BIGINT) AS sum_v
      FROM range(0, {_PYDS_STREAM_N}) t(i)
      GROUP BY 1
    """,
    tags=("scan", "source", "datasource", "streaming", "real-stream"),
)
def source_python_ds_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom connector's STREAMING half, run on the real engine:
    the same deterministic generator as q_source_python_ds, delivered
    as micro-batches through SimpleDataSourceStreamReader's offset
    contract and folded by a complete-mode aggregation — covering the
    reference's generator-source-until-close lifecycle (A2/A5) on
    Structured Streaming with a custom Python source underneath.
    Exact oracle: the aggregate over range() equals the drained
    stream's aggregate because offsets tile [0, N) exactly once.
    Runner details (chunking, drain detection, replay hook) in
    streaming/twins.py::run_python_ds_stream."""
    from pypiper_spark.streaming.twins import run_python_ds_stream

    return run_python_ds_stream(spark, sf_dir)


# ---------------------------------------------------------------------------
# LATERAL correlated join
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
  SELECT o.o_orderkey, o.o_totalprice, l.l_linenumber, l.l_extendedprice
  FROM orders o,
  LATERAL (SELECT l_linenumber, l_extendedprice
           FROM lineitem
           WHERE l_orderkey = o.o_orderkey
           ORDER BY l_extendedprice DESC, l_linenumber
           LIMIT 2) l
  WHERE o.o_totalprice > 400000.0
"""


@register("q_join_lateral", oracle=_LATERAL_SQL, tags=("join", "lateral", "sql"))
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: top-2 priciest line items per
    high-value order, written as a per-row dependent subquery (the
    SQL-standard spelling of the reference's per-item 0..n emit).

    Catalyst decorrelates this into a window top-k over a hash join —
    same physical plan family as q_win_topk_per_group, NOT an
    O(orders x lineitem) nested loop; the identical text runs on
    DuckDB. Tie-break on (price DESC, linenumber) makes the LIMIT
    deterministic on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# VARIANT semi-structured access
# ---------------------------------------------------------------------------


@register(
    "q_variant_funcs",
    oracle="""
      SELECT event_id, user_id,
             CAST(props->>'$.k' AS BIGINT) AS k_val,
             CASE WHEN json_extract(props, '$.missing') IS NULL THEN 1 ELSE 0 END
               AS missing_is_null,
             CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod
      FROM events
      WHERE event_type = 'click'
    """,
    tags=("scalar", "variant", "json"),
)
def variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion (Spark 4): parse the JSON props column ONCE
    into the binary VARIANT encoding, then extract typed paths with
    variant_get / try_variant_get — the engine-native replacement for
    repeated get_json_object string re-parsing (each of which re-reads
    the whole JSON text). Missing paths: try_variant_get returns NULL
    instead of erroring. Final projection is all scalars; the oracle
    is DuckDB's JSON operators over the same strings."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.variant_get(v, "$.k", "bigint").alias("k_val"),
        F.when(F.try_variant_get(v, "$.missing", "string").isNull(), 1)
        .otherwise(0)
        .alias("missing_is_null"),
        (F.variant_get(v, "$.k", "bigint") % 10).alias("k_mod"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE
# ---------------------------------------------------------------------------

_RECURSIVE_SQL = """
  WITH RECURSIVE months(m) AS (
    SELECT date_trunc('month', min(o_orderdate)) FROM orders
    UNION ALL
    SELECT m + INTERVAL 1 MONTH FROM months
    WHERE m + INTERVAL 1 MONTH
          <= (SELECT date_trunc('month', max(o_orderdate)) FROM orders)
  ),
  per_month AS (
    SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n
    FROM orders GROUP BY date_trunc('month', o_orderdate)
  )
  SELECT CAST(months.m AS TIMESTAMP) AS month_start,
         CAST(coalesce(per_month.n, 0) AS BIGINT) AS n_orders
  FROM months LEFT JOIN per_month ON months.m = per_month.m
"""

@register("q_recursive_cte", oracle=_RECURSIVE_SQL, tags=("sql", "recursive"))
def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): build the monthly calendar spine
    between the first and last order month by recursion (~80 rounds,
    under Spark's default 100-level recursion limit), then left-join
    monthly order counts so empty months surface as zero — gap-filling
    by recursion, the SQL-standard counterpart of
    q_timeseries_gapfill's sequence()+explode.

    Scale note: the recursion generates the tiny spine (one row per
    round), never touches the fact table; the fact side remains one
    grouped aggregate. For spines deeper than the recursion limit the
    sequence()+explode form is the scale path."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


_TRANSPOSE_ORACLE = """
  WITH m AS (
    SELECT o_orderpriority AS p,
           count(*) AS n_orders,
           (CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100)
             AS total_price
    FROM orders GROUP BY o_orderpriority
  )
  SELECT 'n_orders' AS key,
         CAST(max(n_orders) FILTER (WHERE p = '1-URGENT') AS DOUBLE) AS "1-URGENT",
         CAST(max(n_orders) FILTER (WHERE p = '2-HIGH') AS DOUBLE) AS "2-HIGH",
         CAST(max(n_orders) FILTER (WHERE p = '3-MEDIUM') AS DOUBLE) AS "3-MEDIUM",
         CAST(max(n_orders) FILTER (WHERE p = '4-NOT SPECIFIED') AS DOUBLE)
           AS "4-NOT SPECIFIED",
         CAST(max(n_orders) FILTER (WHERE p = '5-LOW') AS DOUBLE) AS "5-LOW"
  FROM m
  UNION ALL
  SELECT 'total_price',
         max(total_price) FILTER (WHERE p = '1-URGENT'),
         max(total_price) FILTER (WHERE p = '2-HIGH'),
         max(total_price) FILTER (WHERE p = '3-MEDIUM'),
         max(total_price) FILTER (WHERE p = '4-NOT SPECIFIED'),
         max(total_price) FILTER (WHERE p = '5-LOW')
  FROM m
"""


@register("q_transpose", oracle=_TRANSPOSE_ORACLE, tags=("reshape", "transpose"))
def transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose (Spark 4): rows become columns with the
    first column supplying the new column names — the metrics-as-rows
    report shape. Only sensible on SMALL aggregates (the transposed
    frame's width is the input's row count, and values must share one
    type — both metrics cast to double here); the oracle spells the
    same reshape as conditional aggregation, which IS the scalable
    form when the column set is known."""
    from pypiper_spark.compare import dsum

    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )
    return m.transpose()


_PARAM_SQL = """
  SELECT o_orderstatus,
         year(o_orderdate) AS order_year,
         count(*) AS n_orders,
         (CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100)
           AS total_price
  FROM {src}
  WHERE o_totalprice >= {floor}
  GROUP BY ALL
  ORDER BY ALL
"""


@register(
    "q_sql_parameterized",
    oracle=_PARAM_SQL.format(src="orders", floor="200000.0"),
    tags=("sql", "parameterized"),
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-argument binding) + GROUP BY
    ALL / ORDER BY ALL: the literal-injection-free way to ship user
    parameters into SQL text — the binder substitutes typed values
    AFTER parsing, so `:floor` can never splice syntax. The oracle
    runs the same dialect-neutral text with the parameter inlined
    (DuckDB supports GROUP/ORDER BY ALL natively)."""
    from pypiper_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        _PARAM_SQL.format(src="orders", floor=":floor"), args={"floor": 200000.0}
    )
