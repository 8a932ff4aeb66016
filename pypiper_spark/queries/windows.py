"""Window function operators (SURVEY.md section 2B: windows).

Window determinism rules (section 5.3): every ROW-frame or row_number
window orders by a TOTAL key (unique tiebreaker included); rank-style
functions that must exercise tie semantics order by the value alone —
their outputs are tie-stable. RANGE frames include all peers, so ties
are harmless there.

Scale: each window is one shuffle on its partition key. None of these
use a global (unpartitioned) window except where explicitly noted.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pypiper_spark.catalog import load_table
from pypiper_spark.compare import cents
from pypiper_spark.registry import register


@register(
    "q_win_rank",
    oracle="""
      SELECT * FROM (
        SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
               row_number() OVER w_total AS rn,
               rank()       OVER w_value AS rnk,
               dense_rank() OVER w_value AS drnk,
               ntile(4)     OVER w_total AS quartile
        FROM lineitem
        WINDOW
          w_total AS (PARTITION BY l_returnflag
                      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber),
          w_value AS (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC)
      ) WHERE rn <= 100
    """,
    tags=("window",),
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/ntile; rank windows order by value
    only (tie-stable), row_number/ntile by a total key."""
    li = load_table(spark, sf_dir, "lineitem")
    w_total = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    w_value = Window.partitionBy("l_returnflag").orderBy(F.desc("l_extendedprice"))
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_extendedprice",
            F.row_number().over(w_total).alias("rn"),
            F.rank().over(w_value).alias("rnk"),
            F.dense_rank().over(w_value).alias("drnk"),
            F.ntile(4).over(w_total).alias("quartile"),
        )
        .filter(F.col("rn") <= 100)
    )


@register(
    "q_win_analytic",
    oracle="""
      SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
             lag(o_totalprice)  OVER w AS prev_price,
             lead(o_totalprice) OVER w AS next_price,
             first_value(o_orderdate) OVER w AS first_order,
             last_value(o_orderdate)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_order
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window pack: lag/lead/first_value/last_value over per-customer order history."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderdate").over(w).alias("first_order"),
        F.last("o_orderdate").over(w_full).alias("last_order"),
    )


@register(
    "q_win_frame_rows",
    oracle="""
      SELECT o_orderkey, o_custkey, o_orderdate,
             (CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              / 100) AS running_spend,
             count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_orders
      FROM orders
    """,
    tags=("window",),
)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals (the reference's stateful-counter-node analog,
    SURVEY.md 2A state row). Decimal sum keeps the prefix sums exact."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.sum(cents("o_totalprice")).over(w).cast("double") / 100).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("running_orders"),
    )


@register(
    "q_win_frame_range",
    oracle="""
      SELECT event_id, user_id, ts,
             (CAST(sum(CAST(round(value * 100) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 2 HOURS PRECEDING AND CURRENT ROW)
                   AS DOUBLE) / 100) AS rolling_value_2h,
             count(*) OVER (PARTITION BY user_id ORDER BY ts
                            RANGE BETWEEN INTERVAL 2 HOURS PRECEDING AND CURRENT ROW)
               AS rolling_events_2h
      FROM events
    """,
    tags=("window", "range"),
)
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE frame: 2-hour rolling sum per user. Spark range
    frames need a numeric order key -> epoch microseconds; bounds are
    inclusive on both engines. Peers (equal ts) are all included, so
    no tiebreaker is needed."""
    ev = load_table(spark, sf_dir, "events")
    two_hours_us = 2 * 3600 * 1_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-two_hours_us, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.sum(cents("value")).over(w).cast("double") / 100).alias("rolling_value_2h"),
        F.count(F.lit(1)).over(w).alias("rolling_events_2h"),
    )


@register(
    "q_win_topk_per_group",
    oracle="""
      SELECT c_custkey, o_orderkey, o_totalprice, order_rank FROM (
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY c.c_custkey
                                  ORDER BY o.o_totalprice DESC, o.o_orderkey) AS order_rank
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      ) WHERE order_rank <= 3
    """,
    tags=("window", "topk"),
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the scalable per-group top-k (window
    rank + filter pushes the limit into each partition — no global sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("order_rank", F.row_number().over(w))
        .filter(F.col("order_rank") <= 3)
    )
