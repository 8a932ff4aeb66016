"""Streaming-shaped operators, batch-mode on `events` (SURVEY.md 2B).

Each transformation here is written once and reused by the real
Structured Streaming runner (pypiper_spark/streaming/twins.py):
batch answers feed the DuckDB oracle; the streaming twin is asserted
equal to the batch answer in tests. `window`/`session_window` are the
same functions in both execution modes — that is the point.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pypiper_spark.catalog import load_table
from pypiper_spark.compare import dsum, sql_dsum
from pypiper_spark.registry import register


def tumbling_transform(ev: DataFrame) -> DataFrame:
    """1-hour tumbling windows: count + exact sum per (window, type)."""
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_stream_tumbling",
    oracle=f"""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
             event_type,
             count(*) AS n_events,
             {sql_dsum('value')} AS total_value
      FROM events
      GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window"),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts/sums; the same transform runs under readStream in streaming/twins.py."""
    return tumbling_transform(load_table(spark, sf_dir, "events"))


def sliding_transform(ev: DataFrame) -> DataFrame:
    """1-hour windows sliding every 15 min (each event in 4 windows)."""
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_stream_sliding",
    oracle=f"""
      WITH slid AS (
        SELECT time_bucket(INTERVAL '15 minutes', ts)
                 - k.k * INTERVAL '15 minutes' AS window_start,
               value
        FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) k
      )
      SELECT window_start,
             window_start + INTERVAL '1 hour' AS window_end,
             count(*) AS n_events,
             {sql_dsum('value')} AS total_value
      FROM slid
      GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 min: each event lands in 4 overlapping windows."""
    return sliding_transform(load_table(spark, sf_dir, "events"))


def session_transform(ev: DataFrame) -> DataFrame:
    """Session windows per user, 30-minute inactivity gap."""
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_stream_session",
    oracle=f"""
      WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
      ), islands AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM marked
      )
      SELECT user_id,
             min(ts) AS session_start,
             max(ts) + INTERVAL '30 minutes' AS session_end,
             count(*) AS n_events,
             {sql_dsum('value')} AS total_value
      FROM islands
      GROUP BY user_id, session_id
    """,
    tags=("streaming", "window", "session"),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window merges events whose gap is < 30 min (strict);
    the oracle's gaps-and-islands twin uses >= for its new-session
    test accordingly. Session end = last event + gap."""
    return session_transform(load_table(spark, sf_dir, "events"))


def dedup_transform(ev: DataFrame) -> DataFrame:
    """Keep-first-by-time dedup on (user_id, event_type).

    Batch form of streaming dropDuplicates: deterministic survivor via
    row_number (SURVEY.md 5.3), one shuffle on the dedup key."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@register(
    "q_stream_dedup",
    oracle="""
      SELECT user_id, event_type, event_id, ts, value FROM (
        SELECT user_id, event_type, event_id, ts, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn = 1
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first-by-timestamp dedup per (user_id, event_type); streaming twin uses dropDuplicates."""
    return dedup_transform(load_table(spark, sf_dir, "events"))


_SESSIONIZE_ORACLE = """
  WITH marked AS (
    SELECT user_id, event_id, ts, event_type,
           CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END
             AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  )
  SELECT user_id, event_id, event_type,
         CAST(sum(new_session) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT)
           AS session_no
  FROM marked
"""


@register("q_sessionize", oracle=_SESSIONIZE_ORACLE, tags=("events", "session", "window"))
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT session assignment (gaps-and-islands): lag the
    timestamp per user, mark gaps > 30 min as session starts, running-
    sum the marks into session numbers. q_stream_session aggregates
    sessions; this keeps every event row with its session id — the
    form downstream per-session feature extraction joins against.
    Two window passes over ONE per-user sort (same partition key and
    ordering => one shuffle, one sort, both windows pipelined)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("ts").over(w).alias("prev_ts"),
    ).select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            F.expr("ts - prev_ts <= INTERVAL 30 MINUTES"), 0
        ).otherwise(1).alias("new_session"),
    )
    return marked.select(
        "user_id",
        "event_id",
        "event_type",
        F.sum("new_session").over(w).alias("session_no"),
    )
