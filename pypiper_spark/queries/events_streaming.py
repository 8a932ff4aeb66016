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


# --------------------------------------------------------------------------
# Watermark / late-data accounting (SURVEY.md 2B streaming row):
# a deterministic batch reconstruction of Structured Streaming's
# watermark drop rule, exact-oracled in DuckDB; streaming/twins.py
# replays the same 4-batch arrival schedule through readStream and
# tests/test_streaming.py asserts the emitted windows match.
# --------------------------------------------------------------------------

# Replay model: events ARRIVE delayed by a deterministic pseudo-random
# jitter (0..24h — Knuth multiplicative hash on event_id, plain int64
# arithmetic so DuckDB computes the identical value; no engine hash
# functions involved), and the stream is consumed as N_BATCHES
# micro-batches cut by equal ARRIVAL-time ranges. Structured
# Streaming's ACTUAL drop rule, reconstructed and verified against a
# real streaming run (tests/test_streaming.py::test_late_accounting_twin):
#   wm_k = max(event time seen in batches < k) - DELAY  (batch 0: none)
#   window W is EVICTED (and, in append mode, emitted) at the end of
#     the first batch j with W.end <= wm_j;
#   a row in batch k is DROPPED iff its window was evicted in an
#     EARLIER batch — i.e. iff W.end <= wm_(k-1).
# The lag is the part people get wrong: a row whose window end is
# already below the CURRENT batch's watermark still joins the live
# state and is counted, because eviction only ran at the END of the
# previous batch with the previous watermark (Spark's documented
# guarantee is one-sided for exactly this reason: within-threshold
# data is always counted, beyond-threshold data is dropped best-
# effort). Measured here: the progress log's per-batch watermarks
# match wm_k to the millisecond and the emitted counts match this
# rule row-for-row.
# Tuning: a row is only DROPPED when it arrives after its window was
# evicted, i.e. its jitter exceeds roughly one batch span (the
# watermark lags a batch — see the drop rule above). 10 batches over
# the ~31-day corpus give a ~3-day span; 0..5-day jitter then yields
# 3.6% / 4.7% / 5.2% late rows at sf0.001/0.01/0.1 — realistic rates,
# non-vacuous at every shipped scale factor (measured; 4 batches x
# 24h jitter produced ZERO drops for exactly this reason).
_LATE_DELAY = "10 minutes"
_LATE_N_BATCHES = 10
_LATE_JITTER_SEC = "((event_id % 100000) * 2654435761) % 432000"


def _late_batched(ev):
    """events + (arrival batch, per-batch watermark) columns.

    Scale shape: two 1-row/4-row aggregates ride broadcasts (bounded
    by construction — N_BATCHES is a constant); the only full-data
    shuffles are the per-batch max (map-side partial to 4 rows) and
    the final hour aggregate. The 4-row unpartitioned window for the
    running max is bounded the same way."""
    e = ev.select(
        "ts",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.expr(_LATE_JITTER_SEC).cast("long") * F.lit(1_000_000)
        ).alias("arr_us"),
    )
    mm = e.agg(F.min("arr_us").alias("mn"), F.max("arr_us").alias("mx"))
    eb = e.crossJoin(F.broadcast(mm)).select(
        "ts",
        F.least(
            F.lit(_LATE_N_BATCHES - 1),
            F.floor(
                F.lit(float(_LATE_N_BATCHES))
                * (F.col("arr_us") - F.col("mn"))
                / (F.col("mx") - F.col("mn") + 1)
            ).cast("int"),
        ).alias("batch"),
    )
    bm = eb.groupBy("batch").agg(F.max("ts").alias("bmax"))
    # wm = the watermark that governs DROPS in batch k: the previous
    # batch's planning watermark (see the drop-rule note above), i.e.
    # max event time over batches <= k-2, minus the delay
    w = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, -2)
    wm = bm.select(
        "batch",
        (F.max("bmax").over(w) - F.expr(f"INTERVAL {_LATE_DELAY}")).alias("wm"),
    )
    return eb.join(F.broadcast(wm), "batch")


_LATE_ORACLE = f"""
  WITH e AS (
    SELECT ts,
           epoch_us(ts) + ({_LATE_JITTER_SEC}) * 1000000 AS arr_us
    FROM events
  ), mm AS (
    SELECT min(arr_us) AS mn, max(arr_us) AS mx FROM e
  ), eb AS (
    SELECT e.ts,
           least({_LATE_N_BATCHES - 1},
                 CAST(floor({_LATE_N_BATCHES}.0 * (arr_us - mn) / (mx - mn + 1))
                      AS INT)) AS batch
    FROM e, mm
  ), bm AS (
    SELECT batch, max(ts) AS bmax FROM eb GROUP BY batch
  ), wm AS (
    SELECT batch,
           max(bmax) OVER (ORDER BY batch
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
             - INTERVAL 10 MINUTE AS wm
    FROM bm
  ), j AS (
    SELECT eb.ts,
           (wm.wm IS NOT NULL
            AND date_trunc('hour', eb.ts) + INTERVAL 1 HOUR <= wm.wm) AS is_late
    FROM eb JOIN wm ON eb.batch = wm.batch
  )
  SELECT date_trunc('hour', ts) AS window_start,
         CAST(count(*) FILTER (WHERE NOT is_late) AS BIGINT) AS n_on_time,
         CAST(count(*) FILTER (WHERE is_late) AS BIGINT) AS n_late
  FROM j GROUP BY 1
"""


@register(
    "q_stream_late_accounting",
    oracle=_LATE_ORACLE,
    tags=("streaming", "watermark", "late-data"),
)
def stream_late_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data accounting: per 1-hour window, how many
    events a 10-minute-watermark streaming job accepts vs drops under
    a deterministic 10-micro-batch replay of the stream (arrival =
    event time + 0..5d deterministic jitter).

    This is the batch reconstruction of the exact drop rule
    Structured Streaming applies (window end vs the PREVIOUS batch's
    planning watermark — eviction lags one batch; see the module
    note); the streaming twin in
    streaming/twins.py::run_late_accounting_stream replays the same
    schedule through readStream+withWatermark and the test asserts
    the emitted windows carry exactly n_on_time counts. Non-vacuous
    at every shipped sf: 3.6-5.2% of rows drop as late (measured)."""
    ev = load_table(spark, sf_dir, "events")
    j = _late_batched(ev)
    win_end = F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 1 HOUR")
    is_late = F.col("wm").isNotNull() & (win_end <= F.col("wm"))
    return (
        j.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"))
        .agg(
            F.count_if(~is_late).alias("n_on_time"),
            F.count_if(is_late).alias("n_late"),
        )
    )


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


# ---------------------------------------------------------------------------
# REAL readStream queries in the registry (round 5, VERDICT item 10):
# the two twins below were previously only test-exercised; registering
# them makes the actual Structured Streaming execution path
# driver-visible, with EXACT oracles (their outputs are deterministic
# batch-equivalent aggregates — integer counts and a 4dp-rounded sum
# whose float error, ~200 doubles per user, sits ~8 orders of magnitude
# below the rounding unit).
# ---------------------------------------------------------------------------


@register(
    "q_stream_stateful_counter",
    oracle="""
      SELECT user_id,
             count(*) AS n_events,
             round(sum(value), 4) AS total_value
      FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful", "real-stream"),
)
def stream_stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator, run FOR REAL: per-user
    running counters via applyInPandasWithState (keyed state store,
    Arrow batches to Python — the reference's Node-instance-state
    analog). The streaming run happens inside the query
    (availableNow trigger, memory sink); the emitted final counter per
    user must equal the plain batch aggregate, which is what the
    oracle states. Scale shape: state is partitioned by user_id (the
    group key), so state-store size is per-key-bounded and the
    operator scales with keys, not events.

    Throughput caveat (measured, BENCH.md): the state transition runs
    in PYTHON — every event crosses Arrow into pandas and back, ~2
    microseconds/event, which binds this operator at true 100 TB event
    volume regardless of partitioning. The production path is
    JVM-resident state: transformWithState (gated behind
    ``pypiper_spark.streaming.twins.tws_available()`` in this
    container — protobuf missing; see the skipped test in
    tests/test_streaming.py) or, when the state machine is expressible
    as an aggregate, a streaming-native windowed agg like
    q_stream_tumbling_real. This registration exists to cover the
    Python-state API surface exactly, not as the volume path."""
    from pypiper_spark.streaming.twins import run_stateful_counter

    out = run_stateful_counter(spark, sf_dir)
    return out.select(
        "user_id", "n_events", F.round("total_value", 4).alias("total_value")
    )


@register(
    "q_stream_static_enrich",
    oracle="""
      WITH profile AS (
        SELECT user_id,
               sum(CAST(round(value * 100) AS BIGINT)) AS spend_cents
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
      ),
      tiers AS (
        SELECT user_id,
               CASE WHEN spend_cents >= 100000 THEN 'big'
                    WHEN spend_cents >= 20000 THEN 'mid'
                    ELSE 'small' END AS tier
        FROM profile
      )
      SELECT coalesce(t.tier, 'none') AS tier,
             e.event_type,
             count(*) AS n_events
      FROM events e LEFT JOIN tiers t USING (user_id)
      GROUP BY 1, 2
    """,
    tags=("streaming", "join", "real-stream"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join, run FOR REAL: every streaming
    event looks up a static per-user tier profile (integer-cents spend
    buckets). Stream-static joins keep no join state — the static side
    re-reads per micro-batch — so the pattern needs no watermark and
    is the zero-risk first streaming join at any scale. Exact oracle:
    the identical profile + left join + group count in batch SQL."""
    from pypiper_spark.streaming.twins import run_stream_static_enrich

    return run_stream_static_enrich(spark, sf_dir)


@register(
    "q_stream_stream_join",
    oracle="""
      SELECT s.event_id AS signup_id, e.event_id AS error_id, s.user_id
      FROM events s JOIN events e
        ON s.event_type = 'signup' AND e.event_type = 'error'
       AND s.user_id = e.user_id
       AND e.ts BETWEEN s.ts AND s.ts + INTERVAL 1 HOUR
    """,
    tags=("streaming", "join", "real-stream"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join, run FOR REAL (the
    streaming twin of q_join_interval, registered round 5): errors
    within 1h after a signup, both sides watermarked so join state is
    evictable — the only way a stream-stream join survives unbounded
    input. Exact oracle: the identical interval join in batch SQL
    (availableNow over a finite file means no row is ever dropped as
    late, so streaming output == batch join exactly)."""
    from pypiper_spark.streaming.twins import run_stream_stream_join

    return run_stream_stream_join(spark, sf_dir).select(
        "signup_id", "error_id", "user_id"
    )


@register(
    "q_stream_tumbling_real",
    oracle=f"""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
             event_type,
             count(*) AS n_events,
             {sql_dsum('value')} AS total_value
      FROM events
      GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window", "real-stream"),
)
def stream_tumbling_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical Structured Streaming aggregation, run FOR REAL:
    the same 1-hour tumbling (window, event_type) count/sum as
    q_stream_tumbling, executed as readStream -> groupBy(window) ->
    memory sink (availableNow trigger, complete mode). Over a finite
    source in complete mode the finalized sink table equals the batch
    aggregate bit-for-bit (dsum is exact integer cents), which is what
    the oracle states; the watermarked APPEND path with genuine
    late-data drops is priced separately by q_stream_late_accounting.
    Scale shape: windowed-agg state is per-(window, type)-bounded and
    the source is replayable files — the standard production topology.
    Registered so the driver contract covers the real micro-batch
    window-agg path, not only its batch twin (which the twin tests in
    tests/test_streaming.py already assert equal)."""
    from pypiper_spark.streaming.twins import run_streaming_twin

    return run_streaming_twin(spark, sf_dir, tumbling_transform)


@register(
    "q_stream_sliding_real",
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
    tags=("streaming", "window", "real-stream"),
)
def stream_sliding_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window streaming aggregation, run FOR REAL: the
    1h/15min sliding count/sum under readStream -> memory sink
    (availableNow, complete mode). Distinct from q_stream_tumbling_real
    in the state shape it prices: every event updates FOUR window
    states, so the streaming state store carries 4x the window rows —
    the overlap multiplier a capacity plan must budget for. Exact
    oracle: same unnest-expansion SQL as the batch twin (finite source
    + complete mode => sink equals the batch aggregate exactly,
    integer-cents sums)."""
    from pypiper_spark.streaming.twins import run_streaming_twin

    return run_streaming_twin(spark, sf_dir, sliding_transform)


@register(
    "q_stream_dedup_real",
    oracle="""
      SELECT DISTINCT user_id, event_type FROM events
    """,
    tags=("streaming", "dedup", "real-stream"),
)
def stream_dedup_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup, run FOR REAL (the sixth real readStream
    registration, r6): readStream -> dropDuplicates on
    (user_id, event_type) -> append-mode memory sink. This prices the
    state-store-backed dedup path itself: every key ever seen is held
    in the state store and each arriving event probes it; append mode
    emits a key exactly once, on first arrival.

    Determinism rule that shapes the query: the projection is KEY
    COLUMNS ONLY. dropDuplicates keeps the first-ARRIVING row per
    key, and arrival order across file-source partitions is not
    deterministic — so any non-key column (ts, value) in the output
    would make the kept representative a race. Keys-only output makes
    streaming-dedup output == batch DISTINCT exactly, which is what
    the oracle states. (The batch twin q_stream_dedup keeps full rows
    deterministically by electing min-(ts, event_id) per key — the
    two queries price the two honest variants of the same operator.)

    Scale shape: state grows with DISTINCT KEYS, not events — the
    unbounded-input caveat is key cardinality. Production bounds it
    with dropDuplicatesWithinWatermark (evicts keys once the
    watermark passes; only-once semantics then hold within the
    watermark horizon, not forever) — not used here because key
    re-emission after eviction depends on how the file source slices
    micro-batches, which would make the result replay-dependent;
    state-bounded-by-time belongs to q_stream_late_accounting's
    territory."""
    from pypiper_spark.streaming.twins import run_streaming_twin

    return run_streaming_twin(
        spark,
        sf_dir,
        lambda ev: ev.select("user_id", "event_type").dropDuplicates(
            ["user_id", "event_type"]
        ),
        output_mode="append",
    )


@register(
    "q_stream_foreachbatch_merge",
    oracle="""
      SELECT user_id, event_type,
             count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY user_id, event_type
    """,
    tags=("streaming", "sink", "real-stream"),
)
def stream_foreachbatch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch MERGE SINK, run FOR REAL (the seventh real-stream
    registration, r6): the six registrations above all exercise
    sources/state through a memory sink; this one prices the
    production SINK side — per micro-batch, foreachBatch folds the
    batch's partial aggregate into a persistent parquet state table
    (read state, union, re-aggregate, write a NEW version, repoint),
    the idempotent write-then-swap move that survives micro-batch
    retries. Events replay as 4 deterministic hash-split micro-batches
    (maxFilesPerTrigger=1); per-key counts and integer cents are
    ASSOCIATIVE, so the final state table equals the one-shot batch
    aggregate regardless of batch slicing — the exact oracle. At
    scale the full-state rewrite per batch gives way to a partitioned
    MERGE (the q_upsert_merge shape keyed on the group key); the
    version-swap contract is the part that carries over unchanged."""
    from pypiper_spark.streaming.twins import run_foreachbatch_merge_sink

    return run_foreachbatch_merge_sink(spark, sf_dir)
