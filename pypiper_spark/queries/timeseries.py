"""Time-series operators over the events table: calendar gap-fill
with forward-fill, and OHLC-style resampling.

The reference's stateful-node idiom (a node carrying last-seen state
across `run()` calls) is exactly what forward-fill is; here it is
expressed as a window `last(ignorenulls)` so Spark distributes it by
key and time-sorts within the partition — no driver-side state, no
Python in the loop.

Plan shape at scale (verified in tests/test_plans.py): the resample
is a single shuffle of map-side-combined group state. The gapfill
reads events twice — once wide for the daily aggregate, once pruned
to (user_id, ts) for the calendar span — a deliberate choice over
caching the daily aggregate: at 100 TB a pruned columnar rescan is
cheaper and safer than persisting an intermediate, and the generated
calendar rows are produced AFTER the per-user aggregate, so the
explode multiplies dim-sized data (users x days), never raw events.
The join back is an equi hash join on (user_id, day), and the
forward-fill window rides the same user_id hash partitioning.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pypiper_spark.catalog import load_table
from pypiper_spark.registry import register


@register(
    "q_timeseries_gapfill",
    oracle="""
      WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
                 AS day_value
        FROM events GROUP BY 1, 2
      ),
      spans AS (
        SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
      ),
      calendar AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        FROM spans
      )
      SELECT c.user_id, c.day,
             coalesce(d.n_events, 0) AS n_events,
             last_value(d.day_value IGNORE NULLS)
               OVER (PARTITION BY c.user_id ORDER BY c.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled_value
      FROM calendar c LEFT JOIN daily d
        ON d.user_id = c.user_id AND d.day = c.day
    """,
    tags=("timeseries", "gapfill", "window"),
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: one row per user per day between that user's
    first and last event, zero-filled counts, forward-filled daily
    value. The day sum is exact cents (order-independent), so the
    forward-filled value is bit-stable too."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100).alias(
            "day_value"
        ),
    )
    # Rename the join side: calendar derives FROM daily, so shared
    # column names would be ambiguous lineage-wise after the join.
    d = daily.withColumnsRenamed({"user_id": "d_user", "day": "d_day"})
    calendar = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        calendar.join(
            d,
            (F.col("d_user") == F.col("user_id")) & (F.col("d_day") == F.col("day")),
            "left",
        )
        .select(
            "user_id",
            "day",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.last(F.col("day_value"), ignorenulls=True).over(w).alias("filled_value"),
        )
    )


@register(
    "q_timeseries_resample",
    oracle="""
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             arg_min(value, ts) AS open,
             arg_max(value, ts) AS close,
             min(value) AS low,
             max(value) AS high,
             count(*) AS n
      FROM events
      GROUP BY 1, 2
    """,
    tags=("timeseries", "resample"),
)
def timeseries_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample to daily OHLC bars per user: first/last value by
    time plus min/max via min_by/max_by. (user_id, ts) is verified
    unique at every scale factor — even after Spark's ns->us read
    truncation — so ordering by ts alone is deterministic; where ties
    were possible the ordering key would need an id tiebreak (Spark
    min_by takes a struct key; DuckDB 1.0 arg_min does not, which is
    why the simple key is used on both sides). One shuffle, all
    map-side-combinable aggregates."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.min_by("value", F.col("ts")).alias("open"),
        F.max_by("value", F.col("ts")).alias("close"),
        F.min("value").alias("low"),
        F.max("value").alias("high"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_timeseries_rollup_cascade",
    oracle="""
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
               AS day_value,
             count(DISTINCT CAST(date_trunc('hour', ts) AS TIMESTAMP))
               AS active_hours
      FROM events
      GROUP BY 1, 2
    """,
    tags=("timeseries", "rollup"),
)
def timeseries_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascade rollup: the DAILY aggregate is derived
    from the HOURLY pre-aggregate, never from raw events — at 100 TB
    the hourly layer is what a continuous aggregate materializes, and
    every coarser resolution re-aggregates ~1/3600th of the raw rows.
    Exactness holds because the cents sums and counts are associative;
    the oracle computes the same daily answer straight from raw events,
    proving the cascade loses nothing. Both shuffles hash on user_id
    (+ time bucket), and active_hours falls out of the cascade for
    free (count of hourly rows) where a raw-scan plan needs a
    count-distinct expand."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    return hourly.groupBy(
        "user_id", F.date_trunc("day", F.col("hour")).alias("day")
    ).agg(
        F.sum("n_events").alias("n_events"),
        (F.sum("cents").cast("double") / 100).alias("day_value"),
        F.count(F.lit(1)).alias("active_hours"),
    )


@register(
    "q_events_retention",
    oracle="""
      WITH ue AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events
      ),
      cohort AS (
        SELECT user_id, min(day) AS cohort_day FROM ue GROUP BY user_id
      )
      SELECT c.cohort_day,
             CAST(floor(date_diff('day', c.cohort_day, ue.day) / 7) AS BIGINT)
               AS week_offset,
             count(DISTINCT ue.user_id) AS active_users
      FROM ue JOIN cohort c ON ue.user_id = c.user_id
      GROUP BY 1, 2
    """,
    tags=("timeseries", "retention", "cohort"),
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-active day,
    counted distinct per week offset from that cohort day.

    The classic product-analytics shape the reference's stateful-node
    users build by hand (first-touch state + per-window counts).
    Scale shape: events are pre-collapsed to DISTINCT (user, day)
    FIRST (users x active-days rows, orders of magnitude below raw
    events at 100 TB), then the cohort day is a per-user window MIN —
    one user_id shuffle, no self-join and no second pass over the
    collapsed set (the aggregate-then-join form costs an extra
    exchange and a join for the same answer). The final agg is the
    only other shuffle; datediff runs on DATE-cast day-truncated
    stamps so both engines count calendar boundaries identically."""
    ue = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
    )
    cohort_day = F.min("day").over(Window.partitionBy("user_id"))
    return (
        ue.withColumn("cohort_day", cohort_day)
        .groupBy(
            "cohort_day",
            F.floor(
                F.datediff(F.col("day").cast("date"), F.col("cohort_day").cast("date"))
                / 7
            ).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@register(
    "q_rolling_active_users",
    oracle="""
      WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events
      ),
      contrib AS (
        SELECT user_id, day + to_days(CAST(o.o AS INTEGER)) AS window_day
        FROM ud, UNNEST(range(0, 7)) AS o(o)
      ),
      bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud)
      SELECT window_day, count(DISTINCT user_id) AS active_7d
      FROM contrib, bounds
      WHERE window_day BETWEEN bounds.d0 AND bounds.d1
      GROUP BY window_day
    """,
    tags=("timeseries", "rolling", "distinct"),
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (the WAU curve) —
    the canonical hard case of COUNT(DISTINCT) over a sliding window,
    which no window frame can express (distinct state does not merge
    by subtraction).

    Scale design — CONTRIBUTION EXPLODE, not self-join: each distinct
    (user, day) activity row is exploded to the <= 7 window-days it
    contributes to (a fixed 7x map-side multiply of the
    user-day-collapsed stream, NOT of raw events), then one
    count_distinct per window-day. The alternatives both fail at
    100 TB: a calendar x events range self-join re-scans the event
    table per day, and a driver-side loop over days is not a plan at
    all. Days outside the observed [min, max] span are clipped so
    both engines see identical partial windows at the edges."""
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
    )
    bounds = ud.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    contrib = ud.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
    ).select(
        "user_id",
        (F.col("day") + F.make_dt_interval(days=F.col("o"))).alias("window_day"),
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))  # 1-row aggregate: bounded
        .filter(F.col("window_day").between(F.col("d0"), F.col("d1")))
        .groupBy("window_day")
        .agg(F.count_distinct("user_id").alias("active_7d"))
    )


@register(
    "q_conversion_latency",
    oracle="""
      WITH s AS (
        SELECT user_id, min(ts) AS s_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
      ),
      lat AS (
        SELECT s.user_id,
               CAST(date_diff('second', s.s_ts, min(e.ts)) AS BIGINT)
                 AS latency_sec
        FROM s JOIN events e
          ON e.user_id = s.user_id
         AND e.event_type = 'purchase' AND e.ts > s.s_ts
        GROUP BY s.user_id, s.s_ts
      )
      SELECT count(*) AS n_converted,
             min(latency_sec) AS min_sec,
             max(latency_sec) AS max_sec,
             round(quantile_cont(latency_sec, 0.5), 6) AS p50_sec,
             round(quantile_cont(latency_sec, 0.9), 6) AS p90_sec
      FROM lat
    """,
    tags=("timeseries", "funnel", "percentile"),
)
def conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-to-first-purchase latency distribution (time-to-convert
    percentiles) — the follow-on to q_events_funnel: not whether
    users convert, but how fast.

    Scale shape: both sides collapse to user-cardinality BEFORE the
    join (first signup per user via one aggregate; purchases join
    against that and min-aggregate), so the join is user x user on
    the shared user_id partitioning, never event x event. Exact
    percentiles run on integer seconds; Spark's percentile() and
    DuckDB's quantile_cont use the same linear interpolation on the
    same longs, rounded to 6 before comparison. Exact percentile
    is a sort-based aggregate — fine per-group or on collapsed
    user-cardinality data like this; on raw 100 TB streams use
    approx_percentile (q_agg_approx_percentile is the rows-only
    demonstration of that path)."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    lat = (
        p.join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id", "s_ts")
        .agg(F.min("ts").alias("p_ts"))
        .select(
            (
                F.unix_timestamp("p_ts") - F.unix_timestamp("s_ts")
            ).alias("latency_sec")
        )
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("latency_sec").alias("min_sec"),
        F.max("latency_sec").alias("max_sec"),
        F.round(F.percentile("latency_sec", F.lit(0.5)), 6).alias("p50_sec"),
        F.round(F.percentile("latency_sec", F.lit(0.9)), 6).alias("p90_sec"),
    )


_ANOMALY_ORACLE = """
  WITH daily AS (
    SELECT event_type, CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
           count(*) AS n
    FROM events GROUP BY event_type, day
  ),
  scored AS (
    SELECT event_type, day, n,
           avg(n)         OVER trail AS mu,
           stddev_samp(n) OVER trail AS sd,
           count(*)       OVER trail AS n_trail
    FROM daily
    WINDOW trail AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
  )
  SELECT event_type, day, n,
         round((n - mu) / sd, 6) AS z,
         abs((n - mu) / sd) > 2.0 AS is_anomaly
  FROM scored
  WHERE n_trail >= 4 AND sd > 0
"""


@register("q_events_anomaly", oracle=_ANOMALY_ORACLE, tags=("timeseries", "window"))
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing z-score anomaly detection on daily event volumes: each
    (event_type, day) count scored against the mean/stddev of its OWN
    previous <=7 days (rows frame ending at 1 PRECEDING — today never
    contaminates its baseline), flagged when |z| > 2. The shape every
    volume-drop / spike monitor reduces to.

    Scale shape: events collapse to (type, day) counts first — one
    map-side-combined shuffle; the window then runs over
    days-x-types rows (tiny at any corpus size), partitioned by
    event_type so there is no global-order pinch. Warmup guard
    (n_trail >= 4) keeps unstable early baselines out; sd > 0 keeps
    the division total. z rounds at 6dp over a <=7-value float
    reduction (error floor ~1e-13)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").cast("string").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    trail = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    )
    scored = daily.select(
        "event_type",
        "day",
        "n",
        F.avg("n").over(trail).alias("mu"),
        F.stddev_samp("n").over(trail).alias("sd"),
        F.count(F.lit(1)).over(trail).alias("n_trail"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return scored.filter((F.col("n_trail") >= 4) & (F.col("sd") > 0)).select(
        "event_type",
        "day",
        "n",
        F.round(z, 6).alias("z"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


_GROWTH_ORACLE = f"""
  WITH monthly AS (
    SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rc,
           count(*) AS n_orders
    FROM orders GROUP BY month
  )
  SELECT month,
         (CAST(rc AS DOUBLE) / 100) AS revenue,
         n_orders,
         round((CAST(rc AS DOUBLE) - CAST(lag(rc) OVER w AS DOUBLE))
               / CAST(lag(rc) OVER w AS DOUBLE) * 100, 6) AS growth_pct
  FROM monthly
  WINDOW w AS (ORDER BY month)
"""


@register("q_monthly_growth", oracle=_GROWTH_ORACLE, tags=("timeseries", "window"))
def monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly order totals in exact
    integer cents, growth as the lag-ratio of two exact longs (so the
    percentage is bit-identical on both engines; first month NULL).

    Scale shape: the aggregate collapses orders to ~tens of monthly
    rows BEFORE the lag window, so the window's single-partition
    ordering — normally the unpartitioned-window pinch flagged in r4
    (q_skyline_orders) — operates on aggregate-cardinality data by
    construction, the one place a global window is the right plan."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rc"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month")
    prev = F.lag("rc").over(w)
    return monthly.select(
        "month",
        (F.col("rc").cast("double") / 100).alias("revenue"),
        "n_orders",
        F.round(
            (F.col("rc").cast("double") - prev.cast("double"))
            / prev.cast("double")
            * 100,
            6,
        ).alias("growth_pct"),
    )


_ATTRIBUTION_ORACLE = """
  WITH seq AS (
    SELECT event_id, user_id, ts, event_type,
           last_value(CASE WHEN event_type IN ('click', 'view')
                           THEN ts END IGNORE NULLS) OVER w AS mkt_ts,
           last_value(CASE WHEN event_type IN ('click', 'view')
                           THEN event_type END IGNORE NULLS) OVER w AS mkt_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
  ),
  attributed AS (
    SELECT CASE WHEN mkt_ts IS NOT NULL
                 AND ts - mkt_ts <= INTERVAL 7 DAY
                THEN mkt_type ELSE 'none' END AS channel
    FROM seq WHERE event_type = 'purchase'
  )
  SELECT channel, count(*) AS n_purchases
  FROM attributed GROUP BY channel
"""


@register("q_events_attribution", oracle=_ATTRIBUTION_ORACLE, tags=("timeseries", "window"))
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credits the user's most
    recent marketing touch (click or view) STRICTLY before it and
    within a 7-day lookback; purchases with no qualifying touch fall
    into 'none'. The single-pass form of the first question every
    marketing pipeline answers.

    Scale shape: ONE user-partitioned window (no purchase x touches
    self-join — the join form rescans events per purchase and fans
    out on heavy users), frame ending at 1 PRECEDING so a purchase
    can never attribute to itself; ties on ts break by event_id in
    both engines. The two last_value(IGNORE NULLS) columns read the
    same underlying row by construction (same frame, same
    marketing-row predicate). Output is a tiny channel x count
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_mkt = F.col("event_type").isin("click", "view")
    seq = ev.select(
        "event_id",
        "ts",
        "event_type",
        F.last(F.when(is_mkt, F.col("ts")), ignorenulls=True).over(w).alias("mkt_ts"),
        F.last(F.when(is_mkt, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("mkt_type"),
    )
    attributed = seq.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("mkt_ts").isNotNull()
            & (F.col("ts") - F.col("mkt_ts") <= F.expr("INTERVAL 7 DAYS")),
            F.col("mkt_type"),
        )
        .otherwise("none")
        .alias("channel")
    )
    return attributed.groupBy("channel").agg(F.count(F.lit(1)).alias("n_purchases"))


_LTV_ORACLE = """
  WITH purchases AS (
    SELECT user_id,
           CAST(date_trunc('month', ts) AS DATE) AS month,
           CAST(round(value * 100) AS BIGINT) AS value_c
    FROM events WHERE event_type = 'purchase'
  ),
  cohorts AS (
    SELECT user_id, min(month) AS cohort_month FROM purchases GROUP BY user_id
  )
  SELECT CAST(c.cohort_month AS VARCHAR) AS cohort_month,
         date_diff('month', c.cohort_month, p.month) AS month_offset,
         count(DISTINCT p.user_id) AS n_buyers,
         (CAST(sum(p.value_c) AS DOUBLE) / 100) AS revenue
  FROM purchases p JOIN cohorts c USING (user_id)
  GROUP BY CAST(c.cohort_month AS VARCHAR), month_offset
"""


@register("q_cohort_ltv", oracle=_LTV_ORACLE, tags=("timeseries", "cohort"))
def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: users cohorted by first-purchase
    month, revenue and active-buyer counts by months-since-cohort —
    the revenue companion to q_events_retention (which counts
    activity; this follows the money).

    Scale shape: purchases collapse per user for the cohort label
    (one map-side-combined shuffle), join back user-keyed (both sides
    hash on user_id — AQE reuses the partitioning), then one
    aggregate at cohort x offset grain (tiny). Revenue in exact
    integer cents; month offsets are exact integer month diffs of
    month-truncated dates."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.date_trunc("month", "ts").cast("date").alias("month"),
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    cohorts = purchases.groupBy("user_id").agg(F.min("month").alias("cohort_month"))
    return (
        purchases.join(cohorts, "user_id")
        .groupBy(
            F.col("cohort_month").cast("string").alias("cohort_month"),
            F.months_between(F.col("month"), F.col("cohort_month"))
            .cast("long")
            .alias("month_offset"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_buyers"),
            (F.sum("value_c").cast("double") / 100).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q_attribution_linear: multi-touch linear attribution, integer-exact
# ---------------------------------------------------------------------------

_LINEAR_ATTR_ORACLE = """
  WITH seq AS (
    SELECT event_id, event_type, value,
           CAST(floor(epoch(ts)) AS BIGINT) AS s,
           user_id
    FROM events
  ), counted AS (
    SELECT event_id, event_type, value,
           count(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS n_clicks,
           count(CASE WHEN event_type = 'view' THEN 1 END) OVER w AS n_views
    FROM seq
    WINDOW w AS (PARTITION BY user_id ORDER BY s
                 RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING)
  ), credited AS (
    SELECT CAST(round(value * 100) AS BIGINT) AS cents,
           n_clicks, n_views, n_clicks + n_views AS n_tot
    FROM counted WHERE event_type = 'purchase' AND value > 0
  ), split AS (
    SELECT CASE WHEN n_tot = 0 THEN 0
                ELSE (cents * n_clicks) // n_tot END AS click_c,
           CASE WHEN n_tot = 0 THEN 0
                ELSE cents - (cents * n_clicks) // n_tot END AS view_c,
           CASE WHEN n_tot = 0 THEN cents ELSE 0 END AS none_c
    FROM credited
  )
  SELECT channel,
         count(*) AS n_purchases,
         (CAST(sum(credit) AS DOUBLE) / 100) AS revenue
  FROM (
    SELECT unnest(['click', 'view', 'none']) AS channel,
           unnest([click_c, view_c, none_c]) AS credit
    FROM split
  )
  WHERE credit > 0
  GROUP BY channel
"""


@register(
    "q_attribution_linear",
    oracle=_LINEAR_ATTR_ORACLE,
    tags=("timeseries", "attribution", "window"),
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution — the fairness-motivated
    companion to q_events_attribution's last-touch rule: every
    purchase splits its revenue equally across ALL marketing touches
    (clicks + views) in the 7-day lookback, with integer-cent
    exactness (click channel gets cents*n_clicks div n_total; view
    gets the exact remainder, so credit always sums to the purchase —
    no float leakage); purchases with no touch credit 'none' in full.

    Scale shape: NO purchase x touch join (the join form fans out on
    heavy users and re-shuffles events per purchase) — both channel
    counts ride ONE user-keyed window with an integer RANGE frame on
    epoch seconds ([-7d, -1s]: strictly-before at second grain, which
    both engines evaluate identically on the same BIGINT key). The
    per-purchase 3-way channel split is a map-side stack; the report
    aggregate is channel-cardinality."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_id",
        "event_type",
        "value",
        "user_id",
        F.unix_timestamp("ts").alias("s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s")
        .rangeBetween(-604800, -1)
    )
    counted = seq.select(
        "event_type",
        "value",
        F.count(F.when(F.col("event_type") == "click", 1)).over(w).alias("n_clicks"),
        F.count(F.when(F.col("event_type") == "view", 1)).over(w).alias("n_views"),
    )
    # value > 0 scopes refunds out: integer div truncates toward zero
    # in Spark but floors in DuckDB, so negative cents would split
    # credit differently per engine (the q_kanon_audit div hazard) and
    # leak through the credit > 0 filter; attribution of refunds is a
    # policy question, not a default
    credited = counted.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    ).select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "n_clicks",
        "n_views",
        (F.col("n_clicks") + F.col("n_views")).alias("n_tot"),
    )
    click_c = F.when(F.col("n_tot") == 0, 0).otherwise(
        F.expr("(cents * n_clicks) div n_tot")
    )
    split = credited.select(
        click_c.alias("click_c"),
        F.when(F.col("n_tot") == 0, 0)
        .otherwise(F.col("cents") - F.expr("(cents * n_clicks) div n_tot"))
        .alias("view_c"),
        F.when(F.col("n_tot") == 0, F.col("cents")).otherwise(0).alias("none_c"),
    )
    channels = split.selectExpr(
        "stack(3, 'click', click_c, 'view', view_c, 'none', none_c)"
        " as (channel, credit)"
    ).filter(F.col("credit") > 0)
    return channels.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        (F.sum("credit").cast("double") / 100).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q_concurrent_sessions: sweep-line interval concurrency
# ---------------------------------------------------------------------------

_CONCURRENCY_ORACLE = """
  WITH marked AS (
    SELECT user_id, ts,
           CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                THEN 0 ELSE 1 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ), sess AS (
    SELECT user_id, ts,
           sum(new_session) OVER w2 AS session_no
    FROM marked
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts)
  ), bounds AS (
    SELECT user_id, session_no,
           date_trunc('hour', min(ts)) AS start_h,
           date_trunc('hour', max(ts)) + INTERVAL 1 HOUR AS end_h
    FROM sess GROUP BY user_id, session_no
  ), deltas AS (
    SELECT h, CAST(sum(d) AS BIGINT) AS delta FROM (
      SELECT start_h AS h, 1 AS d FROM bounds
      UNION ALL
      SELECT end_h AS h, -1 AS d FROM bounds
    ) GROUP BY h
  )
  SELECT CAST(h AS VARCHAR) AS hour, delta,
         CAST(sum(delta) OVER (ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS active_sessions
  FROM deltas
"""


@register(
    "q_concurrent_sessions",
    oracle=_CONCURRENCY_ORACLE,
    tags=("timeseries", "interval", "sweep-line", "session"),
)
def concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval concurrency by sweep line — "how many sessions were
    active each hour": sessionize (the q_sessionize 30-min
    gaps-and-islands), collapse each session to [first-hour,
    last-hour+1) bounds, explode every interval to a +1 start / -1 end
    delta, aggregate deltas per hour, and running-sum the hour axis.
    The pattern that replaces the quadratic day x interval overlap
    join every naive concurrency query writes — intervals never join
    anything; they become two delta rows each.

    Scale shape: sessionization rides the user-keyed exchange; the
    delta aggregate collapses to HOUR grain (calendar-bounded, never
    data-scaled) before the only ordered window, so the final cumsum's
    SinglePartition sort is over ~corpus-hours rows — the same
    bounded-axis argument as q_skyline_orders' calendar collapse.
    Output at change grain (hours where the count moves)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    ).select(
        "user_id",
        "ts",
        F.when(F.expr("ts - prev_ts <= INTERVAL 30 MINUTES"), 0)
        .otherwise(1)
        .alias("new_session"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    sess = marked.select(
        "user_id", "ts", F.sum("new_session").over(w2).alias("session_no")
    )
    bounds = sess.groupBy("user_id", "session_no").agg(
        F.date_trunc("hour", F.min("ts")).alias("start_h"),
        (F.date_trunc("hour", F.max("ts")) + F.expr("INTERVAL 1 HOUR")).alias(
            "end_h"
        ),
    )
    deltas = (
        bounds.selectExpr("stack(2, start_h, 1, end_h, -1) as (h, d)")
        .groupBy("h")
        .agg(F.sum("d").cast("long").alias("delta"))
    )
    w3 = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return deltas.select(
        F.col("h").cast("string").alias("hour"),
        "delta",
        F.sum("delta").over(w3).cast("long").alias("active_sessions"),
    )


# ---------------------------------------------------------------------------
# q_rolling_median: trailing-window robust statistic on the day axis
# ---------------------------------------------------------------------------

_ROLLING_MEDIAN_ORACLE = """
  WITH daily AS (
    SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_c
    FROM orders GROUP BY 1
  )
  SELECT CAST(day AS VARCHAR) AS day,
         (CAST(revenue_c AS DOUBLE) / 100) AS revenue,
         round(quantile_cont(revenue_c, 0.5) OVER (
           ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
         ) / 100, 6) AS rolling_median_7d
  FROM daily
"""


@register(
    "q_rolling_median",
    oracle=_ROLLING_MEDIAN_ORACLE,
    tags=("timeseries", "window", "robust"),
)
def rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day MEDIAN of daily revenue — the robust companion
    to the moving averages the window pack already has: a single
    outlier day drags a trailing mean for a week, while the rolling
    median shrugs it off (the difference between the two columns IS
    the anomaly signal q_events_anomaly thresholds on z-scores).

    Exactness: the median interpolates integer cents over a <= 7-row
    frame — order statistics of integers interpolate at dyadic
    midpoints (the q_outlier_iqr rule), so both engines produce the
    identical double before the single rounded division.

    Scale shape: the corpus collapses to DAY grain (calendar-bounded)
    in one map-side-combined aggregate before any window; the rolling
    frame then sorts ~2400 rows on one partition — the
    q_concurrent_sessions bounded-axis argument. At 100 TB nothing
    here scales with rows except the first aggregate's map side."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("revenue_c")
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        (F.col("revenue_c").cast("double") / 100).alias("revenue"),
        F.round(
            F.percentile(F.col("revenue_c"), F.lit(0.5)).over(w) / 100, 6
        ).alias("rolling_median_7d"),
    )


# ---------------------------------------------------------------------------
# q_forecast_holt: exponential smoothing with integer-exact dyadic state
# ---------------------------------------------------------------------------

_HOLT_ORACLE = """
  WITH RECURSIVE m AS MATERIALIZED (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS y_c,
           row_number() OVER (
             ORDER BY CAST(date_trunc('month', o_orderdate) AS DATE)
           ) AS idx
    FROM orders GROUP BY 1
  ), ets(idx, level_c, trend_c) AS (
    SELECT idx, y_c, CAST(0 AS BIGINT) FROM m WHERE idx = 1
    UNION ALL
    SELECT m.idx,
           (m.y_c + e.level_c + e.trend_c) // 2,
           ((m.y_c + e.level_c + e.trend_c) // 2 - e.level_c + e.trend_c) // 2
    FROM ets e JOIN m ON m.idx = e.idx + 1
  )
  SELECT CAST(m.month AS VARCHAR) AS month,
         (CAST(m.y_c AS DOUBLE) / 100) AS revenue,
         (CAST(e.level_c AS DOUBLE) / 100) AS level,
         (CAST(e.trend_c AS DOUBLE) / 100) AS trend,
         (CAST(e.level_c + e.trend_c AS DOUBLE) / 100) AS forecast_next
  FROM m JOIN ets e ON e.idx = m.idx
"""


@register(
    "q_forecast_holt",
    oracle=_HOLT_ORACLE,
    tags=("timeseries", "forecast", "iterative"),
)
def forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear exponential smoothing over monthly revenue — the
    first REAL forecasting operator (q_forecast_revenue is the TPC-H
    Q6 what-if, not a model): level/trend recurrences with alpha =
    beta = 1/2, so every update is one add and one halving on INTEGER
    cents — level' = (y + level + trend) div 2, trend' = (level' -
    level + trend) div 2 — and the whole state trajectory is
    bit-identical in any engine. Halving semantics on NEGATIVE state
    is the cross-engine trap: DuckDB's integer // truncates toward
    zero while Python's // floors (measured: one-cent trend drift
    from month 2), so the Python side truncates explicitly.

    Execution shape: the corpus collapses map-side to ~80 monthly
    rows; the recurrence is inherently sequential, so it runs as ONE
    applyInPandas over the bounded series (the sanctioned Python
    crossing — a window cannot express a self-referencing recurrence,
    and 80 rows is driver-free but axis-bounded); the oracle unrolls
    the identical integer recurrence as a recursive CTE (the
    q_graph_pagerank discipline for recurrent state). At 100 TB the
    monthly collapse is the only data-scaled stage."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y_c")
        )
        .withColumn("g", F.lit(1))
    )

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        def halve(x: int) -> int:  # truncate toward zero, DuckDB //
            return x // 2 if x >= 0 else -((-x) // 2)

        pdf = pdf.sort_values("month").reset_index(drop=True)
        level, trend = [], []
        for i, y in enumerate(pdf["y_c"].astype("int64")):
            if i == 0:
                lv, tr = int(y), 0
            else:
                lv_new = halve(int(y) + lv + tr)
                tr = halve(lv_new - lv + tr)
                lv = lv_new
            level.append(lv)
            trend.append(tr)
        pdf["level_c"] = level
        pdf["trend_c"] = trend
        return pdf[["month", "y_c", "level_c", "trend_c"]]

    out = monthly.groupBy("g").applyInPandas(
        _holt, "month date, y_c long, level_c long, trend_c long"
    )
    return out.select(
        F.col("month").cast("string").alias("month"),
        (F.col("y_c").cast("double") / 100).alias("revenue"),
        (F.col("level_c").cast("double") / 100).alias("level"),
        (F.col("trend_c").cast("double") / 100).alias("trend"),
        ((F.col("level_c") + F.col("trend_c")).cast("double") / 100).alias(
            "forecast_next"
        ),
    )


# ---------------------------------------------------------------------------
# q_changepoint_cusum: two-sided CUSUM drift alarms, integer-exact
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
  WITH RECURSIVE d AS MATERIALIZED (
    SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS y_c,
           row_number() OVER (
             ORDER BY CAST(date_trunc('day', o_orderdate) AS DATE)
           ) AS idx
    FROM orders GROUP BY 1
  ), params AS (
    -- integer division, NOT CAST(avg(..)): DuckDB's double->bigint
    -- cast rounds where Python's int() truncates
    SELECT CAST(sum(y_c) AS BIGINT) // 28 AS target FROM d WHERE idx <= 28
  ), cusum(idx, pos, neg) AS (
    SELECT 1, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT d.idx,
           greatest(0, c.pos + d.y_c - p.target - p.target // 20),
           greatest(0, c.neg + p.target - p.target // 20 - d.y_c)
    FROM cusum c
    JOIN d ON d.idx = c.idx + 1
    CROSS JOIN params p
  )
  SELECT CAST(d.day AS VARCHAR) AS day,
         (CAST(d.y_c AS DOUBLE) / 100) AS revenue,
         c.pos AS cusum_pos, c.neg AS cusum_neg,
         CAST(c.pos > p.target OR c.neg > p.target AS INT) AS alarm
  FROM d JOIN cusum c ON c.idx = d.idx CROSS JOIN params p
"""


@register(
    "q_changepoint_cusum",
    oracle=_CUSUM_ORACLE,
    tags=("timeseries", "anomaly", "changepoint", "iterative"),
)
def changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM changepoint detection over daily revenue — the
    SEQUENTIAL drift detector next to q_events_anomaly's windowed
    z-score (a z-score forgets; CUSUM accumulates small persistent
    shifts until they cross the decision interval): pos/neg statistics
    accumulate deviations beyond a 5% slack around a target calibrated
    on the first 28 days, alarming when either side exceeds the
    target (the decision interval h = target).

    All state is INTEGER cents — adds, max(0, .), and one positive
    integer division for the slack — so the trajectory is bit-equal
    in both engines with no halving-semantics trap (q_forecast_holt's
    truncation lesson does not even arise). Day 1 starts at (0, 0)
    matching the oracle's anchor.

    Execution shape: map-side collapse to the ~2400-day bounded axis,
    ONE applyInPandas over the series for the recurrence, broadcast
    1-row params; the oracle is the identical recurrence as a
    recursive CTE (the q_forecast_holt pattern)."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y_c")
        )
        .withColumn("g", F.lit(1))
    )

    def _cusum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        target = int(pdf["y_c"].iloc[:28].astype("int64").sum()) // 28
        slack = target // 20
        pos = neg = 0
        ps, ns, al = [], [], []
        for i, y in enumerate(pdf["y_c"].astype("int64")):
            if i > 0:
                pos = max(0, pos + int(y) - target - slack)
                neg = max(0, neg + target - slack - int(y))
            ps.append(pos)
            ns.append(neg)
            al.append(1 if (pos > target or neg > target) else 0)
        pdf["cusum_pos"] = ps
        pdf["cusum_neg"] = ns
        pdf["alarm"] = al
        return pdf[["day", "y_c", "cusum_pos", "cusum_neg", "alarm"]]

    out = daily.groupBy("g").applyInPandas(
        _cusum, "day date, y_c long, cusum_pos long, cusum_neg long, alarm int"
    )
    return out.select(
        F.col("day").cast("string").alias("day"),
        (F.col("y_c").cast("double") / 100).alias("revenue"),
        "cusum_pos",
        "cusum_neg",
        "alarm",
    )
