"""Breadth extras: unpivot, distribution windows, bitwise ops, binary
encodings, null-handling functions (SURVEY.md 2C growth beyond 2B).
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pypiper_spark.catalog import load_table
from pypiper_spark.registry import register


@register(
    "q_unpivot",
    oracle="""
      SELECT c_custkey, metric, value FROM (
        SELECT c_custkey,
               unnest(['acctbal', 'nationkey']) AS metric,
               unnest([c_acctbal, CAST(c_nationkey AS DOUBLE)]) AS value
        FROM customer
      )
    """,
    tags=("reshape",),
)
def unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long (melt): the inverse of q_pivot. Generator-based, no
    shuffle — each input row emits one row per measure."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")


@register(
    "q_win_distribution",
    oracle="""
      SELECT o_orderkey, o_orderpriority,
             round(percent_rank() OVER w, 8) AS pct_rank,
             round(cume_dist() OVER w, 8) AS cume,
             ntile(10) OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    """,
    tags=("window", "distribution"),
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist (value-ordered, tie-stable) + decile
    ntile over a total order."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    w_total = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
        F.ntile(10).over(w_total).alias("decile"),
    )


@register(
    "q_bitwise",
    oracle="""
      SELECT event_id,
             event_id & 255 AS low_byte,
             event_id | 4096 AS with_flag,
             xor(event_id, user_id) AS xored,
             event_id << 2 AS shifted_l,
             event_id >> 3 AS shifted_r,
             CAST(bit_count(event_id) AS INTEGER) AS popcount
      FROM events
    """,
    tags=("scalar", "bitwise"),
)
def bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise ops (and/or/xor/shifts) on event ids -- partition-bucket arithmetic in codegen."""
    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    return ev.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("low_byte"),
        eid.bitwiseOR(F.lit(4096)).alias("with_flag"),
        eid.bitwiseXOR(F.col("user_id")).alias("xored"),
        F.shiftleft(eid, 2).alias("shifted_l"),
        F.shiftright(eid, 3).alias("shifted_r"),
        F.bit_count(eid).alias("popcount"),
    )


@register(
    "q_encodings",
    oracle="""
      -- encode(), not CAST(.. AS BLOB): the cast DEMANDS ascii-escaped
      -- input and fails outright on non-ascii text (caught by the 100x
      -- sweep, whose corpus carries a multi-byte copy tag); encode()
      -- is DuckDB's utf-8 string->blob, matching Spark's cast("binary")
      SELECT doc_id,
             md5(text) AS text_md5,
             sha256(text) AS text_sha256,
             to_base64(encode(substr(text, 1, 12))) AS head_b64,
             hex(encode(substr(text, 1, 6))) AS head_hex,
             CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
      FROM documents WHERE doc_id % 20 = 0
    """,
    tags=("scalar", "encoding"),
)
def encodings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing + binary encodings (content addressing for dedup/CAS)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    txt = F.col("text")
    return d.select(
        "doc_id",
        F.md5(txt.cast("binary")).alias("text_md5"),
        F.sha2(txt.cast("binary"), 256).alias("text_sha256"),
        F.base64(F.substring(txt, 1, 12).cast("binary")).alias("head_b64"),
        F.hex(F.substring(txt, 1, 6).cast("binary")).alias("head_hex"),
        F.length(txt.cast("binary")).alias("n_bytes"),
    )


@register(
    "q_agg_cube",
    oracle="""
      SELECT o_orderstatus, o_orderpriority,
             GROUPING(o_orderstatus, o_orderpriority) AS gid,
             count(*) AS n,
             (CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100)
               AS total
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^n grouping sets in one shuffle (rollup's sibling,
    q_agg_grouping_sets covers ROLLUP)."""
    from pypiper_spark.compare import dsum

    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total"),
    )


@register(
    "q_win_nth",
    oracle="""
      SELECT o_custkey, o_orderkey,
             first_value(o_totalprice) OVER w AS first_spend,
             nth_value(o_totalprice, 2) OVER w AS second_spend
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def win_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value/first/last over an explicit frame per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_spend"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_spend"),
    )


@register(
    "q_higher_order",
    oracle="""
      WITH t AS (
        SELECT vec_id, embedding[1:8] AS head8 FROM embeddings
      ), d AS (
        SELECT vec_id, head8,
               list_transform(CAST(head8 AS DOUBLE[]), x -> round(x * 2, 6)) AS doubled
        FROM t
      )
      SELECT vec_id,
             doubled[1] AS dbl_1, doubled[2] AS dbl_2, doubled[3] AS dbl_3,
             doubled[4] AS dbl_4, doubled[5] AS dbl_5, doubled[6] AS dbl_6,
             doubled[7] AS dbl_7, doubled[8] AS dbl_8,
             CAST(len(list_filter(head8, x -> x > 0)) AS INTEGER) AS n_positive,
             (len(list_filter(head8, x -> x > 0)) > 0) AS any_positive,
             (len(list_filter(head8, x -> x < 1)) = len(head8)) AS all_below_one
      FROM d
    """,
    tags=("scalar", "higher_order"),
)
def higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda higher-order functions as a first-class surface:
    transform / filter / exists / forall — the codegen-friendly way to
    compute over arrays without ever leaving the JVM. The transformed
    array is flattened to scalar columns in the final projection (the
    driver's pandas canonicalizer cannot hash list cells); elements
    compare bit-exact as floats."""
    e = load_table(spark, sf_dir, "embeddings")
    head8 = F.slice("embedding", 1, 8)
    t = e.select("vec_id", head8.alias("head8"))
    d = t.select(
        "vec_id",
        "head8",
        F.transform(F.col("head8").cast("array<double>"), lambda x: F.round(x * 2, 6)).alias(
            "doubled"
        ),
    )
    return d.select(
        "vec_id",
        *[F.element_at("doubled", i).alias(f"dbl_{i}") for i in range(1, 9)],
        F.size(F.filter("head8", lambda x: x > 0)).alias("n_positive"),
        F.exists("head8", lambda x: x > 0).alias("any_positive"),
        F.forall("head8", lambda x: x < 1).alias("all_below_one"),
    )


@register(
    "q_null_funcs",
    oracle="""
      WITH t AS (
        SELECT o_orderkey,
               nullif(o_orderstatus, 'O') AS s,
               nullif(o_totalprice, 0.0) AS p
        FROM orders
      )
      SELECT o_orderkey,
             coalesce(s, 'open') AS s_filled,
             ifnull(s, '?') AS s_ifnull,
             CASE WHEN s IS NULL THEN 'was_null' ELSE 'had_value' END AS s_tag,
             greatest(coalesce(p, 0.0), 100000.0) AS p_floor,
             least(coalesce(p, 1e9), 100000.0) AS p_cap
      FROM t
    """,
    tags=("scalar", "null"),
)
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL scalar toolkit: nullif/coalesce/ifnull/greatest/least with engine-identical semantics."""
    o = load_table(spark, sf_dir, "orders")
    s = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    p = F.nullif(F.col("o_totalprice"), F.lit(0.0))
    return o.select(
        "o_orderkey",
        F.coalesce(s, F.lit("open")).alias("s_filled"),
        F.ifnull(s, F.lit("?")).alias("s_ifnull"),
        F.when(s.isNull(), "was_null").otherwise("had_value").alias("s_tag"),
        F.greatest(F.coalesce(p, F.lit(0.0)), F.lit(100000.0)).alias("p_floor"),
        F.least(F.coalesce(p, F.lit(1e9)), F.lit(100000.0)).alias("p_cap"),
    )


_FUNNEL_ORACLE = """
  WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
             WHERE event_type = 'view' GROUP BY user_id),
  c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
          AND e.ts <= v.t_view + INTERVAL '1 day' GROUP BY e.user_id),
  p AS (SELECT e.user_id FROM events e
        JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          AND e.ts <= c.t_click + INTERVAL '1 day' GROUP BY e.user_id)
  SELECT (SELECT count(*) FROM v) AS n_view,
         (SELECT count(*) FROM c) AS n_view_click,
         (SELECT count(*) FROM p) AS n_full_funnel,
         round(CAST((SELECT count(*) FROM c) AS DOUBLE)
               / (SELECT count(*) FROM v), 6) AS click_rate,
         round(CAST((SELECT count(*) FROM p) AS DOUBLE)
               / (SELECT count(*) FROM v), 6) AS purchase_rate
"""


@register("q_events_funnel", oracle=_FUNNEL_ORACLE, tags=("events", "funnel"))
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click within 1 day ->
    purchase within 1 day of the click). Each stage is one grouped
    min-aggregate joined to the previous stage on user_id — three
    shuffles ALL on the same key, so at cluster scale the exchanges
    after the first reuse the partitioning. The stage counts collapse
    to a 1-row summary; rates divide exact integers (deterministic)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("INTERVAL 1 DAY")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t_view")) & (F.col("ts") <= F.col("t_view") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t_click")) & (F.col("ts") <= F.col("t_click") + day))
        .groupBy("user_id")
        .agg(F.lit(1).alias("_one"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_view_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_full_funnel"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_view",
            "n_view_click",
            "n_full_funnel",
            F.round(F.col("n_view_click").cast("double") / F.col("n_view"), 6).alias(
                "click_rate"
            ),
            F.round(F.col("n_full_funnel").cast("double") / F.col("n_view"), 6).alias(
                "purchase_rate"
            ),
        )
    )


_SHIPPING_PRIORITY_ORACLE = """
  SELECT l_orderkey, revenue, o_orderdate, o_orderpriority FROM (
    SELECT l.l_orderkey,
           (CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * CAST(round((1.0 - l.l_discount) * 100) AS BIGINT))
             AS DOUBLE) / 10000) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority)
  ORDER BY CAST(round(revenue * 100) AS BIGINT) DESC, l_orderkey
  LIMIT 10
"""


@register(
    "q_shipping_priority",
    oracle=_SHIPPING_PRIORITY_ORACLE,
    tags=("join", "aggregate", "topk"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer x orders x lineitem,
    revenue per order, global top-10.

    Scale design, two decisions a CBO would make encoded explicitly:
    (1) customer contributes only its segment FILTER (c_custkey is
    unique, no output columns) -> LEFT SEMI join, so the build side
    carries keys only and no customer row widths ride the plan;
    (2) the semi-filter applies to ORDERS FIRST and lineitem joins
    LAST — the custkey exchange moves ~|orders| rows and the big
    lineitem exchange happens once. The li⋈o-first order with the
    customer join after it reshuffled |lineitem| rows on custkey:
    measured 11.1 s vs 7.4 s at the 100x corpus (BENCH.md r4). All
    joins UNHINTED: AQE broadcasts the segment-filtered key set /
    surviving orders while they fit 64 MB and shuffle-joins at
    100 TB. Both date filters push to the scans; the revenue sum is
    exact integer cents so the top-10 cut is partitioning-independent
    (rank on the CENTS value, not the divided double — compare.py
    'round before rank'); the final ORDER BY+LIMIT is
    TakeOrderedAndProject, never a full sort."""
    from pypiper_spark.compare import cents

    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp_ntz")
    )
    rev_cents = F.sum(cents("l_extendedprice") * cents(F.lit(1.0) - F.col("l_discount")))
    o_b = o.join(
        c.select("c_custkey"), o.o_custkey == F.col("c_custkey"), "left_semi"
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    return (
        li.join(o_b, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev_cents.alias("_rc"))
        .orderBy(F.desc("_rc"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            (F.col("_rc").cast("double") / 10000).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@register(
    "q_skyline_orders",
    oracle="""
      WITH pts AS (
        SELECT o_orderkey,
               date_diff('day', TIMESTAMP '1992-01-01 00:00:00', o_orderdate)
                 AS day,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        FROM orders
      ),
      flagged AS (
        SELECT o_orderkey, day, price_c,
               max(price_c) OVER (ORDER BY day
                                  RANGE BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) AS m_earlier,
               max(price_c) OVER (PARTITION BY day) AS m_same_day
        FROM pts
      )
      SELECT o_orderkey, day, CAST(price_c AS DOUBLE) / 100 AS o_totalprice
      FROM flagged
      WHERE coalesce(m_earlier, -1) < price_c AND m_same_day <= price_c
    """,
    tags=("window", "skyline"),
)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline of orders over (earlier order date, higher
    total price): an order survives iff no other order is at least as
    early AND at least as expensive (strict in one dimension) — the
    dominance frontier of multi-objective ranking.

    The naive formulation is a quadratic NOT EXISTS self-join, and
    the textbook window form (running max over an unpartitioned RANGE
    frame) funnels every order through ONE reducer — the global-sort
    pinch. The dominance thresholds only depend on the DAY, so the
    engine collapses first: one map-side-combined groupBy gives the
    per-day max price (calendar-cardinality — BOUNDED by construction,
    ~2.4 k rows for 7 years, independent of data volume), the running
    "strictly earlier" max is a window over THAT tiny table (its
    single-partition sort is calendar-sized, never data-sized), and
    the thresholds broadcast-join back to orders on day — the hint is
    legitimate here exactly because calendars do not grow with the
    corpus. Dominated iff an earlier day's max >= mine, or my own
    day's max > mine (ties on both dimensions dominate nobody: no
    strict edge). Prices compare in exact integer cents on both
    engines."""
    o = load_table(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )
    day_max = pts.groupBy("day").agg(F.max("price_c").alias("m_same_day"))
    w_earlier = (
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    )
    thresholds = day_max.withColumn(
        "m_earlier", F.max("m_same_day").over(w_earlier)
    )
    return (
        pts.join(F.broadcast(thresholds), "day")
        .filter(
            (F.coalesce(F.col("m_earlier"), F.lit(-1)) < F.col("price_c"))
            & (F.col("m_same_day") <= F.col("price_c"))
        )
        .select(
            "o_orderkey",
            "day",
            (F.col("price_c").cast("double") / 100).alias("o_totalprice"),
        )
    )


@register(
    "q_copurchase_pairs",
    oracle="""
      WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      ),
      pairs AS (
        SELECT a.l_orderkey, a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      ),
      counted AS (
        SELECT part_a, part_b, count(*) AS n_orders
        FROM pairs GROUP BY part_a, part_b
      )
      SELECT part_a, part_b, n_orders FROM counted
      WHERE n_orders >= 2
    """,
    tags=("join", "basket"),
)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchase pairs (market-basket support counts):
    parts appearing together in >= 2 orders. The first step of every
    association-rule / frequent-itemset miner.

    The (order, part) pairs are DISTINCT-collapsed before the
    self-join: lineitem can hold the same part on several lines of one
    order (58 such rows at sf0.001), and without the collapse a
    repeated part inflates pair support — n_orders would count joined
    line-pairs, not orders (round-5 ADVICE fix; the property test's
    bound "n_orders <= each member's distinct-order count" is now an
    invariant, not a fixture accident).

    The self-join LOOKS quadratic but is bounded by construction:
    lineitem is keyed by order, an order holds at most 7 lines
    (TPC-H invariant; real baskets are similarly tiny next to the
    corpus), so the join emits <= C(7,2) = 21 pairs per order —
    LINEAR in orders at any corpus size, co-located on the orderkey
    hash both sides (one shuffle each, same partitioning; the distinct
    shares that same orderkey-hash partitioning, so AQE plans it
    without an extra exchange). The pair aggregate is map-side
    combinable. This boundedness argument is the exact opposite of
    q_join_theta_range's value-band join (unbounded per-key fanout,
    excluded from copy-scaling) — the per-key cap is what makes basket
    mining feasible at 100 TB."""
    # r12 optimization round (guide §2.4 — remove shuffles outright):
    # the r5-r11 form DISTINCT-collapsed (order, part) then SELF-JOINED
    # on l_orderkey — four exchanges (distinct on the pair, join
    # re-exchange of both sides on the order key, pair aggregate).
    # Because per-order fanout is bounded (<= 7 lines -> <= 21 pairs),
    # the same pairs fall out of ONE groupBy(l_orderkey) collect_set
    # (which also dedups repeated parts within an order — the round-5
    # ADVICE invariant) followed by an in-row pair explosion (codegen
    # HOFs over a <= 7-element array), leaving TWO exchanges total:
    # basket build and pair count. Values verified identical at sf0.1
    # (full frame compare) and hash-exact vs the oracle at sf0.01;
    # interleaved A/B warm: old 2.19/1.49 s, new 1.69/1.41 s.
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "filter(flatten(transform(parts,"
                " x -> transform(parts, y -> struct(x as part_a, y as part_b)))),"
                " p -> p.part_a < p.part_b)"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@register(
    "q_event_transitions",
    oracle="""
      WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
      ),
      cnt AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
      )
      SELECT prev_type, next_type, n,
             CAST(n AS DOUBLE)
               / sum(n) OVER (PARTITION BY prev_type) AS p_next
      FROM cnt
    """,
    tags=("window", "markov", "behavior"),
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream:
    for each (previous event type -> next event type) pair, the count
    and the conditional probability. The sequence-mining primitive
    behind funnel discovery and session modeling.

    Scale shape: one lag() window per user (a single user_id hash
    shuffle — the stream is already the right shape for it), one
    map-side-combined pair aggregate, and the normalizing window runs
    on the TYPE-PAIR table (|event_types|^2 rows — bounded by
    construction, ~25 here), never on raw events. p_next is one IEEE
    division of exact BIGINTs partitioned over a bounded key, so no
    rounding discipline is needed."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    cnt = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return cnt.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wp)).alias("p_next"),
    )


@register(
    "q_ab_test_proportions",
    oracle="""
      WITH assign AS (
        SELECT user_id, user_id % 2 AS variant,
               max(CASE WHEN event_type = 'purchase' AND value >= 99
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
      ),
      arms AS (
        SELECT variant,
               count(*) AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_converted
        FROM assign GROUP BY variant
      ),
      wide AS (
        SELECT
          max(CASE WHEN variant = 0 THEN n_users END) AS n0,
          max(CASE WHEN variant = 0 THEN n_converted END) AS c0,
          max(CASE WHEN variant = 1 THEN n_users END) AS n1,
          max(CASE WHEN variant = 1 THEN n_converted END) AS c1
        FROM arms
      )
      SELECT n0, c0, n1, c1,
             round(CAST(c0 AS DOUBLE) / n0, 6) AS rate0,
             round(CAST(c1 AS DOUBLE) / n1, 6) AS rate1,
             round(
               (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
               / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1)),
               6) AS z_score
      FROM wide
    """,
    tags=("experiment", "aggregate"),
)
def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: users assigned to
    variants by a deterministic hash split (user_id parity stands in
    for the assignment hash), conversion = any high-value purchase (value >= 99 — a threshold
    that leaves both converted and unconverted users at every test
    scale; "any purchase" is degenerate on this corpus, every user
    has one, and a 100% pooled rate zeroes the variance), pooled
    z-statistic for the rate difference — the experimentation-
    platform primitive.

    Scale shape: per-user conversion flags collapse the event stream
    in ONE map-side-combined aggregate (user-cardinality), arm totals
    in a second (2 rows), and the z arithmetic runs on a single row.
    Every reduction is an exact integer count; the float math (two
    divisions, one sqrt — IEEE-identical in both engines) happens
    once at the very end, rounded to 6 before comparison."""
    ev = load_table(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.max(
            ((F.col("event_type") == "purchase") & (F.col("value") >= 99)).cast("int")
        ).alias("converted")
    ).withColumn("variant", F.col("user_id") % 2)
    arms = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    r0 = F.col("c0").cast("double") / F.col("n0")
    r1 = F.col("c1").cast("double") / F.col("n1")
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = (r1 - r0) / F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(r0, 6).alias("rate0"),
        F.round(r1, 6).alias("rate1"),
        F.round(z, 6).alias("z_score"),
    )


_PROFILE_COLS = ["l_returnflag", "l_linestatus", "l_shipdate", "l_quantity"]


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
          SELECT '{c}' AS column_name,
                 count(*) AS n_rows,
                 count({c}) AS n_nonnull,
                 count(DISTINCT {c}) AS n_distinct,
                 CAST(min({c}) AS VARCHAR) AS min_value,
                 CAST(max({c}) AS VARCHAR) AS max_value
          FROM lineitem""")
    return " UNION ALL ".join(parts)


@register(
    "q_profile_columns",
    oracle=_profile_oracle(),
    tags=("maintenance", "profiling"),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style column profiling: per-column row/non-null/distinct
    counts and min/max rendered as strings — the stats layer every
    data-quality framework and query optimizer collects.

    Scale shape: ONE COLUMN-PRUNED LEG PER COLUMN, unioned. The
    tempting "single wide aggregate with N count_distincts" is a
    trap: multiple distinct aggregates in one grouping make Catalyst
    Expand every input row N+1 ways (60 M rows -> 300 M through one
    hash aggregate — measured 35.4 s at the 100x corpus). Per-column
    legs read ONE column each off parquet (pruning makes the union's
    total I/O equal to the wide scan's) and each leg is a plain
    partial+final aggregate with no Expand — 6.8 s at 100x, 5x
    faster, and embarrassingly parallel across columns on a
    cluster. For very-high-cardinality columns swap the exact
    distinct for approx_count_distinct or the bitmap pattern
    (q_bitmap_distinct); timestamps render through date_format to
    match DuckDB's VARCHAR cast of microsecond timestamps."""
    li = load_table(spark, sf_dir, "lineitem")
    legs = []
    for c in _PROFILE_COLS:
        dt = dict(li.dtypes)[c]
        if dt.startswith("timestamp"):
            smin = F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss")
            smax = F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss")
        else:
            smin, smax = F.min(c).cast("string"), F.max(c).cast("string")
        legs.append(
            li.select(c).agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count(c).alias("n_nonnull"),
                F.count_distinct(c).alias("n_distinct"),
                smin.alias("min_value"),
                smax.alias("max_value"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out


# ---------------------------------------------------------------------------
# q_event_pattern_match: MATCH_RECOGNIZE-style sequence pattern detection
# ---------------------------------------------------------------------------

_PATTERN = "s[^p]*p"  # signup ... purchase, no purchase in between

_PATTERN_ORACLE = f"""
  WITH seqs AS (
    SELECT user_id,
           string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
             AS seq
    FROM events
    GROUP BY user_id
  )
  SELECT user_id,
         CAST(length(seq) AS BIGINT) AS seq_len,
         CAST(len(regexp_extract_all(seq, '{_PATTERN}')) AS BIGINT)
           AS n_funnels,
         CAST(length(regexp_extract(seq, '{_PATTERN}', 0)) AS BIGINT)
           AS first_span_len
  FROM seqs
  WHERE len(regexp_extract_all(seq, '{_PATTERN}')) >= 1
"""


@register(
    "q_event_pattern_match",
    oracle=_PATTERN_ORACLE,
    tags=("events", "pattern", "sequence", "window"),
)
def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over event streams — the
    MATCH_RECOGNIZE workload expressed portably: each user's event
    history collapses to a 1-char-per-event code string in exact
    (ts, event_id) order, and the funnel pattern signup ->
    (anything but purchase)* -> purchase is counted as non-overlapping
    regex matches ('s[^p]*p'). Emits per-user sequence length, funnel
    count, and the first funnel's span — the conversion-path shape
    q_events_funnel counts in aggregate, here detected as explicit
    pattern instances with arbitrary intervening noise.

    Determinism: the code string rides LISTAGG WITHIN GROUP over the
    total (ts, event_id) order; greedy-leftmost non-overlapping match
    semantics for this pattern class (single literal anchors, negated
    char class) are identical in Java regex and RE2 — no backtracking
    ambiguity exists for 's[^p]*p'.

    Scale shape: ONE user-keyed exchange builds the sequences (the
    same partitioning every session op rides); the regex runs map-side
    on user-grain rows. Sequence length is bounded by per-user event
    counts (~5k chars at 100x) — pattern state never shuffles. A
    streaming twin would be applyInPandasWithState carrying the NFA
    state; batch regex over the collapsed string is the exact-oracle
    form."""
    ev = load_table(spark, sf_dir, "events")
    seqs = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.substring("event_type", 1, 1).alias("code"),
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "listagg(code, '') within group (order by ts, event_id)"
            ).alias("seq")
        )
    )
    return (
        seqs.select(
            "user_id",
            F.length("seq").cast("long").alias("seq_len"),
            F.expr(f"regexp_count(seq, '{_PATTERN}')")
            .cast("long")
            .alias("n_funnels"),
            F.length(F.regexp_extract("seq", _PATTERN, 0))
            .cast("long")
            .alias("first_span_len"),
        )
        .filter(F.col("n_funnels") >= 1)
    )
