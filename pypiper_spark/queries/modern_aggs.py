"""Modern aggregate surface (Spark 4 additions) + sketch aggregates.

Two themes:

1. **Spark-4 aggregate/API surface** a reference user migrating here
   gets for free: ordered LISTAGG, mode/median/exact percentiles,
   try_* error-safe arithmetic, case-insensitive collation semantics.
   All exact-oracled against DuckDB equivalents.

2. **Mergeable sketches — the 100 TB distinct-counting story.** A
   global count(distinct) shuffles every distinct value to one
   reducer. Sketches (HLL, count-min, bitmap) are MERGEABLE: each
   partition builds a fixed-size summary, partial aggregation
   combines them associatively, and the final merge is bytes —
   constant shuffle width regardless of input size. q_bitmap_distinct
   is the exact flavor (positional bitmaps, still mergeable);
   q_agg_sketches is the approximate flavor (HLL union across
   groups). These are the primitives a corpus pipeline uses for
   "unique documents per shard" / "vocabulary size" dashboards at
   scale.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypiper_spark.catalog import load_table
from pypiper_spark.registry import register

# ---------------------------------------------------------------------------
# LISTAGG (Spark 4) — ordered string aggregation
# ---------------------------------------------------------------------------

_LISTAGG_ORACLE = """
  SELECT n_regionkey,
         string_agg(n_name, ',' ORDER BY n_name) AS nations,
         count(*) AS n_nations
  FROM nation
  GROUP BY n_regionkey
"""


@register("q_agg_listagg", oracle=_LISTAGG_ORACLE, tags=("aggregate", "listagg"))
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered LISTAGG (Spark 4) — string aggregation with WITHIN GROUP
    ordering, the SQL-standard spelling of collect_list+sort+join.
    Deterministic because the order-by is total within each group;
    string output keeps the final schema driver-safe (round-1 lesson:
    no array output columns)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.expr("listagg(n_name, ',') within group (order by n_name)").alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )


# ---------------------------------------------------------------------------
# mode / median / exact percentiles
# ---------------------------------------------------------------------------

_MODE_MEDIAN_ORACLE = """
  SELECT o_orderpriority,
         mode(o_orderstatus) AS status_mode,
         round(median(o_totalprice), 6) AS price_median,
         round(quantile_cont(o_totalprice, 0.25), 6) AS price_p25,
         round(quantile_cont(o_totalprice, 0.95), 6) AS price_p95,
         count(*) AS n_orders
  FROM orders
  GROUP BY o_orderpriority
"""


@register(
    "q_agg_mode_median",
    oracle=_MODE_MEDIAN_ORACLE,
    tags=("aggregate", "mode", "median", "percentile"),
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode()/median()/exact percentile() per group.

    mode() is only deterministic when each group's max frequency is
    unique — verified for o_orderstatus x o_orderpriority at every
    test sf (a tie would be engine-arbitrary on BOTH engines). Exact
    percentiles sort each group's values — at 100 TB you reach for
    approx_percentile (q_agg_approx_percentile) instead; this is the
    exact small-group form. Both engines interpolate linearly
    (percentile == quantile_cont); rounding to 6dp absorbs the
    last-ulp interpolation drift."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.mode("o_orderstatus").alias("status_mode"),
        F.round(F.median("o_totalprice"), 6).alias("price_median"),
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 6).alias("price_p25"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 6).alias("price_p95"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# bitmap aggregates — EXACT mergeable distinct counting
# ---------------------------------------------------------------------------

_BITMAP_ORACLE = """
  SELECT o_orderpriority,
         count(DISTINCT o_custkey) AS n_customers,
         count(*) AS n_orders
  FROM orders
  GROUP BY o_orderpriority
"""


@register(
    "q_bitmap_distinct", oracle=_BITMAP_ORACLE, tags=("aggregate", "bitmap", "distinct")
)
def bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting via positional bitmaps
    (bitmap_construct_agg / bitmap_count) instead of count(DISTINCT).

    Why it matters at 100 TB: count(DISTINCT key) makes Catalyst
    Expand+reshuffle raw keys; the bitmap form is the canonical
    two-level rollup — ids map to (bucket, bit position), level 1
    ORs each bucket's 32k-bit bitmap together (associative,
    partial-aggregatable, fixed 4 KB state per bucket), level 2 sums
    the per-bucket popcounts. Shuffle width is bounded by the id
    domain / 32k, not by row count, and the count is EXACT — the
    oracle is plain count(DISTINCT). The same stored bitmaps also
    answer cross-slice distincts by OR-merge (the pre-aggregation
    trick), which no count(DISTINCT) rollup can."""
    o = load_table(spark, sf_dir, "orders")
    per_bucket = o.groupBy(
        "o_orderpriority", F.expr("bitmap_bucket_number(o_custkey)").alias("bucket")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_customers"),
        F.sum("n_orders").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# sketch pack: HLL + count-min + approx_top_k (rows-only, mergeable)
# ---------------------------------------------------------------------------


# Serialized count-min-sketch hex length for (eps=0.001, conf=0.99):
# width ceil(2/eps) x depth ceil(ln(1/(1-conf))) longs + header, hex-
# encoded. A structural constant of the sketch PARAMETERS (not the
# data), pinned against Spark 4's CountMinSketch binary layout by the
# oracle literal below.
_SKETCHES_ORACLE = """
  WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
  ), wc AS (
    SELECT source, word, count(*) AS c FROM tok GROUP BY source, word
  ), per AS (
    SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct
    FROM wc GROUP BY source
  ), per_out AS (
    SELECT source, n_tokens, n_distinct AS distinct_words_exact,
           TRUE AS hll_within_5pct, {cms} AS cms_bytes_x2,
           TRUE AS top_is_mode
    FROM per
  ), gl AS (
    SELECT '__all__' AS source, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           (SELECT count(DISTINCT word) FROM tok) AS distinct_words_exact,
           TRUE AS hll_within_5pct, {cms} AS cms_bytes_x2,
           TRUE AS top_is_mode
    FROM per
  )
  SELECT * FROM per_out UNION ALL SELECT * FROM gl
"""


@register(
    "q_agg_sketches",
    oracle=_SKETCHES_ORACLE.format(cms=224152),
    tags=("aggregate", "sketch", "approx"),
)
def agg_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch pack per source + a global union row:
    HLL distinct-token estimate (hll_sketch_agg -> hll_union_agg),
    count-min sketch size, approx_top_k leading item — registered in
    DECISION FORM (VERDICT r8 next #1c) since the raw estimates are
    engine-specific: the hashed output carries the exact ground truth
    (n_tokens, exact distinct) plus booleans asserting each sketch's
    contract — the HLL estimate within 5% of exact (lgConfigK=12 =>
    ~1.6% stderr, 5% = 3 sigma), and the approx_top_k leading item's
    exact frequency equal to the exact max frequency ("is A mode":
    the mode itself can tie — src12 at sf0.01 has a 3-way tie — so
    the word is checked by its count, not its spelling). cms_bytes_x2
    is a structural constant of the sketch parameters, stated as a
    literal by the oracle.

    The shape to notice: the global row is built by UNIONING the
    per-source HLL sketches — never by re-scanning tokens. That is
    the two-level rollup a 100 TB vocabulary dashboard runs: shard ->
    sketch, sketches -> union, bytes all the way (the exact-distinct
    ground-truth column exists for the correctness gate; the sketch
    columns are the scale path). tests/test_approx_ops.py keeps the
    direct estimate-vs-exact assertions."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("word"))
    wc = tok.groupBy("source", "word").agg(F.count(F.lit(1)).alias("c"))
    per_source = wc.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("distinct_words_exact"),
        F.max("c").alias("max_c"),
    )
    sketches = tok.groupBy("source").agg(
        F.hll_sketch_agg("word", F.lit(12)).alias("hll"),
        F.expr("hex(count_min_sketch(word, 0.001d, 0.99d, 42))").alias("cms_hex"),
        F.expr("approx_top_k(word, 1)[0].item").alias("top_word"),
    )
    top_c = (
        sketches.select(F.col("source").alias("s2"), "top_word")
        .join(
            wc,
            (F.col("word") == F.col("top_word")) & (F.col("source") == F.col("s2")),
        )
        .select(F.col("s2").alias("source"), F.col("c").alias("top_c"))
    )
    per = (
        per_source.join(sketches.drop("top_word"), "source")
        .join(top_c, "source")
        .select(
            "source",
            "n_tokens",
            "distinct_words_exact",
            (
                F.abs(
                    F.hll_sketch_estimate("hll") - F.col("distinct_words_exact")
                )
                <= F.greatest(F.lit(2.0), 0.05 * F.col("distinct_words_exact"))
            ).alias("hll_within_5pct"),
            F.length("cms_hex").alias("cms_bytes_x2"),
            (F.col("top_c") == F.col("max_c")).alias("top_is_mode"),
            F.col("hll"),
        )
    )
    glob_exact = tok.agg(
        F.countDistinct("word").alias("g_distinct"), F.count(F.lit(1)).alias("g_tokens")
    )
    global_out = (
        per.agg(
            F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("g_est"),
            F.max("cms_bytes_x2").alias("cms_bytes_x2"),
            F.min(F.col("top_is_mode").cast("int")).alias("all_tops"),
        )
        .crossJoin(F.broadcast(glob_exact))
        .select(
            F.lit("__all__").alias("source"),
            F.col("g_tokens").alias("n_tokens"),
            F.col("g_distinct").alias("distinct_words_exact"),
            (
                F.abs(F.col("g_est") - F.col("g_distinct"))
                <= F.greatest(F.lit(2.0), 0.05 * F.col("g_distinct"))
            ).alias("hll_within_5pct"),
            "cms_bytes_x2",
            (F.col("all_tops") == 1).alias("top_is_mode"),
        )
    )
    return per.drop("hll").unionByName(global_out)


# ---------------------------------------------------------------------------
# try_* error-safe arithmetic
# ---------------------------------------------------------------------------

_TRY_ORACLE = """
  SELECT l_orderkey, l_linenumber,
         l_extendedprice / nullif(l_quantity - 25, 0) AS price_per_excess,
         TRY_CAST(l_returnflag AS DOUBLE) AS flag_num,
         TRY_CAST(concat(CAST(year(l_shipdate) AS VARCHAR), '-01-01') AS TIMESTAMP)
           AS ship_year_start,
         coalesce(l_extendedprice / nullif(l_quantity - 25, 0), 0.0) AS safe_ratio
  FROM lineitem
  WHERE l_orderkey % 500 = 0
"""


@register("q_try_arithmetic", oracle=_TRY_ORACLE, tags=("scalar", "ansi", "try"))
def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: try_divide and try_cast return NULL where
    strict ANSI evaluation would raise (division by zero, malformed
    casts) — one failing cast (a flag letter as double), one
    succeeding cast (a built date string). The per-row division is
    IEEE-deterministic (no reduction), so no rounding is needed; the
    DuckDB twin spells try_divide as nullif-guarded division."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    ratio = F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ratio.alias("price_per_excess"),
        F.col("l_returnflag").try_cast("double").alias("flag_num"),
        F.concat(F.year("l_shipdate").cast("string"), F.lit("-01-01"))
        .try_cast("timestamp_ntz")
        .alias("ship_year_start"),
        F.coalesce(ratio, F.lit(0.0)).alias("safe_ratio"),
    )


# ---------------------------------------------------------------------------
# collation-aware comparisons (Spark 4)
# ---------------------------------------------------------------------------

_COLLATION_ORACLE = """
  SELECT lower(p_brand) AS brand,
         count(*) AS n_parts,
         count(*) FILTER (WHERE contains(lower(p_type), 'promo')) AS n_promo
  FROM part
  WHERE lower(p_brand) IN ('brand#11', 'brand#23', 'brand#41')
  GROUP BY lower(p_brand)
"""


@register("q_collation", oracle=_COLLATION_ORACLE, tags=("scalar", "collation"))
def collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive semantics via UTF8_LCASE collation (Spark 4):
    the equality predicate ('brand#11' vs the data's 'Brand#11') and
    contains() run under the collation — no lower() rewrite of the
    data column, which at 100 TB matters because a collated
    comparison preserves the column's statistics and dictionary
    encoding, while lower(col) is an expression that blocks pushdown.
    The grouping key is projected through lower() only to give both
    engines an identical output literal."""
    p = load_table(spark, sf_dir, "part")
    brand = F.collate("p_brand", "UTF8_LCASE")
    return (
        p.filter(brand.isin("brand#11", "brand#23", "brand#41"))
        .groupBy(F.lower("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.count_if(
                F.contains(F.collate("p_type", "UTF8_LCASE"), F.lit("promo"))
            ).alias("n_promo"),
        )
    )


# ---------------------------------------------------------------------------
# boolean aggregates
# ---------------------------------------------------------------------------

_BOOL_ORACLE = """
  SELECT o_orderpriority,
         bool_and(o_totalprice > 1000) AS all_over_1k,
         bool_or(o_orderstatus = 'P') AS any_pending,
         count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
         count(*) AS n_orders
  FROM orders
  GROUP BY o_orderpriority
"""


@register("q_agg_boolean", oracle=_BOOL_ORACLE, tags=("aggregate", "boolean"))
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and / bool_or / count_if): predicate
    rollups as single-shuffle hash aggregates with 1-bit partial
    state — the cheap spelling of "did every/any row in the group
    satisfy P", vs the join-or-window forms people reach for."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# bucketed histogram
# ---------------------------------------------------------------------------

_HISTOGRAM_ORACLE = """
  SELECT CAST(floor(o_totalprice / 25000) AS INT) AS bucket,
         count(*) AS n_orders,
         round(min(o_totalprice), 2) AS lo,
         round(max(o_totalprice), 2) AS hi
  FROM orders
  GROUP BY 1
"""


@register("q_agg_histogram", oracle=_HISTOGRAM_ORACLE, tags=("aggregate", "histogram"))
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram via width_bucket + groupBy — the
    distributed histogram is just a hash aggregate over a computed
    bucket id (bin count bounded => bounded agg state; one shuffle of
    20 rows of partial state per partition, any data size). Both
    engines compute the bin id with identical floor arithmetic
    (width_bucket exists in Spark but not DuckDB, so the dialect-
    neutral spelling is the explicit floor division)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.floor(F.col("o_totalprice") / 25000).cast("int").alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# salted two-phase aggregation for hot keys
# ---------------------------------------------------------------------------

_SALTED_AGG_ORACLE = """
  SELECT o_orderstatus,
         count(*) AS n_orders,
         (CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100)
           AS total_price
  FROM orders
  GROUP BY o_orderstatus
"""


@register(
    "q_agg_skew_salted", oracle=_SALTED_AGG_ORACLE, tags=("aggregate", "skew", "salt")
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation: o_orderstatus has ~3 values over
    millions of rows — a direct groupBy would route each hot key's
    ENTIRE partial state stream through one reducer. Phase 1 groups by
    (key, salt16) so every reducer takes 1/16th of each hot key;
    phase 2 merges the 3x16 partial rows. The result is
    salt-invariant (counts and integer-cents sums are associative), so
    the oracle is the plain GROUP BY. NOTE: Spark's hash aggregate
    already does map-side partial aggregation, which handles THIS
    shape — explicit salting is for the cases partial agg can't save:
    high-cardinality accumulators (collect/distinct state) or
    sort-based fallbacks on the hot reducer."""
    o = load_table(spark, sf_dir, "orders")
    salted = o.select(
        "o_orderstatus",
        # pmod, not %: Spark's % is sign-preserving, which would yield
        # 31 salt values (-15..15) and halve per-reducer dilution vs
        # the 16-way story above
        F.pmod(F.xxhash64("o_orderkey"), F.lit(16)).alias("_salt"),
        "o_totalprice",
    )
    phase1 = salted.groupBy("o_orderstatus", "_salt").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )
    return phase1.groupBy("o_orderstatus").agg(
        F.sum("n").alias("n_orders"),
        (F.sum("cents").cast("double") / 100).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# regression aggregates
# ---------------------------------------------------------------------------

_REGR_ORACLE = """
  SELECT l_returnflag,
         count(*) AS n,
         round(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty,
         round(regr_intercept(l_extendedprice, l_quantity), 4) AS base_price,
         round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
         round(corr(l_extendedprice, l_quantity), 6) AS pearson
  FROM lineitem
  GROUP BY l_returnflag
"""


@register(
    "q_agg_regression", oracle=_REGR_ORACLE, tags=("aggregate", "stats", "regression")
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (regr_slope / regr_intercept /
    regr_r2 / corr) per group: the one-pass distributed form of least
    squares — each partition accumulates the five moment sums, merge
    is associative, one shuffle of constant-width state. Inherently
    float reductions, so both sides round (4dp for the slope/intercept
    whose magnitudes are ~1e2-1e4, 6dp for the unit-scale r2/corr —
    granularity orders above the ~1e-10 merge-order drift)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
            "price_per_qty"
        ),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "base_price"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("pearson"),
    )
