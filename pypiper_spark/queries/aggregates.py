"""Aggregation operators (SURVEY.md section 2B: aggregations).

Every grouped aggregate here compiles to partial (map-side) + final
hash aggregation — the shuffle carries pre-aggregated state, not rows,
which is what makes these viable over 100 TB inputs. Exact-decimal
sums (compare.py) additionally make results partitioning-independent.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypiper_spark.catalog import load_table
from pypiper_spark.compare import cents, davg, dsum, sql_davg, sql_dsum
from pypiper_spark.registry import register


@register(
    "q_agg_global",
    oracle=f"""
      SELECT count(*) AS n_rows,
             {sql_dsum('l_quantity')} AS total_qty,
             {sql_davg('l_extendedprice')} AS avg_price,
             min(l_extendedprice) AS min_price,
             max(l_extendedprice) AS max_price,
             min(l_shipdate) AS first_ship,
             max(l_shipdate) AS last_ship
      FROM lineitem
    """,
    tags=("aggregate",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate: partial agg per partition -> single merge.
    The reference's BATCH_SIZE_ALL analog, without materializing the
    stream in one list (SURVEY.md section 7.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("total_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "q_agg_group",
    oracle=f"""
      SELECT o_orderpriority, o_orderstatus,
             count(*) AS n_orders,
             {sql_dsum('o_totalprice')} AS total_value,
             min(o_totalprice) AS min_value,
             max(o_totalprice) AS max_value,
             {sql_davg('o_totalprice')} AS avg_value
      FROM orders
      GROUP BY o_orderpriority, o_orderstatus
    """,
    tags=("aggregate",),
)
def agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregate on a 2-column key: partial+final hash agg, one shuffle of pre-aggregated state."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_value"),
        F.min("o_totalprice").alias("min_value"),
        F.max("o_totalprice").alias("max_value"),
        davg("o_totalprice").alias("avg_value"),
    )


@register(
    "q_agg_distinct",
    oracle=f"""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             (CAST(sum(DISTINCT CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100)
               AS sum_distinct_qty
      FROM lineitem
      GROUP BY l_returnflag
    """,
    tags=("aggregate",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates: Catalyst rewrites to expand + two-phase agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        (F.sum_distinct(cents("l_quantity")).cast("double") / 100).alias("sum_distinct_qty"),
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS exact_parts,
             TRUE AS approx_within_6pct
      FROM lineitem
      GROUP BY l_returnflag
    """,
    tags=("aggregate", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ count-distinct, registered in DECISION FORM (VERDICT r8
    next #1c): the estimate itself is engine-specific, so the hashed
    output carries the exact count plus a boolean asserting the HLL
    estimate landed within 3x its configured rsd (0.02 -> 6%). The
    oracle recomputes the exact count and states TRUE — a regression
    in either the exact path or the sketch (estimate drifting outside
    its error model) flips the hash. tests/test_approx_ops.py keeps
    the tighter direct rel-error assertion on the raw estimate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.02)
                - F.countDistinct("l_partkey")
            )
            <= 0.06 * F.countDistinct("l_partkey")
        ).alias("approx_within_6pct"),
    )


@register(
    "q_agg_grouping_sets",
    oracle=f"""
      SELECT l_returnflag, l_linestatus,
             GROUPING(l_returnflag, l_linestatus) AS gid,
             count(*) AS n_rows,
             {sql_dsum('l_quantity')} AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("aggregate",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup with grouping_id; Catalyst expands to a union of grouping
    sets before the single shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
    )


@register(
    "q_agg_having",
    oracle=f"""
      SELECT o_custkey, count(*) AS n_orders, {sql_dsum('o_totalprice')} AS spend
      FROM orders
      GROUP BY o_custkey
      HAVING count(*) >= 12 AND {sql_dsum('o_totalprice')} > 1000000.0
    """,
    tags=("aggregate",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING: the post-aggregation filter runs on group state, never rescans rows."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("spend"))
        .filter((F.col("n_orders") >= 12) & (F.col("spend") > 1000000.0))
    )


@register(
    "q_agg_collect",
    oracle="""
      SELECT o_orderpriority,
             count(*) AS n_orders,
             array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
             array_to_string(list_sort(list(DISTINCT o_orderkey % 7)), ',') AS key_mods
      FROM orders
      GROUP BY o_orderpriority
    """,
    tags=("aggregate", "collect"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List/set aggregation; sorted on both sides for determinism
    (SURVEY.md section 5.3 — collect order is undefined in both engines).
    Final projection serializes the arrays with array_join: the driver's
    pandas canonicalizer cannot sort/hash list cells, and the comparison
    semantics (same distinct elements, same order) are unchanged."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_set(F.col("o_orderkey") % 7)),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("key_mods"),
    )


@register(
    "q_agg_stats",
    oracle="""
      SELECT l_linestatus,
             round(stddev_samp(l_extendedprice), 4) AS sd_price,
             round(var_samp(l_quantity), 4) AS var_qty,
             round(corr(l_extendedprice, l_quantity), 6) AS corr_price_qty,
             round(covar_samp(l_extendedprice, l_quantity), 4) AS covar_price_qty,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
             round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
      FROM lineitem
      GROUP BY l_linestatus
    """,
    tags=("aggregate", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates are inherently float reductions; both
    sides round to a granularity many orders above the merge error."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("covar_price_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
    )


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_COLS = ", ".join(
    sql_dsum("CASE WHEN event_type = '" + t + "' THEN value END") + " AS " + t
    for t in _PIVOT_TYPES
)
_PIVOT_ORACLE = f"SELECT user_id, {_PIVOT_COLS} FROM events GROUP BY user_id"


@register("q_pivot", oracle=_PIVOT_ORACLE, tags=("aggregate", "pivot"))
def pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — one shuffle; without the
    list Spark needs an extra pass to discover values."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(dsum("value"))
    )


_ARGMAX_ORACLE = """
  SELECT o_orderpriority, best_order, best_price FROM (
    SELECT o_orderpriority, o_orderkey AS best_order,
           o_totalprice AS best_price,
           row_number() OVER (
             PARTITION BY o_orderpriority
             ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                      o_orderkey DESC) AS rn
    FROM orders) WHERE rn = 1
"""


@register("q_agg_argmax", oracle=_ARGMAX_ORACLE, tags=("aggregate", "argmax"))
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max (max_by) per group as a SINGLE-SHUFFLE aggregate:
    max over a (cents, key, payload) struct — lexicographic struct
    comparison gives a deterministic tie-break (unique key second),
    and the shuffle carries one struct per group, not the rows a
    window row_number=1 plan would sort. The scalable per-group
    argmax for 100 TB; the oracle states the same semantics as SQL."""
    o = load_table(spark, sf_dir, "orders")
    best = F.max(
        F.struct(
            cents("o_totalprice").alias("c"),
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("p"),
        )
    ).alias("best")
    return o.groupBy("o_orderpriority").agg(best).select(
        "o_orderpriority",
        F.col("best.k").alias("best_order"),
        F.col("best.p").alias("best_price"),
    )


_APX_PCTS = (0.5, 0.9, 0.99)
_APX_ACC = 10000  # rank error <= n / accuracy


@register(
    "q_agg_approx_percentile",
    oracle="""
      SELECT l_returnflag, count(*) AS n_rows,
             TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
      FROM lineitem
      GROUP BY l_returnflag
    """,
    tags=("aggregate", "approx"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (approx_percentile, Greenwald-Khanna
    style mergeable summaries): the distributed answer to "exact
    percentile needs a global sort" — registered in DECISION FORM
    (VERDICT r8 next #1c) because the returned values are
    engine-specific. Per group the hashed output asserts, for each
    quantile q, the sketch's own contract: the returned value IS an
    element of the group (cnt_le > cnt_lt) whose exact rank lies
    within 2x the configured rank error of q*n. The rank counts are
    computed exactly with a second pass (conditional aggregates
    against the broadcast 3-row percentile frame); the oracle
    recomputes n_rows and states TRUE, so a sketch regression or a
    rank drift flips the hash. tests/test_approx_ops.py keeps the
    direct 2%-of-exact-value assertion.

    Scale shape: pass 1 is the mergeable sketch aggregate (fixed-size
    state per group); pass 2 is a map-side broadcast join + one more
    hash aggregate — no sort, no window, both passes scale-safe."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    apx = F.percentile_approx(
        "l_extendedprice", F.array(*[F.lit(p) for p in _APX_PCTS]), _APX_ACC
    )
    sk = li.groupBy("l_returnflag").agg(
        apx.alias("apx"), F.count(F.lit(1)).alias("n_rows")
    )
    wide = sk.select(
        "l_returnflag",
        "n_rows",
        *[F.element_at("apx", i + 1).alias(f"a{i}") for i in range(len(_APX_PCTS))],
    )
    j = li.join(F.broadcast(wide), "l_returnflag")
    cnt_cols = []
    for i in range(len(_APX_PCTS)):
        cnt_cols.append(
            F.sum(
                F.when(F.col("l_extendedprice") < F.col(f"a{i}"), 1).otherwise(0)
            ).alias(f"lt{i}")
        )
        cnt_cols.append(
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col(f"a{i}"), 1).otherwise(0)
            ).alias(f"le{i}")
        )
    ranks = j.groupBy("l_returnflag", "n_rows").agg(*cnt_cols)
    slack = 2.0 * F.col("n_rows") / _APX_ACC + 1.0
    oks = [
        (
            (F.col(f"le{i}") > F.col(f"lt{i}"))  # an actual element
            & (F.col(f"le{i}") >= p * F.col("n_rows") - slack)
            & (F.col(f"lt{i}") <= p * F.col("n_rows") + slack)
        ).alias(f"p{int(p * 100)}_ok")
        for i, p in enumerate(_APX_PCTS)
    ]
    return ranks.select("l_returnflag", "n_rows", *oks)
