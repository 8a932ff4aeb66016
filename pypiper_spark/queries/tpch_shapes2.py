"""TPC-H-shaped query pack, second batch: the remaining canonical
decision-support forms (Q2, Q6, Q9, Q11, Q16, Q20 shapes), adapted to
the driver's reduced schemas — there is no partsupp table, so the
part<->supplier relation and all cost/stock figures derive from
lineitem (the shapes keep the original plan disciplines: correlated
min, scalar-fraction HAVING, NOT-IN exclusion + distinct count,
nested-aggregate semi join).

The reference (a pipelining micro-framework, SURVEY.md section 2A)
has none of these; they are capability extension per the driver
contract. Scale disciplines, per query, in each docstring; shared
rules:

- nation/region always broadcast (25/5 rows by construction);
  customer/supplier/part join UNHINTED — SF-scaled tables must be
  allowed to degrade from broadcast to shuffle join as they grow
  (the r4/r5 lesson: a forced broadcast of an SF-scaled leg is an
  OOM at 100 TB, removed everywhere).
- Money arithmetic in exact integer cents (compare.py rules 1-2) so
  sums and predicates are partitioning-order-independent.
- Selective dimension filters are applied BEFORE the fact join, so
  the fact table is pruned by the join itself.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pypiper_spark.catalog import load_table
from pypiper_spark.compare import cents, sql_cents
from pypiper_spark.registry import register

# Exact order-independent revenue term: ext*(1-disc) in cents*cents.
_SQL_REV_C = f"{sql_cents('l_extendedprice')} * {sql_cents('1.0 - l_discount')}"


def _rev_c() -> F.Column:
    return cents("l_extendedprice") * cents(F.lit(1.0) - F.col("l_discount"))


@register(
    "q_forecast_revenue",
    oracle="""
      SELECT (CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
              / 10000) AS revenue_increase,
             count(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        AND l_quantity < 24
    """,
    tags=("tpch", "filter", "global-agg"),
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape (forecast revenue change): pure filter + global
    aggregate — the canonical full-pushdown query. The shipdate range
    and quantity bound push to parquet row-group statistics
    (PushedFilters in the scan), the discount band compares exact
    integer cents (a 0.05/0.07 double literal comparison is
    representation-dependent; round(d*100) BETWEEN 5 AND 7 is not),
    and the plan is scan -> partial agg -> single-row exchange ->
    final agg: zero joins, zero hash exchanges, whole-stage codegen
    end to end. At 100 TB this is the I/O-bound floor — the query
    costs exactly one pruned column scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & cents("l_discount").between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(cents("l_extendedprice") * cents("l_discount")).cast("double")
                / 10000
            ).alias("revenue_increase"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_min_cost_supplier",
    oracle="""
      WITH offers AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY 1, 2
      ),
      eu_supp AS (
        SELECT s_suppkey, s_name, n_name FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
      ),
      ranked AS (
        SELECT p_partkey, p_name, s_name, n_name, unit_cost,
               row_number() OVER (PARTITION BY p_partkey
                                  ORDER BY unit_cost, s_suppkey) AS rn
        FROM offers
        JOIN part ON p_partkey = l_partkey AND p_size >= 45
        JOIN eu_supp ON s_suppkey = l_suppkey
      )
      SELECT p_partkey, p_name, s_name, n_name,
             round(unit_cost, 2) AS best_unit_cost
      FROM ranked WHERE rn = 1 ORDER BY p_partkey
    """,
    tags=("tpch", "argmin", "correlated-min"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (minimum-cost supplier): for every large part
    (p_size >= 45), the EUROPE supplier offering it at the lowest
    observed unit price, ties broken by supplier key. Q2's correlated
    MIN subquery is textbook argmin — the oracle spells it as the
    offers-CTE + row_number form, but the Spark plan collapses BOTH
    aggregation levels into one: min over per-supplier minima equals
    min over all rows, so a single groupBy(partkey) with
    min(struct(unit_cost, suppkey, ...)) computes the winner in ONE
    hash exchange with map-side partial min — no window, no second
    shuffle, no offers materialization. The struct's field order
    (unit_cost, then unique suppkey) makes the min deterministic.
    Dimension filters (region via broadcast nation/region onto
    supplier, p_size on part) prune the fact rows in the joins
    themselves; per-row division is IEEE-deterministic so the min is
    exact on both engines. At 100 TB the shuffle moves one partial
    min struct per (partkey, mapper), not offers."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    eu_supp = (
        s.join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg.filter(F.col("r_name") == "EUROPE")),
                    F.col("r_regionkey") == F.col("n_regionkey"),
                )
            ),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    big_parts = p.filter(F.col("p_size") >= 45).select("p_partkey", "p_name")
    best = F.min(
        F.struct(
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("n_name"),
            F.col("p_name"),
        )
    ).alias("best")
    return (
        li.join(eu_supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(big_parts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_partkey")
        .agg(best)
        .select(
            "p_partkey",
            F.col("best.p_name").alias("p_name"),
            F.col("best.s_name").alias("s_name"),
            F.col("best.n_name").alias("n_name"),
            F.round(F.col("best.unit_cost"), 2).alias("best_unit_cost"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q_product_profit",
    oracle=f"""
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             (CAST(sum({_SQL_REV_C}
                        - {sql_cents('p_retailprice')}
                          * CAST(round(l_quantity) AS BIGINT) * 100)
                   AS DOUBLE) / 10000) AS profit
      FROM lineitem
      JOIN part ON p_partkey = l_partkey AND p_name LIKE '%gear%'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON n_nationkey = s_nationkey
      GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("tpch", "multiway-join", "aggregate"),
)
def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-type profit): profit on gear-like parts by
    supplier nation and order year, cost proxied as retailprice *
    quantity (no partsupp/ps_supplycost in this schema). Join order
    is chosen for pruning: the part name filter (~13% of parts)
    joins FIRST so ~87% of lineitem drops before the expensive
    orderkey join against orders; supplier then nation (broadcast)
    attach the grouping key; orders joins LAST so the fact-fact
    exchange pair moves only surviving rows. Profit is an exact
    cents-scale difference (rev at 10^4, cost promoted 10^2 -> 10^4)
    so the sum is order-independent. part/supplier join UNHINTED
    (SF-scaled); at 100 TB the orderkey exchange is the floor — the
    same family as q_join_multiway's documented local bound."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")
    gear = p.filter(F.col("p_name").like("%gear%")).select("p_partkey", "p_retailprice")
    cost_c = (
        cents("p_retailprice") * F.round(F.col("l_quantity")).cast("long") * F.lit(100)
    )
    return (
        li.join(gear, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg((F.sum(_rev_c() - cost_c).cast("double") / 10000).alias("profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "q_important_stock",
    oracle=f"""
      WITH asia_supp AS (
        SELECT s_suppkey FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA'
      ),
      val AS (
        SELECT l_partkey AS p_partkey,
               CAST(sum({_SQL_REV_C}) AS BIGINT) AS value_c
        FROM lineitem JOIN asia_supp ON s_suppkey = l_suppkey
        GROUP BY 1
      )
      SELECT p_partkey, CAST(value_c AS DOUBLE) / 10000 AS part_value
      FROM val
      WHERE value_c * (SELECT count(*) FROM val)
            > 2 * (SELECT sum(value_c) FROM val)
      ORDER BY part_value DESC, p_partkey
    """,
    tags=("tpch", "scalar-subquery", "having"),
)
def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (important stock): per-part traded value restricted
    to ASIA suppliers, keeping parts whose value exceeds 2x the mean
    — Q11's HAVING > (scalar fraction subquery), made scale-invariant
    (a fixed fraction like Q11's 0.0001 flips from selecting nothing
    to selecting everything as the part count scales; 2x-mean selects
    the same tail shape at every SF). The Spark plan is the
    q_subquery_scalar discipline: aggregate once, derive the 1-row
    (count, total) aggregate FROM THE CACHED per-part aggregate, and
    broadcast-cross-join it back as the filter — the predicate
    value_c * n > 2 * total is exact integer arithmetic, so the
    survivor set is identical on any partitioning. The fact table is
    pruned by the ASIA supplier join (broadcast-joined small key set)
    before its one shuffle. At 100 TB the per-part aggregate is the
    only fact-sized exchange; the scalar pass reads the (cached)
    part-grain aggregate, which is |part|-sized, not |lineitem|."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    asia_supp = s.join(
        F.broadcast(
            nat.join(
                F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
                F.col("r_regionkey") == F.col("n_regionkey"),
            )
        ),
        F.col("n_nationkey") == F.col("s_nationkey"),
    ).select("s_suppkey")
    val = (
        li.join(asia_supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_rev_c()).alias("value_c"))
    )
    # Persisted because it feeds BOTH the scalar aggregate and the
    # filter scan; lifetime owned by the caller per the persist policy
    # in session.py (release_query_caches).
    val = val.persist()
    glob = val.agg(F.count(F.lit(1)).alias("_n"), F.sum("value_c").alias("_total"))
    return (
        val.crossJoin(F.broadcast(glob))
        .filter(F.col("value_c") * F.col("_n") > 2 * F.col("_total"))
        .select(
            "p_partkey",
            (F.col("value_c").cast("double") / 10000).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@register(
    "q_supplier_part_counts",
    oracle="""
      SELECT p_brand, p_type, p_size,
             count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        AND p_brand <> 'Brand#5'
        AND p_size IN (1, 9, 19, 29, 49)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "anti-join", "distinct-count"),
)
def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (supplier-part relationship counts): distinct
    suppliers able to supply each (brand, type, size) bucket,
    excluding low-balance suppliers (standing in for Q16's
    '%Customer%Complaints%' — this schema has no comment column) and
    one brand. The part<->supplier relation comes from lineitem.
    Q16's NOT IN runs as a LEFT ANTI join against the (tiny,
    broadcast) exclusion keys — suppkeys are non-null so the
    anti-join is exactly NOT IN; the selective part filter (~10% of
    sizes) joins BEFORE the aggregate so excluded rows never reach
    the shuffle. count(DISTINCT) over the raw joined rows equals
    Q16's distinct-pair-relation count (the group key subsumes the
    part grain), so no pre-distinct materialization is needed —
    Spark plans it as the two-phase partial-distinct aggregate,
    which at 100 TB moves (bucket, suppkey) pairs once rather than
    the fact rows twice."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 1000).select("s_suppkey")
    pf = p.filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 9, 19, 29, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(pf, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q_excess_suppliers",
    oracle="""
      WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(round(l_quantity) AS BIGINT)) AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_name LIKE '%bolt%'
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
      ),
      dominant AS (
        SELECT DISTINCT l_suppkey FROM (
          SELECT l_suppkey, qty,
                 sum(qty) OVER (PARTITION BY l_partkey) AS part_total
          FROM shipped
        ) WHERE qty * 10 > part_total * 3
      )
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON n_nationkey = s_nationkey
      WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
      ORDER BY s_suppkey
    """,
    tags=("tpch", "semi-join", "nested-agg"),
)
def excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (dominant suppliers): suppliers who shipped more
    than 30% of a bolt-like part's 1996 volume — Q20's nested
    quantity-threshold subquery, with availqty replaced by the
    part's total shipped volume (no partsupp here). The inner
    aggregate groups at (part, supplier) grain with exact integer
    quantities; the 30% threshold is a window SUM over the part
    partition compared in cross-multiplied integers (qty*10 >
    total*3 — no float division anywhere), so dominance is
    partitioning-independent. The qualifying key set then drives a
    LEFT SEMI join into supplier (Q20's IN) and nation broadcasts
    on. At 100 TB: the fact table is pruned by the part-name join
    and the date pushdown before its one aggregate shuffle; the
    window runs over the (part, supplier)-grain aggregate — tiny
    relative to the fact — and the semi join moves only supplier
    keys."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    bolts = p.filter(F.col("p_name").like("%bolt%")).select("p_partkey")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(bolts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_total", F.sum("qty").over(w))
        .filter(F.col("qty") * 10 > F.col("part_total") * 3)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "semi")
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "q_local_supplier_volume",
    oracle=f"""
      SELECT n_name AS nation,
             (CAST(sum({_SQL_REV_C}) AS DOUBLE) / 10000) AS revenue,
             count(*) AS n_lines
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      JOIN nation ON n_nationkey = c_nationkey
      JOIN region ON r_regionkey = n_regionkey AND r_name = 'ASIA'
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1 ORDER BY revenue DESC, nation
    """,
    tags=("tpch", "multiway-join", "colocated-dim"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape (local supplier volume): revenue on lines where the
    supplier sits in the customer's own nation, for ASIA customers in
    one order year. The distinguishing discipline is the
    NON-KEY equality arm s_nationkey = c_nationkey riding on the
    supplier equi join — Catalyst keeps it inside the hash join as a
    residual condition, never a post-join filter over a wider
    product. Join order prunes earliest: orders filtered by the
    pushed date range joins the region-restricted customers first
    (~1/5 survive), lineitem joins the surviving orders (fact-fact
    orderkey exchange — the documented local floor family), supplier
    last. nation/region broadcast (bounded); customer/supplier
    UNHINTED. Revenue in exact cents; DESC order tie-broken by
    nation so the sort is total."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    asia_cust = c.join(
        F.broadcast(
            nat.join(
                F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
                F.col("r_regionkey") == F.col("n_regionkey"),
            )
        ),
        F.col("n_nationkey") == F.col("c_nationkey"),
    ).select("c_custkey", "c_nationkey", "n_name")
    o_year = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    return (
        o_year.join(asia_cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            (F.sum(_rev_c()).cast("double") / 10000).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.desc("revenue"), "nation")
    )


@register(
    "q_late_shipment_priority",
    oracle="""
      SELECT l_returnflag,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1 ORDER BY 1
    """,
    tags=("tpch", "join", "conditional-agg"),
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipping-mode priority, adapted — no
    shipmode/receiptdate here): among 1997 lines shipped more than
    90 days after their order date, how many belonged to
    high-priority vs low-priority orders, per return flag. Keeps
    Q12's two disciplines: the late predicate references BOTH sides
    (l_shipdate vs o_orderdate + interval) so it evaluates inside
    the join as a residual — only the single-side shipdate year
    range pushes to the lineitem scan — and the priority split is a
    branch-free conditional SUM pair in one aggregate pass (never
    two filtered subqueries re-joined). The orderkey exchange pair
    is the same local floor as every lineitem x orders join;
    timestamp + INTERVAL arithmetic is exact microseconds on both
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )
