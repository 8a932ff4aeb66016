"""TPC-H-shaped complex query pack: the canonical decision-support
forms not yet covered elsewhere (Q4, Q7, Q10, Q13, Q14, Q18, Q19, Q22
shapes, adapted to the driver's reduced schemas).

The reference (a pipelining micro-framework, SURVEY.md section 2A)
has none of these; they are capability extension per the driver
contract. Each is written the way it should run at 100 TB:

- small dimensions (part, nation, customer at these ratios) joined via
  broadcast so the fact table never shuffles for the join;
- aggregate-before-join where the grouping key is the join key
  (Q13/Q18), so the shuffle moves group counts, not raw rows;
- top-N via exact integer-cents ranking (compare.py), so the limit
  cuts at a deterministic edge on any partitioning;
- EXISTS / NOT EXISTS as semi/anti joins (Catalyst's own rewrite),
  never correlated per-row subplans.

Money arithmetic follows compare.py rules 1-2 (exact cents).
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pypiper_spark.catalog import load_table
from pypiper_spark.compare import cents, sql_cents
from pypiper_spark.registry import register

# Exact order-independent revenue sum: ext*(1-disc) in cents*cents.
_SQL_REV = f"(CAST(sum({sql_cents('l_extendedprice')} * {sql_cents('1.0 - l_discount')}) AS DOUBLE) / 10000)"


def _rev_cents() -> F.Column:
    """ext*(1-disc) as an exact cents*cents long (scale 10^4)."""
    return cents("l_extendedprice") * cents(F.lit(1.0) - F.col("l_discount"))


@register(
    "q_promo_revenue",
    oracle=f"""
      SELECT round(
               100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                     THEN {sql_cents('l_extendedprice')} * {sql_cents('1.0 - l_discount')}
                                     ELSE 0 END) AS DOUBLE)
               / CAST(sum({sql_cents('l_extendedprice')} * {sql_cents('1.0 - l_discount')}) AS DOUBLE),
               6) AS promo_revenue_pct
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    tags=("tpch", "join", "conditional-agg"),
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional aggregation over a fact-dim join. The
    month filter pushes to parquet row groups; part is joined
    UNHINTED — it grows with the scale factor, so the planner (static
    size estimate + AQE) picks the broadcast while part fits the
    64 MB threshold and degrades gracefully to a shuffle join beyond
    it, instead of a hard hint OOMing the executors at 100 TB. At
    bench scales the chosen plan is scan -> broadcast hash join ->
    single global agg (no shuffle of lineitem at all). The
    promo/total ratio divides two exact cent sums, so round(.,6) is
    stable on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = _rev_cents()
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast(
                    "double"
                )
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q_custdist",
    oracle="""
      SELECT c_count, count(*) AS custdist
      FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
      )
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "outer-join", "double-agg"),
)
def custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: customer order-count distribution via outer join with
    an extra join-side predicate, then a second aggregation over the
    first's result. At scale: count orders per custkey FIRST (shuffle
    moves one row per customer, not per order), then the left join is
    dim-sized on both sides; the final distribution agg is tiny."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        o.filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    counts = (
        c.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select("c_custkey", F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q_order_priority",
    oracle="""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders o
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """,
    tags=("tpch", "semi-join"),
)
def order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS with a correlated non-equi residual (shipped
    >30 days after order date), counted by priority. Expressed as a
    left-semi join — equi on orderkey carries the shuffle, the date
    comparison rides along as a join residual, so it scales like any
    key-partitioned join rather than a per-row subquery."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_returned_revenue",
    oracle=f"""
      SELECT c_custkey, c_name, n_name,
             (CAST(rev_cents AS DOUBLE) / 10000) AS revenue,
             c_acctbal
      FROM (
        SELECT c_custkey, c_name, n_name, c_acctbal,
               sum({sql_cents('l_extendedprice')} * {sql_cents('1.0 - l_discount')}) AS rev_cents
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name, c_acctbal
      )
      ORDER BY rev_cents DESC, c_custkey
      LIMIT 20
    """,
    tags=("tpch", "join", "topn"),
)
def returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returns, top 20 customers. The rank
    key is the exact integer-cents revenue (ties broken by custkey),
    so the LIMIT edge is deterministic on any partitioning — ranking
    rounded doubles here is the classic oracle-mismatch trap
    (compare.py rule: round/exact BEFORE any rank or filter).
    nation keeps its broadcast hint (25 rows by construction);
    customer joins unhinted — it is SF-scaled, so the planner
    broadcasts it while small and shuffle-joins it at 100 TB. The one
    unavoidable shuffle is the group-by on custkey."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(_rev_cents()).alias("rev_cents"))
        .orderBy(F.desc("rev_cents"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            (F.col("rev_cents").cast("double") / 10000).alias("revenue"),
            "c_acctbal",
        )
    )


@register(
    "q_large_orders",
    oracle=f"""
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             (CAST(qty_cents AS DOUBLE) / 100) AS sum_qty
      FROM (
        SELECT l_orderkey, sum({sql_cents('l_quantity')}) AS qty_cents
        FROM lineitem GROUP BY l_orderkey
        HAVING sum({sql_cents('l_quantity')}) > 30000
      )
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100
    """,
    tags=("tpch", "having", "topn"),
)
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds 300, with their
    customers, largest first. Aggregate lineitem to per-order quantity
    FIRST (the HAVING prunes ~99% of orders before any join), then
    join the survivors — at 100 TB the join input is the filtered
    aggregate, not the fact table. customer joins unhinted (SF-scaled
    side: the planner broadcasts it only while it fits). o_totalprice
    is a stored 2-decimal column, so ranking on it directly is
    exact."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents("l_quantity")).alias("qty_cents"))
        .filter(F.col("qty_cents") > 30000)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            (F.col("qty_cents").cast("double") / 100).alias("sum_qty"),
        )
    )


@register(
    "q_disjunctive_join",
    oracle=f"""
      SELECT {_SQL_REV} AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 21)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
             AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("tpch", "join", "disjunctive"),
)
def disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of conjunctive predicates spanning both
    join sides. Kept as an equi join on partkey with the OR as a
    post-join filter: Catalyst derives the implied single-side
    prefilters (brand IN (...), quantity <= 50) and pushes them to
    the scans, while the cross-side residual evaluates after the
    (planner-chosen, unhinted — part is SF-scaled) hash join — the
    shape that stays a hash join at 100 TB instead of degrading to a
    nested loop."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    disj = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 21))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 30))
        | ((b == "Brand#34") & s.between(1, 35) & q.between(20, 50))
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(disj)
        .agg((F.sum(_rev_cents()).cast("double") / 10000).alias("revenue"))
    )


@register(
    "q_dormant_customers",
    oracle="""
      SELECT c_nationkey,
             count(*) AS numcust,
             (CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100)
               AS totacctbal
      FROM customer c
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY c_nationkey
      ORDER BY c_nationkey
    """,
    tags=("tpch", "anti-join", "scalar-subquery"),
)
def dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape, adapted (every customer has some order in this data,
    so 'dormant' = no order since 2000): above-average-balance
    customers with no recent orders, by nation. The scalar subquery
    is computed once and broadcast as a literal-like crossjoin (one
    row); NOT EXISTS is a left-anti join on custkey. The avg filter
    compares raw doubles — identical single values on both engines,
    no reduction ordering involved (avg itself is computed over the
    same rows in one pass; at these magnitudes the double sum is
    exact per compare.py rule 1's cents bound)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # Exact order-independent average: cents sum / count, like davg.
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(cents("c_acctbal")).cast("double") / 100 / F.count("c_acctbal")).alias("avg_bal")
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(cents("c_acctbal")).cast("double") / 100).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q_nation_volume",
    oracle=f"""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             {_SQL_REV} AS revenue,
             count(*) AS n_lines
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_11', 'NATION_19')
        AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_11', 'NATION_19')
        AND n1.n_name <> n2.n_name
      GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
      ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "multiway-join", "self-dim"),
)
def nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: cross-nation trade volume by year, with the nation
    dimension joined twice under different roles (supplier side vs
    customer side). The nation copies keep broadcast hints (25 rows
    by construction); supplier and customer join UNHINTED — both are
    SF-scaled (billions of rows at TPC-H sf100k), so the planner
    broadcasts them while they fit 64 MB and shuffle-joins beyond.
    Filtering each nation copy to the trade set BEFORE its join turns
    the dim joins into selective semi-filters on the fact rows, so
    only matching lineitem rows reach the final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    # four nations, not Q7's two: the sf0.001 slice has no
    # NATION_1<->NATION_2 trade at all, and a query that returns zero
    # rows at a checked scale factor is vacuously green (verified
    # non-empty at sf0.001/0.01/0.1 with this set)
    trade_nations = ("NATION_1", "NATION_2", "NATION_11", "NATION_19")
    n1 = nat.filter(F.col("n_name").isin(*trade_nations)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.filter(F.col("n_name").isin(*trade_nations)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            (F.sum(_rev_cents()).cast("double") / 10000).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q_market_share",
    oracle=f"""
      WITH cust_asia AS (
        SELECT c_custkey FROM customer
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA'
      ),
      supp_nat AS (
        SELECT s_suppkey, n_name AS supp_nation FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
      ),
      rev AS (
        SELECT year(o_orderdate) AS o_year,
               sn.supp_nation,
               {sql_cents('l_extendedprice')} * {sql_cents('1.0 - l_discount')} AS rc
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN cust_asia ON c_custkey = o_custkey
        JOIN supp_nat sn ON sn.s_suppkey = l_suppkey
      )
      SELECT o_year,
             round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rc ELSE 0 END)
                        AS DOUBLE)
                   / CAST(sum(rc) AS DOUBLE), 6) AS mkt_share,
             (CAST(sum(rc) AS DOUBLE) / 10000) AS total_revenue
      FROM rev GROUP BY o_year
    """,
    tags=("tpch", "join", "aggregate"),
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): for every order year,
    NATION_3's share of revenue supplied into the ASIA customer
    region.

    Scale shape: ALL dimension legs collapse to keys/labels before
    touching the fact — customer x nation x region reduces to a
    key-only semi side (ASIA custkeys) that prunes ORDERS before the
    fact join, supplier x nation to a (suppkey -> nation) map. Both
    collapsed legs are UNHINTED (the r4 discipline: they are
    SF-scaled, so the planner broadcasts while they fit and
    shuffle-joins at 100 TB; a forced broadcast OOMs the driver
    eventually). The one fact-fact exchange pair — pruned orders vs
    lineitem on orderkey — is the same shape family as
    q_join_multiway and shares its measured local floor. The share is
    a ratio of two exact integer-cents sums, so the division is
    bit-identical on both engines at any partitioning."""
    c = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust_asia = (
        c.join(F.broadcast(nat), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nat = s.join(
        F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rc = _rev_cents()
    # semi-prune orders to ASIA customers BEFORE the fact join: the
    # orderkey join's build side shrinks to the region's share of
    # orders, and the semi join moves keys only
    o_asia = o.join(
        cust_asia, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("o_orderkey", "o_orderdate")
    rev = (
        li.join(o_asia, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supp_nat, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            "supp_nation",
            rc.alias("rc"),
        )
    )
    return rev.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("rc")).otherwise(0))
            .cast("double")
            / F.sum("rc").cast("double"),
            6,
        ).alias("mkt_share"),
        (F.sum("rc").cast("double") / 10000).alias("total_revenue"),
    )


@register(
    "q_top_supplier",
    oracle=f"""
      WITH srev AS (
        SELECT l_suppkey,
               sum({sql_cents('l_extendedprice')} * {sql_cents('1.0 - l_discount')})
                 AS rc
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
      )
      SELECT s_suppkey, s_name,
             (CAST(rc AS DOUBLE) / 10000) AS total_revenue
      FROM srev JOIN supplier ON s_suppkey = l_suppkey
      WHERE rc = (SELECT max(rc) FROM srev)
    """,
    tags=("tpch", "aggregate", "subquery"),
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) with maximum
    revenue in a 3-month ship window, via a scalar max subquery over
    the same aggregate (ALL ties kept — the TPC-H-specified
    semantics, which a LIMIT 1 would get wrong).

    Scale shape: the window filter pushes to the parquet scan; the
    per-supplier aggregate is one map-side-combined shuffle
    (|suppliers| rows out); the max is a 1-row broadcast back onto
    that aggregate (Spark plans the reuse, no second lineitem scan);
    the name join is a broadcast dim. Revenue compares in exact
    integer cents, so 'equal to the max' is well-defined — a double
    comparison could drop a tie at one partitioning and keep it at
    another."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    srev = li.groupBy("l_suppkey").agg(F.sum(_rev_cents()).alias("rc"))
    mx = srev.agg(F.max("rc").alias("mx"))
    return (
        srev.join(F.broadcast(mx), F.col("rc") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rc").cast("double") / 10000).alias("total_revenue"),
        )
    )


@register(
    "q_small_qty_revenue",
    oracle=f"""
      WITH pq AS (
        SELECT l_partkey,
               sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sq,
               count(*) AS n
        FROM lineitem GROUP BY l_partkey
      )
      SELECT (CAST(sum({sql_cents('l.l_extendedprice')}) AS DOUBLE) / 700)
               AS avg_yearly
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN pq ON pq.l_partkey = l.l_partkey
      WHERE p.p_size < 10
        AND 5 * CAST(round(l.l_quantity * 100) AS BIGINT) * pq.n < pq.sq
    """,
    tags=("tpch", "join", "subquery"),
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): yearly revenue
    lost if orders below 20% of a part's average quantity were not
    taken, over small parts (p_size < 10).

    The correlated 'qty < 0.2 * avg(qty) per part' predicate is
    CROSS-MULTIPLIED into exact integers (5*qty*n < sum_qty in cents)
    — the avg-as-double form can flip rows at the boundary between
    engines; the integer form cannot. Scale shape: the per-part
    (sum, count) aggregate is one map-side-combined shuffle keyed on
    the SAME column as the following join (partitioning reused, AQE
    plans no extra exchange); part is a broadcast dim; the final
    global sum is a 1-row reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10).select("p_partkey")
    qc = cents("l_quantity")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(qc).alias("sq"), F.count(F.lit(1)).alias("n")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pq_partkey") == F.col("l_partkey"))
        .filter(F.lit(5) * qc * F.col("n") < F.col("sq"))
        .agg((F.sum(cents("l_extendedprice")).cast("double") / 700).alias("avg_yearly"))
    )


@register(
    "q_lonely_returned_supplier",
    oracle="""
      WITH r_lines AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        WHERE l_returnflag = 'R'
      ),
      all_supp AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      ),
      lonely AS (
        SELECT r.l_orderkey, r.l_suppkey FROM r_lines r
        WHERE EXISTS (
          SELECT 1 FROM all_supp a
          WHERE a.l_orderkey = r.l_orderkey AND a.l_suppkey <> r.l_suppkey
        )
        AND NOT EXISTS (
          SELECT 1 FROM r_lines r2
          WHERE r2.l_orderkey = r.l_orderkey AND r2.l_suppkey <> r.l_suppkey
        )
      )
      SELECT s_name, count(*) AS n_lonely
      FROM lonely JOIN supplier ON s_suppkey = l_suppkey
      GROUP BY s_name
      ORDER BY n_lonely DESC, s_name
      LIMIT 20
    """,
    tags=("tpch", "join", "semi", "anti"),
)
def lonely_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept waiting, adapted to this
    schema's columns): suppliers who were the ONLY supplier with
    returned ('R') lines in a multi-supplier order — the
    EXISTS(other supplier) + NOT EXISTS(other supplier also failed)
    double-correlated form, Q21's defining structure.

    Scale shape: both correlated subqueries become key-only
    semi/anti joins on (orderkey collapsed to DISTINCT (order,
    supplier) first — the fact never self-joins at line grain).
    'Another supplier in this order' is decided with per-order
    aggregates broadcast-joined back (n_supp >= 2, n_r_supp = 1)
    instead of literal self-joins: one extra groupBy on a key the
    data is already shuffled on, zero fanout. Top-20 with a full
    deterministic tiebreak (count desc, name)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    all_supp = li.select("l_orderkey", "l_suppkey").distinct()
    r_supp = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    per_order = all_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    r_per_order = r_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_r_supp")
    )
    lonely = (
        r_supp.join(per_order, "l_orderkey")
        .join(r_per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
    )
    return (
        lonely.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_lonely"))
        .orderBy(F.desc("n_lonely"), "s_name")
        .limit(20)
    )


@register(
    "q_customer_rfm",
    oracle=f"""
      WITH per_cust AS (
        SELECT o_custkey,
               date_diff('day', CAST(max(o_orderdate) AS DATE),
                         DATE '2001-09-01') AS recency_days,
               count(*) AS frequency,
               sum({sql_cents('o_totalprice')}) AS monetary_c
        FROM orders GROUP BY o_custkey
      ),
      b AS (
        SELECT quantile_cont(recency_days, 0.25) AS r25,
               quantile_cont(recency_days, 0.50) AS r50,
               quantile_cont(recency_days, 0.75) AS r75,
               quantile_cont(frequency, 0.25) AS f25,
               quantile_cont(frequency, 0.50) AS f50,
               quantile_cont(frequency, 0.75) AS f75,
               quantile_cont(monetary_c, 0.25) AS m25,
               quantile_cont(monetary_c, 0.50) AS m50,
               quantile_cont(monetary_c, 0.75) AS m75
        FROM per_cust
      )
      SELECT CAST(1 + CAST(recency_days > r25 AS INT)
                    + CAST(recency_days > r50 AS INT)
                    + CAST(recency_days > r75 AS INT) AS INT) AS r_tile,
             CAST(1 + CAST(frequency < f75 AS INT)
                    + CAST(frequency < f50 AS INT)
                    + CAST(frequency < f25 AS INT) AS INT) AS f_tile,
             CAST(1 + CAST(monetary_c < m75 AS INT)
                    + CAST(monetary_c < m50 AS INT)
                    + CAST(monetary_c < m25 AS INT) AS INT) AS m_tile,
             count(*) AS n_customers
      FROM per_cust, b
      GROUP BY 1, 2, 3
    """,
    tags=("tpch", "segmentation"),
)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quartiles), the warehouse-classic behavioral cut: per customer,
    days since last order (vs the fixed corpus horizon), order count,
    exact-cents lifetime spend; each dimension quartiled by BOUNDARY
    (exact interpolated quartile cuts, ties share a tile), segments
    reported as quartile-triple counts.

    This was the repo's last global-sort plan (r5 verdict): the prior
    ntile form pushed every customer through one sort partition per
    metric. Boundary assignment replaces it — the three quartile cuts
    per metric are ONE tiny 9-value aggregate, broadcast back, and
    tiles assigned map-side; no Window node anywhere in the plan
    (plan-tested). Tie semantics change with it, deliberately:
    equal-valued customers now land in the SAME tile (boundary
    quartiles), where ntile split them by the custkey tiebreak —
    for segmentation the boundary form is the defensible one, and
    the oracle states it.

    Determinism: quartiles of INTEGERS (days / counts / cents)
    interpolate at dyadic factors, so the cuts are exactly
    representable doubles and every boundary comparison is exact on
    both engines — the q_outlier_iqr discipline. Scale shape: orders
    collapse to per-customer rows first (one map-side-combined
    shuffle); the exact-percentile state is value-domain-bounded
    (days and counts collapse hard; monetary cents are the wide one —
    at extreme customer counts swap the documented
    approx_percentile boundary lookup, q_agg_approx_percentile)."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2001-09-01").cast("date"),
            F.max("o_orderdate").cast("date"),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents("o_totalprice")).alias("monetary_c"),
    )
    # per_cust is consumed twice (bounds + tiles) UNPERSISTED, on
    # purpose: caching it measured SLOWER at the 100x corpus (5.5 s vs
    # 4.4 s — materializing 1.5M rows to storage costs more than
    # re-running a page-cached scan + map-side-combined agg).
    bounds = per_cust.agg(
        *[
            F.percentile(col, F.lit(q)).alias(f"{al}{int(q * 100)}")
            for col, al in (
                ("recency_days", "r"),
                ("frequency", "f"),
                ("monetary_c", "m"),
            )
            for q in (0.25, 0.50, 0.75)
        ]
    )

    def tile_asc(v: str, lo: str, mid: str, hi: str):
        return (
            F.lit(1)
            + (F.col(v) > F.col(lo)).cast("int")
            + (F.col(v) > F.col(mid)).cast("int")
            + (F.col(v) > F.col(hi)).cast("int")
        ).cast("int")

    def tile_desc(v: str, lo: str, mid: str, hi: str):
        return (
            F.lit(1)
            + (F.col(v) < F.col(hi)).cast("int")
            + (F.col(v) < F.col(mid)).cast("int")
            + (F.col(v) < F.col(lo)).cast("int")
        ).cast("int")

    tiled = per_cust.crossJoin(F.broadcast(bounds)).select(
        tile_asc("recency_days", "r25", "r50", "r75").alias("r_tile"),
        tile_desc("frequency", "f25", "f50", "f75").alias("f_tile"),
        tile_desc("monetary_c", "m25", "m50", "m75").alias("m_tile"),
    )
    return tiled.groupBy("r_tile", "f_tile", "m_tile").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "q_order_gaps",
    oracle="""
      WITH seq AS (
        SELECT o.o_custkey, c.c_mktsegment,
               date_diff('day',
                         CAST(lag(o.o_orderdate) OVER (
                           PARTITION BY o.o_custkey
                           ORDER BY o.o_orderdate, o.o_orderkey) AS DATE),
                         CAST(o.o_orderdate AS DATE)) AS gap_days
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      )
      SELECT c_mktsegment,
             count(*) AS n_gaps,
             min(gap_days) AS min_gap,
             max(gap_days) AS max_gap,
             round(avg(gap_days), 6) AS avg_gap_days
      FROM seq WHERE gap_days IS NOT NULL
      GROUP BY c_mktsegment
    """,
    tags=("tpch", "window", "timeseries"),
)
def order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap statistics per market segment: days between a
    customer's consecutive orders (lag window per customer, orderkey
    tiebreak on same-day orders), summarized per segment — the
    repeat-purchase-cadence signal churn models start from.

    Scale shape: the lag window partitions by customer (data-scaled
    key, no global-order pinch); gaps are exact integer day diffs, so
    only the final avg is float (rounded 6dp over an integer sum —
    effectively exact: sum and count are both integers, the division
    is one float op). The segment join is a broadcast dim at any
    scale (customer is the window side, segment rides along)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_mktsegment",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate")).over(w).cast("date"),
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return seq.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_days").alias("min_gap"),
        F.max("gap_days").alias("max_gap"),
        F.round(F.avg("gap_days"), 6).alias("avg_gap_days"),
    )
