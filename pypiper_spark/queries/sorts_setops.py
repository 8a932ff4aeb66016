"""Sorts, limits, sampling, set operations, exact dedup (SURVEY.md 2B).

The driver's value-hash is order-insensitive, so sort queries encode
their order as a row_number column — the *content* proves the sort.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pypiper_spark.catalog import load_table
from pypiper_spark.registry import register


@register(
    "q_sort_multi",
    oracle="""
      SELECT o_orderkey, status_np, o_totalprice,
             row_number() OVER (ORDER BY status_np ASC NULLS LAST,
                                o_totalprice DESC, o_orderkey) AS sort_pos
      FROM (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_np, o_totalprice
            FROM orders WHERE o_totalprice > 400000.0)
    """,
    tags=("sort",),
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort incl. NULLS LAST, encoded as sort_pos so the
    order-insensitive hash still verifies ordering. The global window
    is the point of a total sort (single-partition by definition);
    the input is pre-filtered small."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    t = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_np"),
        "o_totalprice",
    )
    w = Window.orderBy(
        F.asc_nulls_last("status_np"), F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return t.withColumn("sort_pos", F.row_number().over(w)).orderBy("sort_pos")


@register(
    "q_limit_topk",
    oracle="""
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 100
    """,
    tags=("sort", "limit"),
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: compiles to TakeOrderedAndProject — per-partition
    heaps + driver merge of k rows, never a full sort of 100 TB."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(100)
    )


def _sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual seeded Bernoulli sample (tests assert on this frame;
    the registered query wraps it in decision form)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .sample(fraction=0.1, seed=42)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@register(
    "q_sample",
    oracle="""
      SELECT count(*) AS n_source,
             round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   / count(*) / 100.0, 2) AS source_avg_price,
             TRUE AS frac_ok, TRUE AS subset_ok, TRUE AS mean_price_ok
      FROM lineitem
    """,
    tags=("sample", "approx"),
)
def sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample, registered in DECISION FORM (the
    sketch-query discipline from q_agg_approx_*): the row set is
    Spark-specific (per-partition RNG), so the hashed output carries
    the exact source count and mean price plus booleans asserting the
    sample's contract — sampled count within 4 sigma of the 10%
    binomial, MULTISET containment (each row drawn at most as many
    times as it appears in the source — sampling without replacement
    can never inflate a row's multiplicity; the raw lineitem is not
    unique on (orderkey, linenumber), so a distinct-count check would
    be corpus-fragile), and the sample mean price within 5% of the
    population mean. The oracle recomputes the exact columns and
    states TRUE; a sampler regression (fraction drift, row
    duplication, biased draw) flips the hash. tests/test_approx_ops.py
    keeps direct bounds on the raw sampled frame via _sample_rows.

    Scale shape: the sample is a map-only scan; the decision wrap
    adds per-row-value hash aggregates on both sides and an equi-join
    on the sampled keys — all shuffle-partitioned by the row value,
    no driver-side work beyond the 1-row final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    key = ["l_orderkey", "l_linenumber", "l_extendedprice"]
    samp = _sample_rows(spark, sf_dir)
    src = li.agg(
        F.count(F.lit(1)).alias("n_source"),
        F.avg("l_extendedprice").alias("src_avg"),
        # exact integer-cents sum: both engines sum identical bigints, so
        # the derived average is a pure function of (sum, count) — immune
        # to the last-ulp double-summation-order differences that can flip
        # a round(avg(double), 2) at a .005 boundary
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "src_cents"
        ),
    )
    # multiset containment: multiplicity in the sample never exceeds
    # multiplicity in the source, for any row value
    samp_m = samp.groupBy(*key).agg(F.count(F.lit(1)).alias("m_samp"))
    src_m = li.select(*key).groupBy(*key).agg(F.count(F.lit(1)).alias("m_src"))
    contained = samp_m.join(src_m, key, "left").agg(
        F.min(
            (F.col("m_samp") <= F.coalesce(F.col("m_src"), F.lit(0))).cast("int")
        ).alias("all_contained")
    )
    got = samp.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.avg("l_extendedprice").alias("samp_avg"),
    )
    return src.crossJoin(got).crossJoin(contained).select(
        "n_source",
        F.round(F.col("src_cents") / F.col("n_source") / 100.0, 2).alias(
            "source_avg_price"
        ),
        (
            F.abs(F.col("n_sampled") - 0.1 * F.col("n_source"))
            <= 4.0 * F.sqrt(0.1 * 0.9 * F.col("n_source"))
        ).alias("frac_ok"),
        (F.col("all_contained") == 1).alias("subset_ok"),
        (
            F.abs(F.col("samp_avg") - F.col("src_avg")) <= 0.05 * F.col("src_avg")
        ).alias("mean_price_ok"),
    )


_UNION_ALL_ORACLE = """
  SELECT c_custkey AS entity_id, c_name AS name, 'customer' AS kind, c_acctbal AS balance
  FROM customer
  UNION ALL
  SELECT s_suppkey AS entity_id, s_name AS name, 'supplier' AS kind, s_acctbal AS balance
  FROM supplier
"""


@register("q_union_all", oracle=_UNION_ALL_ORACLE, tags=("setop",))
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union by name — no shuffle, plain concatenation of scans."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("balance"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("balance"),
    )
    return c.unionByName(s)


@register(
    "q_union_distinct",
    oracle="""
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT: concat + dedup shuffle on the full row."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "q_intersect",
    oracle="""
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having both finished and open orders (set intersect)."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(op)


@register(
    "q_except",
    oracle="""
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def except_(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): customers with finished orders minus those with open ones."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.subtract(op)


@register(
    "q_intersect_all",
    oracle="""
      SELECT l_suppkey AS suppkey FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    tags=("setop",),
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersect: multiplicity = min of the two sides."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("suppkey"))
    r = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("suppkey"))
    return a.intersectAll(r)


@register(
    "q_except_all",
    oracle="""
      SELECT l_suppkey AS suppkey FROM lineitem WHERE l_returnflag = 'A'
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    tags=("setop",),
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference: multiplicity = max(0, left - right)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("suppkey"))
    r = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("suppkey"))
    return a.exceptAll(r)


@register(
    "q_dedup_exact",
    oracle="""
      SELECT doc_id, lang, source, n_chars FROM (
        SELECT doc_id, lang, source, n_chars,
               row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        FROM documents
      ) WHERE rn = 1
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset dedup with a DETERMINISTIC survivor (min doc_id) —
    dropDuplicates picks an arbitrary row, which can never hash-match
    an oracle (SURVEY.md 5.3); row_number()=1 is the scalable,
    reproducible form of the same one-shuffle plan."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


_STRAT_FRACTIONS = {"F": 0.05, "O": 0.05, "P": 0.5}


def _sample_stratified_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual sampleBy draw (tests assert on this frame; the
    registered query wraps it in decision form)."""
    o = load_table(spark, sf_dir, "orders")
    return o.sampleBy("o_orderstatus", _STRAT_FRACTIONS, seed=42).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@register(
    "q_sample_stratified",
    oracle="""
      SELECT o_orderstatus, count(*) AS n_stratum,
             TRUE AS rate_ok, TRUE AS subset_ok
      FROM orders GROUP BY o_orderstatus
    """,
    tags=("sample", "stratified", "approx"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-stratum) sampling via sampleBy: heavier draw
    from rarer order statuses — the class-rebalancing primitive a
    training-data pipeline uses to reweight sources. Registered in
    DECISION FORM (the draw is seeded but partition-dependent): per
    stratum the hashed output carries the exact stratum size plus
    booleans asserting the contract — sampled count within 5 sigma
    of the configured binomial (floored at 1 for tiny strata) and
    sampled count never exceeding the stratum. The oracle recomputes
    stratum sizes and states TRUE; a rate drift or stratum leak flips
    the hash. tests/test_approx_ops.py keeps the direct per-stratum
    bounds on the raw draw via _sample_stratified_rows.

    Scale shape: the draw is one map-only pass (per-row Bernoulli
    keyed by the stratum column); the decision wrap adds one hash
    aggregate per side joined on the 3-row stratum key."""
    o = load_table(spark, sf_dir, "orders")
    totals = o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_stratum"))
    drawn = (
        _sample_stratified_rows(spark, sf_dir)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_drawn"))
    )
    frac = F.create_map(
        *[F.lit(x) for kv in _STRAT_FRACTIONS.items() for x in kv]
    )[F.col("o_orderstatus")]
    return (
        totals.join(drawn, "o_orderstatus", "left")
        .na.fill({"n_drawn": 0})
        .select(
            "o_orderstatus",
            "n_stratum",
            # coalesce: a stratum absent from _STRAT_FRACTIONS makes the
            # map lookup NULL, which would propagate to NULL (not FALSE)
            # and silently mask drift if orders ever gains a 4th status
            F.coalesce(
                F.abs(F.col("n_drawn") - frac * F.col("n_stratum"))
                <= F.greatest(
                    5.0 * F.sqrt(frac * (1.0 - frac) * F.col("n_stratum")),
                    F.lit(1.0),
                ),
                F.lit(False),
            ).alias("rate_ok"),
            (F.col("n_drawn") <= F.col("n_stratum")).alias("subset_ok"),
        )
    )


_STRAT_N = 10

_STRAT_EXACT_ORACLE = f"""
  WITH ranked AS (
    SELECT doc_id, lang, source, n_chars,
           row_number() OVER (
             PARTITION BY lang, source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS strat_rank
    FROM documents
  )
  SELECT doc_id, lang, source, n_chars, strat_rank
  FROM ranked WHERE strat_rank <= {_STRAT_N}
"""


@register(
    "q_sample_stratified_exact",
    oracle=_STRAT_EXACT_ORACLE,
    tags=("sample", "stratified", "deterministic"),
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-n stratified sampling: precisely 10 documents per
    (lang, source) stratum, chosen in deterministic md5 order — the
    fixed-quota complement to q_sample_stratified's Bernoulli rates
    (rate sampling can't promise "exactly 10 eval docs per cell";
    this can, and reruns pick the same 10).

    Scale shape — the fixed-quota worry is that a per-stratum
    row_number serializes each stratum through one reducer (the
    q_customer_rfm lesson). Spark 4 retires it NATIVELY: a rank
    predicate over a window compiles to WindowGroupLimit in Partial
    mode BEFORE the exchange — every map partition forwards at most
    n rows per stratum, so the per-stratum reducer sees O(partitions
    x n), never the stratum's data. The plan test pins both the
    Partial and Final WindowGroupLimit nodes; a hand-rolled two-phase
    shard window (built first here) produced the identical pruning
    with one extra exchange and was dropped for the engine-native
    form."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    return (
        d.withColumn("strat_rank", F.row_number().over(w))
        .filter(F.col("strat_rank") <= _STRAT_N)
        .select("doc_id", "lang", "source", "n_chars", "strat_rank")
    )
