"""Scalar function packs: string / date / math / array / map / JSON
(SURVEY.md section 2B). All built-in pyspark.sql.functions — JVM-side,
codegen-friendly; zero Python UDFs in this module.

Cross-dialect notes (encoded once here, SURVEY.md 5.3):
- day-of-week: Spark ``weekday()+1`` == DuckDB ``isodow`` (Mon=1..Sun=7);
- DuckDB ``floor``/``sign`` return DOUBLE/TINYINT -> explicit casts;
- transcendental results (ln/exp/pow) round to 8 decimals (libm may
  differ in the last bit between JVM and C);
- date-valued outputs cast to string (engines disagree on date object
  representation in result frames, not on the dates themselves);
- DuckDB ``element_at(map,k)`` returns a LIST -> compare maps via
  keys/values arrays instead.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypiper_spark.catalog import load_table
from pypiper_spark.registry import register


@register(
    "q_str_funcs",
    oracle="""
      SELECT c_custkey,
             upper(c_name) AS name_upper,
             lower(c_mktsegment) AS seg_lower,
             length(c_name) AS name_len,
             substr(c_name, 1, 8) AS name_prefix,
             concat(c_mktsegment, ':', c_name) AS tagged,
             replace(c_name, 'Customer', 'Cust') AS name_short,
             trim(concat('  ', c_name, '  ')) AS name_trimmed,
             lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
             regexp_extract(c_name, '([0-9]+)', 1) AS key_digits,
             regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
             split_part(c_name, '#', 2) AS after_hash,
             starts_with(c_name, 'Customer') AS is_customer,
             contains(c_mktsegment, 'MACH') AS is_mach
      FROM customer
    """,
    tags=("scalar", "string"),
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar pack: case/trim/substring/split/concat/regexp, all JVM-side."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("key_digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("name_masked"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
        F.startswith(F.col("c_name"), F.lit("Customer")).alias("is_customer"),
        F.contains(F.col("c_mktsegment"), F.lit("MACH")).alias("is_mach"),
    )


@register(
    "q_date_funcs",
    oracle="""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(month(o_orderdate) AS INTEGER) AS order_month,
             CAST(day(o_orderdate) AS INTEGER) AS order_day,
             CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
             CAST(isodow(o_orderdate) AS INTEGER) AS order_isodow,
             CAST(dayofyear(o_orderdate) AS INTEGER) AS order_doy,
             date_trunc('month', o_orderdate) AS month_start,
             CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
             CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
             CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INTEGER)
               AS days_to_2002
      FROM orders
    """,
    tags=("scalar", "date"),
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar pack: trunc/extract/diff/add on the midnight-timestamp order dates."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.quarter(d).alias("order_quarter"),
        (F.weekday(d) + F.lit(1)).alias("order_isodow"),
        F.dayofyear(d).alias("order_doy"),
        F.date_trunc("month", d).cast("timestamp_ntz").alias("month_start"),
        F.date_add(d.cast("date"), 30).cast("string").alias("due_date"),
        F.last_day(d.cast("date")).cast("string").alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias("days_to_2002"),
    )


@register(
    "q_math_funcs",
    oracle="""
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice, 1) AS price_r1,
             CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
             abs(l_extendedprice - 50000.0) AS dist_50k,
             CAST(sign(l_extendedprice - 50000.0) AS DOUBLE) AS side_50k,
             round(ln(l_extendedprice), 8) AS price_ln,
             round(sqrt(l_extendedprice), 8) AS price_sqrt,
             round(pow(l_discount, 2), 8) AS disc_sq,
             round(exp(l_discount), 8) AS disc_exp,
             l_orderkey // 100 AS key_bucket,
             l_orderkey % 97 AS key_mod,
             greatest(l_quantity, 25.0) AS qty_floor25,
             least(l_quantity, 25.0) AS qty_cap25
      FROM lineitem
    """,
    tags=("scalar", "math"),
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar pack: rounding modes, ln/exp/sqrt/pow, sign/abs/mod -- rounded where float transcendentals demand it."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(price, 1).alias("price_r1"),
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        F.abs(price - 50000.0).alias("dist_50k"),
        F.signum(price - 50000.0).alias("side_50k"),
        F.round(F.log(price), 8).alias("price_ln"),
        F.round(F.sqrt(price), 8).alias("price_sqrt"),
        F.round(F.pow(F.col("l_discount"), 2), 8).alias("disc_sq"),
        F.round(F.exp("l_discount"), 8).alias("disc_exp"),
        F.expr("l_orderkey div 100").alias("key_bucket"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_floor25"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_cap25"),
    )


@register(
    "q_array_funcs",
    oracle="""
      SELECT vec_id,
             CAST(len(embedding) AS INTEGER) AS dim,
             embedding[1] AS first_val,
             embedding[64] AS last_val,
             list_sort(embedding[1:3])[1] AS head3_min,
             list_sort(embedding[1:3])[2] AS head3_mid,
             list_sort(embedding[1:3])[3] AS head3_max,
             list_reverse_sort(embedding)[1] AS max_val,
             list_contains([CAST(label AS BIGINT), 42], 42) AS has_42,
             array_to_string(list_sort(list_distinct([vec_id % 3, vec_id % 5, vec_id % 3])), ',')
               AS mods
      FROM embeddings
    """,
    tags=("scalar", "array"),
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order functions over the 64-dim embedding column.
    No arithmetic on floats here (stored values compare bit-exact);
    vector math lives in the similarity queries. Array-valued results
    are flattened (float elements, bit-exact compare) or joined to a
    string (int elements) in the final projection — the driver's pandas
    canonicalizer cannot hash list cells."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    head3 = F.array_sort(F.slice(emb, 1, 3))
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).alias("first_val"),
        F.element_at(emb, 64).alias("last_val"),
        F.element_at(head3, 1).alias("head3_min"),
        F.element_at(head3, 2).alias("head3_mid"),
        F.element_at(head3, 3).alias("head3_max"),
        F.array_max(emb).alias("max_val"),
        F.array_contains(
            F.array(F.col("label").cast("long"), F.lit(42).cast("long")), 42
        ).alias("has_42"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.array_distinct(
                        F.array(F.col("vec_id") % 3, F.col("vec_id") % 5, F.col("vec_id") % 3)
                    )
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("mods"),
    )


@register(
    "q_explode",
    oracle="""
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS word,
             CAST(unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS INTEGER)
               AS pos
      FROM documents
      WHERE doc_id % 10 = 0
    """,
    tags=("scalar", "explode"),
)
def explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1->n row expansion (reference emit-many analog, SURVEY.md 2A A4):
    posexplode of the tokenized text. Generators run inside codegen —
    no shuffle, output streams straight out of the scan."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
    ).select("doc_id", "word", "pos")


@register(
    "q_map_funcs",
    oracle="""
      SELECT event_id,
             array_to_string(map_keys(
               map(['etype', 'k'], [event_type, coalesce(props->>'k', '<null>')])), ',')
               AS mkeys,
             array_to_string(map_values(
               map(['etype', 'k'], [event_type, coalesce(props->>'k', '<null>')])), ',')
               AS mvals,
             CAST(cardinality(map(['etype', 'k'], [event_type, props->>'k'])) AS INTEGER)
               AS msize
      FROM events
    """,
    tags=("scalar", "map"),
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + introspection. Maps are compared via their
    keys/values arrays (insertion-ordered in both engines), serialized
    to comma-joined strings in the final projection — the driver's
    pandas canonicalizer cannot hash list cells. Null map values are
    coalesced to a sentinel on both sides so they stay visible."""
    ev = load_table(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("etype"), F.lit("k")),
        F.array(F.col("event_type"), F.get_json_object("props", "$.k")),
    )
    m_disp = F.map_from_arrays(
        F.array(F.lit("etype"), F.lit("k")),
        F.array(
            F.col("event_type"),
            F.coalesce(F.get_json_object("props", "$.k"), F.lit("<null>")),
        ),
    )
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m_disp), ",").alias("mkeys"),
        F.array_join(F.map_values(m_disp), ",").alias("mvals"),
        F.size(m).alias("msize"),
    )


@register(
    "q_json_funcs",
    oracle="""
      SELECT event_id,
             props->>'k' AS k_str,
             CAST(props->>'k' AS INTEGER) AS k_int,
             CAST(json_valid(props) AS BOOLEAN) AS is_valid,
             CASE WHEN CAST(props->>'k' AS INTEGER) >= 50 THEN 'high' ELSE 'low' END
               AS k_class
      FROM events
    """,
    tags=("scalar", "json"),
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column — both the
    string-path (get_json_object) and schema-full (from_json) routes."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.from_json(F.col("props"), "k INT").isNotNull().alias("is_valid"),
        F.when(parsed.getField("k") >= 50, "high").otherwise("low").alias("k_class"),
    )


_STR_SIM_ORACLE = """
  SELECT a.p_partkey,
         a.p_name AS name_a, b.p_name AS name_b,
         levenshtein(a.p_name, b.p_name) AS lev_dist,
         levenshtein(a.p_brand, b.p_brand) AS brand_dist
  FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
  WHERE a.p_partkey < 500
"""


@register("q_str_similarity", oracle=_STR_SIM_ORACLE, tags=("scalar", "string", "similarity"))
def str_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance string similarity (levenshtein) between
    successive part names — the fuzzy-matching scalar both engines
    define identically. The +1-key equi join stays a hash join; the
    distance is computed post-join, JVM-side, inside codegen (the
    near-dup TEXT path at corpus scale is q_dedup_* blocking, never
    all-pairs levenshtein)."""
    p = load_table(spark, sf_dir, "part")
    a = p.filter(F.col("p_partkey") < 500).alias("a")
    b = p.select(
        (F.col("p_partkey") - 1).alias("join_key"), F.col("p_name"), F.col("p_brand")
    ).alias("b")
    return a.join(b, F.col("a.p_partkey") == F.col("b.join_key")).select(
        F.col("a.p_partkey"),
        F.col("a.p_name").alias("name_a"),
        F.col("b.p_name").alias("name_b"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("lev_dist"),
        F.levenshtein(F.col("a.p_brand"), F.col("b.p_brand")).alias("brand_dist"),
    )


_REGEXP_ORACLE = r"""
  SELECT p_partkey, p_name,
         len(regexp_extract_all(p_name, '[aeiou]+')) AS n_vowel_runs,
         regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
         CASE WHEN regexp_matches(p_name, '^[a-z]') THEN 1 ELSE 0 END AS starts_lower,
         regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
  FROM part
  WHERE p_partkey % 50 = 0
"""


@register("q_regexp_funcs", oracle=_REGEXP_ORACLE, tags=("scalar", "string", "regexp"))
def regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar pack beyond extract/replace: regexp_count
    (Spark 3.5), anchored regexp_like, global replace — all in the
    RE2/Java-compatible subset both engines parse identically (no
    lookarounds, no backrefs; SURVEY.md 5.3 regex discipline).
    Map-only codegen."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 50 == 0)
    return p.select(
        "p_partkey",
        "p_name",
        F.regexp_count("p_name", F.lit("[aeiou]+")).alias("n_vowel_runs"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.when(F.col("p_name").rlike("^[a-z]"), 1).otherwise(0).alias("starts_lower"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
    )
