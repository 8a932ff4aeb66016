"""User-defined function surface (SURVEY.md 2B: UDF/UDAF/UDTF).

This is the true analog of the reference's Node.run(): arbitrary user
Python inside the pipeline. The engine's rules (section 4.2):
- hot paths use pandas_udf / applyInPandas / mapInPandas (Arrow
  batches) — the row-at-a-time @udf exists to cover the API surface
  and is deliberately confined to one query here;
- grouped-map/UDAF outputs that reduce over floats round to a
  granularity far above accumulation-order error.
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from pypiper_spark.catalog import load_table
from pypiper_spark.registry import register


# NOTE: udf()/pandas_udf() objects are created INSIDE the query
# functions, never at module scope: Spark's Python workers re-import
# this module to unpickle applyInPandas/mapInPandas callbacks, and UDF
# construction requires an active session the worker doesn't have.


def _tax_bracket(total: float) -> str:
    if total is None:
        return "unknown"
    if total >= 300000.0:
        return "top"
    if total >= 150000.0:
        return "mid"
    return "base"


@register(
    "q_udf_scalar",
    oracle="""
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_totalprice >= 300000.0 THEN 'top'
                  WHEN o_totalprice >= 150000.0 THEN 'mid'
                  ELSE 'base' END AS bracket
      FROM orders
    """,
    tags=("udf",),
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (API-surface coverage; the SLOW path —
    every row crosses JVM->Python individually)."""
    o = load_table(spark, sf_dir, "orders")
    bracket = udf(_tax_bracket, "string")
    return o.select("o_orderkey", "o_totalprice", bracket("o_totalprice").alias("bracket"))


def _discounted(price: pd.Series, discount: pd.Series) -> pd.Series:
    # per-row IEEE arithmetic: bit-identical to the SQL twin
    return price * (1.0 - discount)


@register(
    "q_udf_pandas",
    oracle="""
      SELECT l_orderkey, l_linenumber,
             l_extendedprice * (1.0 - l_discount) AS discounted_price
      FROM lineitem
    """,
    tags=("udf", "pandas"),
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar UDF: Arrow batches, numpy kernels — the
    sanctioned way to run Python per-value (10-100x the @udf path)."""
    li = load_table(spark, sf_dir, "lineitem")
    discounted = pandas_udf(_discounted, "double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted("l_extendedprice", "l_discount").alias("discounted_price"),
    )


_ZSCORE_SCHEMA = "l_orderkey long, l_linenumber int, l_returnflag string, price_z double"


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    x = pdf["l_extendedprice"]
    mu = x.mean()
    sd = x.std(ddof=1)
    return pd.DataFrame(
        {
            "l_orderkey": pdf["l_orderkey"],
            "l_linenumber": pdf["l_linenumber"],
            "l_returnflag": pdf["l_returnflag"],
            "price_z": ((x - mu) / sd).round(6),
        }
    )


@register(
    "q_udf_grouped_map",
    oracle="""
      SELECT l_orderkey, l_linenumber, l_returnflag,
             round((l_extendedprice - avg(l_extendedprice) OVER w)
                   / stddev_samp(l_extendedprice) OVER w, 6) AS price_z
      FROM lineitem
      WINDOW w AS (PARTITION BY l_returnflag)
    """,
    tags=("udf", "grouped_map"),
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas per group (the reference's batch_size=ALL-per-key
    analog): each group arrives as ONE pandas frame. Scale note: a
    group must fit in executor memory — fine for per-key normalization,
    wrong for whole-table; that is what windows are for."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").applyInPandas(_zscore, schema=_ZSCORE_SCHEMA)


_SPLIT_SCHEMA = "doc_id long, word string, n_words int"


def _split_docs(batches):
    for pdf in batches:
        words = pdf["text"].str.split(" ")
        n = words.str.len()
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].repeat(n),
                "word": np.concatenate(words.to_numpy()),
                "n_words": n.repeat(n),
            }
        )
        yield out


@register(
    "q_udtf_split",
    oracle="""
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS word,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words
      FROM documents
      WHERE doc_id % 10 = 1
    """,
    tags=("udf", "udtf"),
)
def udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1->n table function via mapInPandas (reference emit-many from
    user code): each Arrow batch expands to a word-level frame."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 1)
        .select("doc_id", "text")
    )
    return d.mapInPandas(_split_docs, schema=_SPLIT_SCHEMA)


def _geomean(x: pd.Series) -> float:
    return float(np.exp(np.log(x.to_numpy()).mean()))


@register(
    "q_udaf_geomean",
    oracle="""
      SELECT l_returnflag,
             round(exp(avg(ln(l_extendedprice))), 4) AS geomean_price
      FROM lineitem
      GROUP BY l_returnflag
    """,
    tags=("udf", "udaf"),
)
def udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (GROUPED_AGG pandas_udf): geometric mean."""
    li = load_table(spark, sf_dir, "lineitem")
    geomean = pandas_udf(_geomean, "double")
    return li.groupBy("l_returnflag").agg(
        F.round(geomean("l_extendedprice"), 4).alias("geomean_price")
    )


@register(
    "q_udf_arrow_scalar",
    oracle="""
      SELECT o_orderkey,
             CASE WHEN o_totalprice >= 300000.0 THEN 'top'
                  WHEN o_totalprice >= 150000.0 THEN 'mid'
                  ELSE 'base' END AS bracket,
             length(o_orderpriority) AS priority_len
      FROM orders
    """,
    tags=("udf", "arrow"),
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (useArrow=True, Spark 4): same
    per-row authoring model as q_udf_scalar but the JVM<->Python
    transfer is Arrow-batched — the migration path for legacy @udf
    code that can't be rewritten to pandas series semantics. The
    remaining per-row Python byte-code is still ~10x slower than a
    true pandas UDF; this exists as the middle rung of the
    row-UDF -> arrow-UDF -> pandas-UDF ladder (SURVEY.md 4.2)."""
    o = load_table(spark, sf_dir, "orders")
    bracket = udf(_tax_bracket, "string", useArrow=True)
    return o.select(
        "o_orderkey",
        bracket("o_totalprice").alias("bracket"),
        F.length("o_orderpriority").alias("priority_len"),
    )


_UDTF_NATIVE_ORACLE = """
  SELECT lang,
         count(*) AS n_tokens,
         count(DISTINCT word) AS n_distinct_words,
         max(pos) AS max_pos
  FROM (
    SELECT d.lang,
           unnest(string_split(d.text, ' ')) AS word,
           unnest(generate_series(0, len(string_split(d.text, ' ')) - 1)) AS pos
    FROM documents d
  )
  GROUP BY lang
"""


@register("q_udtf_native", oracle=_UDTF_NATIVE_ORACLE, tags=("udf", "udtf", "lateral"))
def udtf_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Python UDTF (Spark 4 @udtf): a table function authored
    as a class with eval() yielding rows, applied per input row via
    lateralJoin — the sanctioned 1->n user-code expansion, vs
    q_udtf_split's mapInPandas formulation of the same shape. Arrow
    moves batches; the per-row Python generator is the cost you pay
    for arbitrary user logic (explode stays the fast path when the
    expansion is expressible — the oracle uses exactly that). The
    aggregate on top keeps the output driver-safe and tiny."""
    from pyspark.sql.functions import col, udtf

    @udtf(returnType="word: string, pos: int")
    class _SplitWords:
        def eval(self, text: str):  # noqa: ANN001
            for i, w in enumerate(text.split(" ")):
                yield (w, i)

    d = load_table(spark, sf_dir, "documents").select("lang", "text")
    return (
        d.lateralJoin(_SplitWords(col("text").outer()))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("word").alias("n_distinct_words"),
            F.max("pos").alias("max_pos"),
        )
    )


# length(), not strlen(): the kernel counts CODEPOINTS (utf8_length),
# and strlen counts BYTES — they coincide only on ASCII corpora, which
# is why the byte version survived until the 100x sweep (the scaled
# corpus's copy tag contains a 2-byte middot and exposed the drift).
_MAP_IN_ARROW_ORACLE = """
  SELECT lang,
         count(*) AS n_docs,
         CAST(sum(length(text)) AS BIGINT) AS total_chars,
         CAST(sum(length(text) - length(replace(text, ' ', ''))) AS BIGINT)
           AS total_spaces
  FROM documents
  GROUP BY lang
"""


@register(
    "q_udf_map_in_arrow", oracle=_MAP_IN_ARROW_ORACLE, tags=("udf", "arrow", "batch")
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy rung of the batch ladder — the user
    function receives pyarrow RecordBatches directly (no pandas
    conversion on either side) and answers with Arrow compute
    kernels. The right tool when the per-batch work IS expressible in
    Arrow compute / any Arrow-native library (tokenizers, codecs):
    mapInPandas pays a pandas materialization per batch for
    ergonomics this path skips. Gotcha encoded here: project LONGs
    out of the batch (the ArrowColumnVector accessor for doubles
    can't feed a downstream aggregate directly in this build)."""
    import pyarrow as pa

    def _char_stats(batches):  # noqa: ANN001
        import pyarrow.compute as pc

        for batch in batches:
            t = pa.table(batch)
            text = t["text"].combine_chunks()
            yield pa.RecordBatch.from_arrays(
                [
                    t["lang"].combine_chunks(),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.count_substring(text, " "), pa.int64()),
                ],
                names=["lang", "n_chars_py", "n_spaces"],
            )

    d = load_table(spark, sf_dir, "documents").select("lang", "text")
    per_doc = d.mapInArrow(_char_stats, "lang string, n_chars_py long, n_spaces long")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars_py").alias("total_chars"),
        F.sum("n_spaces").alias("total_spaces"),
    )
