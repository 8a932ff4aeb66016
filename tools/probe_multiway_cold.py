"""One-off probe: where does the bucketed multiway's cold single-shot
cost go? Times each sub-plan in a fresh session (same warmup as
scale_bench), variant chosen by argv so each run is a clean process.

Usage: python tools/probe_multiway_cold.py <sf_dir> bucketed|raw
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir, variant = sys.argv[1], sys.argv[2]

    from pyspark.sql import functions as F

    from pypiper_spark.catalog import load_table
    from pypiper_spark.compare import cents
    from pypiper_spark.registry import all_queries
    from pypiper_spark.session import get_spark

    spark = get_spark(app_name=f"multiway-probe-{variant}")
    qs = all_queries()
    qs["q_limit_topk"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def noop(df, label):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"  {label}: {time.perf_counter() - t0:.2f}s", flush=True)

    if variant == "bucketed":
        from pypiper_spark.bucketing import ensure_bucketed

        t0 = time.perf_counter()
        o_name = ensure_bucketed(spark, sf_dir, "orders", "o_orderkey")
        li_name = ensure_bucketed(spark, sf_dir, "lineitem", "l_orderkey")
        print(f"  ingest: {time.perf_counter() - t0:.2f}s", flush=True)
        o = spark.table(o_name).filter(
            F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
        )
        li = spark.table(li_name)
    else:
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
        )
        li = load_table(spark, sf_dir, "lineitem")

    revenue = cents("l_extendedprice") * cents(F.lit(1.0) - F.col("l_discount"))
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n"), F.sum(revenue).alias("_rc")
    )
    noop(li.select(F.sum(F.xxhash64("l_orderkey") % 1000)), "scan-only")
    noop(per_order, "per_order agg")
    joined = per_order.join(
        o.hint("merge") if variant == "bucketed" else o,
        F.col("l_orderkey") == o.o_orderkey,
    )
    per_cust = joined.groupBy("o_custkey").agg(
        F.sum("_n").alias("_n"), F.sum("_rc").alias("_rc")
    )
    noop(per_cust, "per_cust (agg+join+agg)")

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    )
    full = (
        per_cust.join(dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("_n").alias("n_lineitems"),
            (F.sum("_rc").cast("double") / 10000).alias("revenue"),
        )
    )
    noop(full, "full chain (cold-ish)")
    noop(full, "full chain (warm)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
