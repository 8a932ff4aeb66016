"""Round-5 experiment: does pre-bucketing the fact tables close
q_join_multiway's remaining 100x gap?

Context (VERDICT r4): the shipped q_join_multiway plan is eager-agg
pushdown (per-order, then per-customer partial sums before each join).
Its 100x floor is the per-order hash agg + the two fact-side exchanges:
lineitem -> hashpartition(l_orderkey) for the agg, and the agg output
joining orders -> another orderkey exchange pair. q_join_bucketed
(scans.py) proves a zero-Exchange fact-fact join when both sides are
bucketed on the join key — this script measures whether that route
beats the shipped plan on the REAL multiway chain at the 100x corpus.

Usage: python tools/experiment_multiway_bucketed.py [sf_dir] [n_buckets]
       (default .scale100/sf10, 32 buckets)

Protocol: bucket lineitem+orders once (write cost reported separately —
it is the amortized one-time cost a warehouse pays at ingest); then run
shipped-plan and bucketed-plan twice each, report both runs + the
DuckDB twin same-run. Prints one JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".scale100/sf10")
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from pypiper_spark.catalog import load_table
    from pypiper_spark.compare import cents
    from pypiper_spark.registry import all_queries
    from pypiper_spark.session import get_spark

    spark = get_spark(app_name="multiway-bucketed-experiment")
    qs = all_queries()

    # warmup: JVM + codegen + python workers (same as scale_bench.py)
    qs["q_limit_topk"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # --- one-time bucketing (ingest-amortized cost, reported separately)
    import hashlib

    sf_key = hashlib.md5(f"{sf_dir}:b{n_buckets}".encode()).hexdigest()[:8]
    names = {}
    t0 = time.perf_counter()
    for tbl, key_col in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        bname = f"pypiper_mw_{tbl}_{sf_key}"
        names[tbl] = bname
        if not spark.catalog.tableExists(bname):
            (
                load_table(spark, sf_dir, tbl)
                .write.mode("overwrite")
                .bucketBy(n_buckets, key_col)
                .sortBy(key_col)
                .format("parquet")
                .option("path", f"{REPO}/.bucketed/{bname}")
                .saveAsTable(bname)
            )
    bucket_build_sec = round(time.perf_counter() - t0, 3)

    def bucketed_multiway():
        r = load_table(spark, sf_dir, "region")
        n = load_table(spark, sf_dir, "nation")
        c = load_table(spark, sf_dir, "customer")
        o = spark.table(names["orders"]).filter(
            F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
        )
        li = spark.table(names["lineitem"])
        dim = (
            c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            .select("c_custkey", "n_name", "r_name")
        )
        revenue = cents("l_extendedprice") * cents(F.lit(1.0) - F.col("l_discount"))
        # per-order agg over the BUCKETED scan: the bucket hash
        # partitioning satisfies the agg's distribution, no exchange.
        per_order = li.groupBy("l_orderkey").agg(
            F.count(F.lit(1)).alias("_n"), F.sum(revenue).alias("_rc")
        )
        # orderkey join against BUCKETED orders: zipped bucket SMJ,
        # no exchange on either fact side (merge hint as in
        # q_join_bucketed so AQE can't demote the proof).
        per_cust = (
            per_order.join(o.hint("merge"), F.col("l_orderkey") == o.o_orderkey)
            .groupBy("o_custkey")
            .agg(F.sum("_n").alias("_n"), F.sum("_rc").alias("_rc"))
        )
        return (
            per_cust.join(dim, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("r_name", "n_name")
            .agg(
                F.sum("_n").alias("n_lineitems"),
                (F.sum("_rc").cast("double") / 10000).alias("revenue"),
            )
        )

    def timed(mk):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    shipped = lambda: qs["q_join_multiway"].fn(spark, sf_dir)  # noqa: E731

    results = {
        "shipped_run1": timed(shipped),
        "bucketed_run1": timed(bucketed_multiway),
        "shipped_run2": timed(shipped),
        "bucketed_run2": timed(bucketed_multiway),
    }

    # plan evidence: exchanges in each physical plan
    def exchanges(df):
        p = df._jdf.queryExecution().executedPlan().toString()
        return p.count("Exchange hashpartitioning")

    results["shipped_exchanges"] = exchanges(shipped())
    results["bucketed_exchanges"] = exchanges(bucketed_multiway())

    # correctness: both forms agree
    a = {tuple(r) for r in shipped().collect()}
    b = {tuple(r) for r in bucketed_multiway().collect()}
    results["outputs_match"] = a == b

    # DuckDB twin, same run
    try:
        import duckdb

        con = duckdb.connect()
        con.sql(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
        for t in "region nation customer orders lineitem".split():
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        oracle = qs["q_join_multiway"].oracle
        con.sql(oracle).fetchall()
        t0 = time.perf_counter()
        con.sql(oracle).fetchall()
        results["duckdb_warm"] = round(time.perf_counter() - t0, 3)
    except Exception as e:  # noqa: BLE001
        results["duckdb_warm"] = f"error: {e}"[:120]

    out = {
        "experiment": "multiway_bucketed",
        "sf_dir": sf_dir,
        "n_buckets": n_buckets,
        "bucket_build_sec": bucket_build_sec,
        **results,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
