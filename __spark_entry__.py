"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``pypiper_spark``; this file only adapts the
registry (pypiper_spark/registry.py) to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    from pypiper_spark.queries.flagship import pricing_summary
    from pypiper_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    from pypiper_spark.registry import all_queries
    from pypiper_spark.session import apply_runtime_confs

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)  # driver session lacks nanosAsLong
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(spec.fn) for name, spec in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin SQL per query; omitted entries get rows-only checks.

    The driver's protocol runs oracles at sf=0.01, so factory-built
    oracles (artifact-inlining twins, registry.QuerySpec.oracle_factory)
    resolve against that corpus here; use oracle_sql_for() to resolve
    against a different scale."""
    return oracle_sql_for(os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    ))


def oracle_sql_for(sf_dir: str) -> dict[str, str]:
    """oracle_sql() with factory oracles resolved against ``sf_dir`` —
    the hook local replay tooling uses to verify at sf0.1 / 100x."""
    from pypiper_spark.registry import all_queries, resolve_oracle

    out: dict[str, str] = {}
    for name, spec in sorted(all_queries().items()):
        sql = resolve_oracle(spec, sf_dir)
        if sql is not None:
            out[name] = sql
    return out
