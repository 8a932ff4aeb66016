"""Bucketed fact tables — the ingest-time shuffle that recurring fact
joins amortize.

At 100 TB, a fact-fact join on the same key every night should not
re-shuffle petabytes per query: bucketing both sides by the join key at
WRITE time pays the exchange once, and every later join (and any
aggregation grouped on the bucket key) reads co-located, pre-hashed
buckets with NO Exchange in the plan (asserted in
tests/test_bucketing.py and the q_join_multiway plan test).

This module owns the "ensure the bucketed twin exists" step shared by
q_join_bucketed (the minimal proof query) and q_join_multiway (the real
chain that measured 2.1x faster at the 100x corpus with the bucketed
route — BENCH.md r5). Table identity includes the sf dir so a cached
bucket table from one scale factor never satisfies a query at another.
"""

from __future__ import annotations

import hashlib
import tempfile

from pyspark.sql import SparkSession

from pypiper_spark.catalog import load_table

DEFAULT_BUCKETS = 8


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    tbl: str,
    key_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> str:
    """Create (once per session+sf_dir) a bucketed catalog twin of
    ``tbl`` bucketed+sorted by ``key_col``; return its table name.

    The write cost is the modeled INGEST cost — the point of bucketing
    is that queries after the first never pay it (bench.py's warmup run
    builds it; the timed run, like every nightly query in a real
    warehouse, reuses it). Explicit filesystem location: never depend
    on the session's warehouse dir (the driver's cwd may not be
    writable)."""
    # Identity must include EVERY parameter that changes the physical
    # layout (sf_dir, key_col, n_buckets): keying on (table, sf_dir)
    # alone would let a later call asking for a different bucket key
    # silently reuse a twin bucketed on the wrong column, defeating the
    # no-Exchange guarantee without any error.
    ident = f"{sf_dir}|{key_col}|{n_buckets}"
    sf_key = hashlib.md5(ident.encode()).hexdigest()[:8]
    name = f"pypiper_b_{tbl}_{sf_key}"
    if not spark.catalog.tableExists(name):
        (
            load_table(spark, sf_dir, tbl)
            .write.mode("overwrite")
            .bucketBy(n_buckets, key_col)
            .sortBy(key_col)
            .format("parquet")
            .option("path", f"{tempfile.gettempdir()}/{name}")
            .saveAsTable(name)
        )
    return name
