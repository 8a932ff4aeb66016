"""Simulate the driver's verify protocol against __spark_entry__.py.

Usage: python tools/driver_sim.py [sf_dir] [query ...]

Replays what the driver does per-round:
1. create a PLAIN SparkSession (none of our configs),
2. import __spark_entry__ by file path,
3. smoke-check entry(spark) at sf0.001 (rows >= 0, stable schema),
4. for each queries() entry at sf0.01: run Spark side and oracle_sql()
   side (DuckDB views over the same parquet), compare row-count +
   column names + order-insensitive value hash,
5. print a CORRECTNESS-style JSON summary.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import importlib.util
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = "/root/repo"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive hash: canonical per-cell repr, columns sorted
    by name, row-strings sorted, sha256.

    STRICT like the real driver: the driver canonicalizes with
    pandas.sort_values over all columns, which raises TypeError on
    list/ndarray/dict cells — we replay that sort first so any complex
    output column fails HERE, before a driver round (round-1 lesson:
    the tolerant local hash shipped 6 driver crashes)."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df.sort_values(by=list(df.columns))  # raises like the driver on list cells

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if isinstance(v, (np.floating, float)):
            f = float(v)
            if f == 0.0:
                f = 0.0
            return repr(f)
        if isinstance(v, (np.integer, int)):
            return repr(int(v))
        if isinstance(v, np.bool_):
            return repr(bool(v))
        if isinstance(v, (list, np.ndarray, dict)):
            raise TypeError(
                f"complex cell {type(v).__name__} in result frame — the real driver "
                "crashes on these; serialize with to_json/array_join in the query"
            )
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if isinstance(v, dt.datetime):
            return pd.Timestamp(v).isoformat()
        if isinstance(v, dt.date):
            return pd.Timestamp(v).isoformat()
        try:
            if pd.isna(v):
                return "∅"
        except (TypeError, ValueError):
            pass
        return repr(v)

    rows = sorted("|".join(cell(v) for v in row) for row in df.itertuples(index=False))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--out=")]
    out_path = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--out=")), None
    )
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location("__spark_entry__", f"{REPO}/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    entry_df = mod.entry(spark)
    entry_rows = entry_df.collect()
    print(f"entry: {len(entry_rows)} rows, schema={entry_df.schema.simpleString()}", file=sys.stderr)
    assert len(entry_rows) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = mod.queries()
    # factory oracles must resolve against the sf THIS replay runs at
    oracles = (
        mod.oracle_sql_for(sf_dir)
        if hasattr(mod, "oracle_sql_for")
        else mod.oracle_sql()
    )
    results: dict[str, dict] = {}
    n_match = n_mismatch = n_rows_only = n_error = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {}
        try:
            got = fn(spark, sf_dir).toPandas()
            rec["rows"] = len(got)
            if name in oracles:
                exp = con.sql(oracles[name]).df()
                rec["oracle_rows"] = len(exp)
                rec["cols_match"] = sorted(got.columns) == sorted(exp.columns)
                gh, eh = value_hash(got), value_hash(exp)
                rec["hash_match"] = gh == eh and rec["cols_match"] and len(got) == len(exp)
                if rec["hash_match"]:
                    n_match += 1
                else:
                    n_mismatch += 1
                    rec["spark_hash"], rec["oracle_hash"] = gh, eh
            else:
                rec["rows_only"] = True
                n_rows_only += 1
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {e}"[:500]
            n_error += 1
        # several queries persist() intermediates for the duration of
        # their own job (tf-idf's tf, the dedup group tables, the
        # decontaminate shingle stream); release them here so cached
        # blocks don't accumulate across the 163-query suite
        spark.catalog.clearCache()
        results[name] = rec
        status = "OK " if rec.get("hash_match") else ("ro " if rec.get("rows_only") else "BAD")
        print(f"  [{status}] {name}: {rec}", file=sys.stderr)

    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "hash_match": n_match,
        "hash_mismatch": n_mismatch,
        "rows_only": n_rows_only,
        "errors": n_error,
    }
    if out_path:
        with open(out_path, "w") as fh:
            json.dump({"summary": summary, "queries": results}, fh, indent=1, sort_keys=True)
    print(json.dumps(summary))
    return 0 if (n_mismatch == 0 and n_error == 0) else 1


if __name__ == "__main__":
    sys.exit(main())
