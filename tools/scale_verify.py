"""Row-heavy correctness verification AT scale — engine-side hashing.

tools/driver_sim.py compares results by collecting both sides to
pandas, which caps verifiable output size at the driver transport
(q_sft_reward_pairs' 1.8M wide rows exceeded it at the 100x corpus).
This tool instead reduces each side INSIDE its own engine to an
order-insensitive fingerprint:

    per row:  md5(coalesce(cast(col as varchar), '<null>') joined '|',
              columns in sorted-name order)  ->  first 15 hex digits
              as a BIGINT (60 bits, positive)
    per set:  (count(*), bit_xor(row_hash))

bit_xor is commutative and overflow-free, so any row order and any
partitioning produce the same fingerprint, and nothing bigger than
two integers ever leaves either engine. Restricted to queries whose
output columns are integers / strings / dates — double formatting is
engine-specific (that is exactly why driver_sim hashes via pandas),
so float-bearing queries stay on the small-SF gate.

Usage: python tools/scale_verify.py <sf_dir> <query> [query ...]
Prints one JSON line; exit 0 iff every fingerprint matches.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_ALLOWED = {"bigint", "int", "integer", "smallint", "string", "date", "boolean"}


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    import duckdb

    from pyspark.sql import functions as F

    from pypiper_spark.registry import all_queries
    from pypiper_spark.session import get_spark

    spark = get_spark(app_name="pypiper-scale-verify")
    qs = all_queries()

    def fresh_con():
        """One DuckDB process-state per query: a twin that OOMs must
        not poison the NEXT query's allocation (r7 lesson: after one
        genuine OOM, even trivial set-op twins reported spurious
        bad-allocation failures on the shared connection)."""
        c = duckdb.connect()
        c.sql(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
        for t in TABLES:
            c.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return c

    results: dict[str, dict] = {}
    n_match = n_mismatch = n_skipped = 0
    for name in names:
        con = fresh_con()
        q = qs[name]
        rec: dict = {}
        try:
            df = q.fn(spark, sf_dir)
            types = dict(df.dtypes)
            bad = {c: t for c, t in types.items() if t not in _ALLOWED}
            if bad or not q.oracle:
                rec["skipped"] = f"float/unsupported cols {bad}" if bad else "no oracle"
                n_skipped += 1
                results[name] = rec
                print(f"  [SKP] {name}: {rec['skipped']}", file=sys.stderr)
                continue
            cols = sorted(df.columns)
            row = F.concat_ws(
                "|",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
                    for c in cols
                ],
            )
            h = F.conv(F.substring(F.md5(row.cast("binary")), 1, 15), 16, 10).cast(
                "bigint"
            )
            got = (
                df.select(h.alias("h"))
                .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h) as x"))
                .first()
            )
            dcols = ", ".join(
                f"coalesce(CAST(\"{c}\" AS VARCHAR), '<null>')" for c in cols
            )
            dres = con.sql(
                f"""
                SELECT count(*) AS n,
                       bit_xor(CAST('0x' || substr(md5(concat_ws('|', {dcols})),
                                                   1, 15) AS BIGINT)) AS x
                FROM ({q.oracle})
                """
            ).fetchone()
            rec["spark"] = {"n": got.n, "x": got.x}
            rec["duckdb"] = {"n": dres[0], "x": dres[1]}
            rec["match"] = got.n == dres[0] and got.x == dres[1]
            if rec["match"]:
                n_match += 1
            else:
                n_mismatch += 1
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {e}"[:400]
            n_mismatch += 1
        spark.catalog.clearCache()
        results[name] = rec
        print(f"  [{'OK ' if rec.get('match') else 'SKP' if rec.get('skipped') else 'BAD'}] {name}", file=sys.stderr)

    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "match": n_match,
        "mismatch": n_mismatch,
        "skipped": n_skipped,
        "queries": results,
    }
    print(json.dumps(summary, default=str))
    return 0 if n_mismatch == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
