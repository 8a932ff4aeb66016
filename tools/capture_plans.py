"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> <query> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt with the formatted physical
plan of the query's returned DataFrame (plan only — the query is NOT
executed, so offline artifact builds triggered lazily by plan
construction still run, but no noop write happens).
"""

from __future__ import annotations

import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pypiper_spark.registry import all_queries
    from pypiper_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    qs = all_queries()
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name].fn(spark, sf_dir)
        # DataFrame.explain prints to stdout; capture it
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)", file=sys.stderr)
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    sys.exit(main())
