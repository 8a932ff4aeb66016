"""Merge the full-coverage 100x sweep batches into SCALE_VERIFY_100X.json.

Usage: python tools/merge_sweep100.py [batch_dir] [out_json]

Classification of non-matching rows:
- error mentioning out-of-memory / bad allocation -> ``twin_oom``
  (the DuckDB twin cannot run the workload; the Spark fingerprint
  recorded before the twin attempt is the engine-completes evidence)
- other errors -> kept verbatim for adjudication (e.g. a twin-side
  type-conversion limitation)

The merged file is REBUILT from the sweep (single corpus build, one
tool version) rather than appended, so every row reflects the same
data and the same quantization rules.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> int:
    bdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sv100f"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_VERIFY_100X.json",
        )
    )
    queries: dict = {}
    sf_dir = None
    for f in sorted(glob.glob(os.path.join(bdir, "b*.json"))):
        try:
            d = json.loads(open(f).read().strip().splitlines()[-1])
        except Exception:
            print(f"skip unparsable {f}", file=sys.stderr)
            continue
        sf_dir = d.get("sf_dir", sf_dir)
        for k, v in d.get("queries", {}).items():
            if "error" in v and any(
                s in v["error"]
                for s in ("OutOfMemory", "bad allocation", "No space left")
            ):
                v = {
                    "twin_oom": v["error"],
                    **({"spark_completes": v["spark"]} if "spark" in v else {}),
                    "note": "DuckDB twin exhausts memory/spill space at the "
                    "100x corpus; Spark completes (fingerprint recorded "
                    "pre-twin)",
                }
            queries[k] = v
    n_match = sum(1 for v in queries.values() if v.get("match"))
    n_mm = sum(
        1
        for v in queries.values()
        if v.get("match") is False or ("error" in v)
    )
    n_skip = sum(1 for v in queries.values() if v.get("skipped"))
    n_oom = sum(1 for v in queries.values() if v.get("twin_oom"))
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(queries),
        "match": n_match,
        "mismatch": n_mm,
        "skipped": n_skip,
        "twin_oom": n_oom,
        "queries": dict(sorted(queries.items())),
    }
    with open(out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(
        f"{out}: {len(queries)} queries, {n_match} match, {n_mm} "
        f"mismatch/error, {n_oom} twin-OOM, {n_skip} skipped"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
