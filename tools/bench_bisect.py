"""A/B bisect for the headline-band creep (VERDICT r6, next-round #1).

Runs ONLY the 15-query headline board, warm-timed exactly as bench.py
does (run twice, report run 2, clearCache after), in a fresh process
per invocation, under one of three configurations:

  full     import the full registry (29 query modules, 270 entries)
           before the loop — bench.py's actual code path.
  minimal  import only the 6 modules that define headline queries
           (dedup, extras, flagship, joins, text, vectors) — tests the
           "registry import mass" hypothesis.
  noclear  full import, but skip catalog.clearCache() between queries
           — tests the "cache churn" hypothesis.

Usage:  python tools/bench_bisect.py full|minimal|noclear
Output: one JSON line {"mode": ..., "total": ..., "queries": {...}}

Driver for repeated runs: tools/bench_bisect_sweep.sh (3 reps per
mode, interleaved to decorrelate machine drift from mode).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADLINE = [
    "q_pricing_summary",
    "q_agg_group",
    "q_join_broadcast",
    "q_join_multiway",
    "q_join_theta_range",
    "q_win_topk_per_group",
    "q_win_frame_rows",
    "q_stream_session",
    "q_text_tfidf",
    "q_text_quality",
    "q_dedup_ngram_jaccard",
    "q_sim_topk_bruteforce",
    "q_limit_topk",
    "q_events_funnel",
    "q_shipping_priority",
]

MINIMAL_MODULES = ["dedup", "extras", "flagship", "joins", "text", "vectors"]


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    t_import0 = time.perf_counter()
    if mode == "minimal":
        import importlib

        for m in MINIMAL_MODULES:
            importlib.import_module(f"pypiper_spark.queries.{m}")
        from pypiper_spark.registry import _REGISTRY as qs  # populated subset
    else:
        from pypiper_spark.registry import all_queries

        qs = all_queries()
    import_sec = time.perf_counter() - t_import0

    from pypiper_spark.session import get_spark

    t_spark0 = time.perf_counter()
    spark = get_spark(app_name=f"bench-bisect-{mode}")
    spark_sec = time.perf_counter() - t_spark0

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        qs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name in HEADLINE:
        run_once(name)
        t = run_once(name)
        if mode != "noclear":
            spark.catalog.clearCache()
        timings[name] = round(t, 3)

    print(
        json.dumps(
            {
                "mode": mode,
                "total": round(sum(timings.values()), 3),
                "import_sec": round(import_sec, 3),
                "spark_startup_sec": round(spark_sec, 3),
                "queries": timings,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
