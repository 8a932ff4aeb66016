"""Full-coverage 100x sweep driver: every ORACLED registered query,
batched, resumable, heavies last. Results land in /tmp/sv100f/ one
JSON per batch; merge with tools/merge_sweep100.py.

Usage: python tools/run_sweep100_full.py [sf_dir]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale100/sf10"
OUT = "/tmp/sv100f"
os.makedirs(OUT, exist_ok=True)

# known-heavy at 100x: quadratic candidate spaces or twin OOM/caps —
# isolated in trailing batches so a timeout can't eat healthy queries
HEAVY = [
    "q_join_theta_range", "q_entity_resolution", "q_graph_pagerank",
    "q_graph_label_propagation", "q_graph_triangles", "q_dedup_cdc_chunks",
    "q_dedup_cdc_apply", "q_dedup_substring", "q_dedup_substring_apply",
    "q_changepoint_cusum",
    # r9 decision forms that run the blocked exact-jaccard truth join
    # on BOTH engines (Spark side alone is ~150 s at 100x)
    "q_dedup_minhash", "q_dedup_simhash",
]

from pypiper_spark.registry import all_queries  # noqa: E402

names = sorted(n for n, q in all_queries().items() if q.has_oracle)
normal = [n for n in names if n not in HEAVY]
heavy = [n for n in HEAVY if n in names]
B = 18
batches = [normal[i : i + B] for i in range(0, len(normal), B)]
batches += [[h] for h in heavy]  # one heavy per batch: isolate timeouts

for i, batch in enumerate(batches, 1):
    out = os.path.join(OUT, f"b{i:02d}.json")
    if os.path.exists(out):
        try:
            json.loads(open(out).read().strip().splitlines()[-1])
            print(f"b{i:02d} cached", flush=True)
            continue
        except Exception:
            pass
    try:
        r = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "scale_verify.py"),
                SF,
                *batch,
            ],
            stdout=open(out, "w"),
            stderr=open(out.replace(".json", ".err"), "w"),
            timeout=2400 if batch[0] not in HEAVY else 1800,
            cwd=REPO,
        )
        rc = r.returncode
    except subprocess.TimeoutExpired:
        rc = "timeout"
        os.replace(out, out + ".partial")  # don't let resume treat it as done
    print(f"b{i:02d} exit={rc} ({len(batch)} queries)", flush=True)
print("DONE", flush=True)
