"""Gates on tools/scale_verify.py — the at-scale evidence tool.

The quantized projections (VERDICT r7 #1) must keep producing
IDENTICAL fingerprints from both engines for float/timestamp columns;
a drift here silently invalidates every SCALE_VERIFY_100X row, so the
tool itself gets a correctness gate at the small SF.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quantized_fingerprints_match_at_small_sf(sf_dir):
    """One raw-double query (row-level values, S=1e6 must match), one
    aggregated-double query (summation-order noise allowed to back
    off), one timestamp query (epoch-us path, no scale recorded)."""
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "scale_verify.py"),
            sf_dir,
            "q_filter_simple",
            "q_agg_stats",
            "q_events_retention",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["mismatch"] == 0 and res["skipped"] == 0
    q = res["queries"]
    assert q["q_filter_simple"]["match"] and q["q_filter_simple"]["scale"] == 1_000_000
    assert q["q_agg_stats"]["match"]
    assert q["q_events_retention"]["match"] and "scale" not in q["q_events_retention"]
