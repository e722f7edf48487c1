"""Aggregate every round-4 scaling run into one steal-vs-efficiency table.

The sandbox VM has bursty external neighbors; per-leg hypervisor steal%
(/proc/stat field 9, recorded by run_scaling.py) is the kernel's own measure
of that contention. This script pools all interleaved runs' (N, 4N) pairs,
computes per-pair efficiency = urls_per_sec(4N) / (4 * urls_per_sec(N)), and
bins pairs by their worse leg's steal% — making the monotone
efficiency-vs-steal relationship (and the quiet-host asymptote) visible in
one table instead of scattered across artifacts.

Usage: python bench/aggregate_scaling.py [out.json]
Reads BENCH/scaling_r4_*.json (+ .partial) that contain interleaved runs.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
BENCH = os.path.join(REPO, "BENCH")


def _pairs_from(doc: dict, source: str) -> list[dict]:
    """Extract interleaved (N, 4N) pairs with per-leg steal from one artifact.

    Supports both the final artifact shape ({"levels": {"4": {...runs},
    "16": {...runs}}, "interleaved": true}) and the .partial shape
    ({"runs_n": [...], "runs_4n": [...]}).
    """
    if "runs_n" in doc:
        n_runs, n4_runs = doc["runs_n"], doc["runs_4n"]
    elif "levels" in doc:
        # Block-design runs are pairable too when each leg recorded its own
        # steal%: rep i at N vs rep i at 4N — the steal columns carry the
        # contention information the interleave otherwise provides.
        lv = doc["levels"]
        keys = sorted(lv, key=int)
        n_runs, n4_runs = lv[keys[0]]["runs"], lv[keys[1]]["runs"]
    else:
        return []
    pairs = []
    for i, (a, b) in enumerate(zip(n_runs, n4_runs)):
        if "steal_pct" not in a or "steal_pct" not in b:
            continue
        pairs.append({
            "source": source,
            "pair": i,
            "n_urls_per_sec": a["urls_per_sec"],
            "n4_urls_per_sec": b["urls_per_sec"],
            "efficiency": round(b["urls_per_sec"] / (4 * a["urls_per_sec"]), 3),
            "steal_n": a["steal_pct"],
            "steal_4n": b["steal_pct"],
            "steal_max": max(a["steal_pct"], b["steal_pct"]),
        })
    return pairs


def main() -> None:
    pairs: list[dict] = []
    for path in sorted(glob.glob(os.path.join(BENCH, "scaling_r4_*.json*"))):
        if path.endswith(".partial"):
            # skip if the finished artifact exists (same pairs, final shape)
            if os.path.exists(path[: -len(".partial")]):
                continue
        try:
            with open(path) as f:
                doc = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        pairs += _pairs_from(doc, os.path.basename(path))

    # also take clean block-design runs that recorded steal per leg
    pairs.sort(key=lambda p: p["steal_max"])

    bins = [(0.0, 1.0), (1.0, 2.0), (2.0, 4.0), (4.0, 100.0)]
    table = []
    for lo, hi in bins:
        sel = [p["efficiency"] for p in pairs if lo <= p["steal_max"] < hi]
        table.append({
            "steal_max_bin": f"[{lo},{hi})",
            "n_pairs": len(sel),
            "median_efficiency": round(statistics.median(sel), 3) if sel else None,
            "max_efficiency": max(sel) if sel else None,
        })

    quiet = [p["efficiency"] for p in pairs if p["steal_n"] <= 1.0 and p["steal_4n"] <= 1.0]
    out = {
        "pairs": pairs,
        "bins": table,
        "quiet_pairs_leq1pct_both_legs": quiet,
        "quiet_median": round(statistics.median(quiet), 3) if quiet else None,
    }
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(BENCH, "scaling_r4_pooled.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    for row in table:
        print(row)
    print("quiet pairs:", quiet, "median:", out["quiet_median"])
    print("wrote", dest)


if __name__ == "__main__":
    main()
