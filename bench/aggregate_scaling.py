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


def _fit_zero_steal(legs: list[tuple[float, float]]) -> dict | None:
    """Least-squares urls_per_sec vs steal% over one level's legs; the
    intercept is the level's zero-steal throughput estimate.

    Rationale: the quiet gate discards contaminated pairs, but on a host
    that never goes quiet that throws away all the data. Steal% is measured
    per leg, so regressing throughput on it USES the contamination instead:
    every leg contributes, and the intercept recovers the quiet asymptote.
    The empirical relationship is close to linear over the observed 0-11%
    range (see residuals in the artifact); the 4N slope being many times the
    N slope is itself the gang-scheduling signature documented in
    BENCH/BASELINE.md §2c.
    """
    if len(legs) < 3:
        return None
    xs = [s for s, _ in legs]
    ys = [u for _, u in legs]
    n = len(legs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    if sxx == 0:
        return None
    slope = sum((x - mx) * (y - my) for x, y in legs) / sxx
    intercept = my - slope * mx
    ss_res = sum((y - (intercept + slope * x)) ** 2 for x, y in legs)
    ss_tot = sum((y - my) ** 2 for y in ys) or 1.0
    return {
        "n_legs": n,
        "steal_range": [min(xs), max(xs)],
        "slope_urls_per_sec_per_steal_pct": round(slope, 1),
        "zero_steal_urls_per_sec": round(intercept, 1),
        "r_squared": round(1 - ss_res / ss_tot, 3),
    }


def _clean_leg_efficiency(pairs: list[dict], gate: float = 1.0) -> dict | None:
    """Cross-pair quiet-leg estimate: legs are interchangeable (every leg at
    a level runs the identical deterministic job on the identical input), so
    the quietest legs of each level can be compared directly even when no
    single PAIR had both legs quiet. Median over legs with steal <= gate;
    this is the strictest honest estimator on a host that never goes quiet
    for a whole pair: it never divides a clean 4N leg by a steal-depressed
    N leg (which inflates efficiency — observed pairs up to 0.97 that way).
    """
    n_clean = [p["n_urls_per_sec"] for p in pairs if p["steal_n"] <= gate]
    n4_clean = [p["n4_urls_per_sec"] for p in pairs if p["steal_4n"] <= gate]
    if not n_clean or not n4_clean:
        return None
    tn = statistics.median(n_clean)
    t4n = statistics.median(n4_clean)
    return {
        "gate_steal_pct": gate,
        "n_clean_legs": [len(n_clean), len(n4_clean)],
        "median_n_urls_per_sec": round(tn, 1),
        "median_4n_urls_per_sec": round(t4n, 1),
        "efficiency": round(t4n / (4 * tn), 3),
    }


def _extrapolated_efficiency(pairs: list[dict]) -> dict | None:
    """Zero-steal N and 4N intercepts over a pair set → efficiency estimate."""
    fit_n = _fit_zero_steal([(p["steal_n"], p["n_urls_per_sec"]) for p in pairs])
    fit_4n = _fit_zero_steal([(p["steal_4n"], p["n4_urls_per_sec"]) for p in pairs])
    if not fit_n or not fit_4n:
        return None
    eff = fit_4n["zero_steal_urls_per_sec"] / (4 * fit_n["zero_steal_urls_per_sec"])
    return {
        "fit_n": fit_n,
        "fit_4n": fit_4n,
        "efficiency_at_zero_steal": round(eff, 3),
    }


# artifacts measured on the round-4 fused single-action wave loop (engine.py
# commit 7e03ca1 onward); earlier r4 artifacts ran the two-action r3 loop
_FUSED_SOURCES = ("scaling_r4_fused.json", "scaling_r4_quiet.json",
                  "scaling_r4_quiet.json.partial")


def main() -> None:
    pairs: list[dict] = []
    # the official artifact (8-wave pairs, rounds 4-5) + every r4 probe run.
    # scaling_r5_16wave.json is deliberately EXCLUDED: efficiency is a
    # function of problem size, so 16-wave pairs must not pool with 8-wave
    # ones (it is analyzed separately in BENCH/BASELINE.md §2f).
    sources = [os.path.join(BENCH, "scaling.json")] + sorted(
        glob.glob(os.path.join(BENCH, "scaling_r4_*.json*"))
    )
    for path in sources:
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
    fused = [p for p in pairs if p["source"] in _FUSED_SOURCES]
    out = {
        "pairs": pairs,
        "bins": table,
        "quiet_pairs_leq1pct_both_legs": quiet,
        "quiet_median": round(statistics.median(quiet), 3) if quiet else None,
        "zero_steal_extrapolation_all": _extrapolated_efficiency(pairs),
        "zero_steal_extrapolation_fused_loop": _extrapolated_efficiency(fused),
        "clean_leg_cross_pair_all": _clean_leg_efficiency(pairs),
        "clean_leg_cross_pair_fused_loop": _clean_leg_efficiency(fused),
        "fused_loop_pair_count": len(fused),
    }
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(BENCH, "scaling_r4_pooled.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    for row in table:
        print(row)
    print("quiet pairs:", quiet, "median:", out["quiet_median"])
    print("zero-steal extrapolation (all):", out["zero_steal_extrapolation_all"])
    print("zero-steal extrapolation (fused loop,", len(fused), "pairs):",
          out["zero_steal_extrapolation_fused_loop"])
    print("wrote", dest)


if __name__ == "__main__":
    main()
