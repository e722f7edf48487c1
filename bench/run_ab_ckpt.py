"""Interleaved A/B for the round-4 checkpoint compilation experiment.

A = default (per-wave localCheckpoint(eager=False) plans compiled under AQE;
    compile-time stage materialization feeds AQE's runtime re-planning)
B = CRAWLSPARK_CKPT_STATIC=1 (the rejected experiment: checkpoint plans
    compiled with AQE off so the cut is lazy at the call site)

OUTCOME (2026-08-18, BENCH/ab_r4_ckpt.json): A won all 4 interleaved pairs
at comparable steal%% (median B/A = 0.80) — the engine default stays A.

Same protocol as the scaling harness: arms ALTERNATE in time (A,B,A,B,...)
so external hypervisor bursts land on both, and each leg records whole-VM
steal%% from /proc/stat so contaminated pairs are identifiable. Crawl output
is deterministic and identical across arms (the engine goldens + BSP oracle
pin that); only wall time differs.

Usage: cd /root/repo && python bench/run_ab_ckpt.py [--pairs 3] [--cpus 16]
Writes BENCH/ab_r4_ckpt.json and prints a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _steal_probe(sec: float) -> float:
    """Instantaneous whole-VM steal%% over a short window — same launch gate
    as bench/run_scaling.py: defer LAUNCHING a pair until the hypervisor is
    quiet. Gating is on launch conditions only; every launched pair is
    recorded in the artifact whatever happens to it mid-flight."""
    n = os.cpu_count() or 1
    s0 = _steal_jiffies()
    time.sleep(sec)
    s1 = _steal_jiffies()
    return 100.0 * (s1 - s0) * 0.01 / (sec * n)


def run_leg(cpus: int, ckpt_aqe: bool, scale: str, wave_budget: int,
            max_waves: int, image_px: int, shuffle_partitions: int) -> dict:
    cmd = [
        sys.executable, os.path.join(HERE, "run_crawl.py"),
        "--cpus", str(cpus), "--scale", scale,
        "--wave-budget", str(wave_budget), "--max-waves", str(max_waves),
        "--image-px", str(image_px),
        "--shuffle-partitions", str(shuffle_partitions),
    ]
    env = dict(os.environ, PYTHONPATH=REPO, CRAWLSPARK_DRIVER_MEM="48g")
    if ckpt_aqe:
        env.pop("CRAWLSPARK_CKPT_STATIC", None)
    else:
        env["CRAWLSPARK_CKPT_STATIC"] = "1"
    # cooperative gate shared with bench/run_scaling.py: same-guest workloads
    # contend for memory bandwidth without registering a steal jiffy
    while os.path.exists("/tmp/crawlspark_host_busy"):
        print("  busy-flag present — deferring leg", flush=True)
        time.sleep(30)
    n_host = os.cpu_count() or 1
    s0, t0 = _steal_jiffies(), time.monotonic()
    res = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
    s1, t1 = _steal_jiffies(), time.monotonic()
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    if not line:
        raise RuntimeError(f"leg ckpt_aqe={ckpt_aqe} produced no JSON:\n{res.stderr[-2000:]}")
    d = json.loads(line[-1])
    d.pop("per_wave", None)
    d["steal_pct"] = round(100.0 * (s1 - s0) * 0.01 / ((t1 - t0) * n_host), 2)
    d["ckpt_aqe"] = ckpt_aqe
    print(f"  arm={'A(aqe-ckpt)' if ckpt_aqe else 'B(static-ckpt)'}: "
          f"{d['urls_per_sec']} urls/s ({d['wall_sec']}s, steal={d['steal_pct']}%)",
          flush=True)
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--scale", default="xsat")
    ap.add_argument("--wave-budget", type=int, default=400_000)
    ap.add_argument("--max-waves", type=int, default=4)
    ap.add_argument("--image-px", type=int, default=224)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument("--quiet-gate", type=float, default=None,
                    help="before each pair, probe steal%% for 15s and defer "
                         "launch until it is below this gate; keep collecting "
                         "pairs until --quiet-target pairs have both legs "
                         "<=1%% steal or --max-hours elapses (overrides "
                         "--pairs). Launch-time gating only — every launched "
                         "pair is recorded.")
    ap.add_argument("--quiet-target", type=int, default=2)
    ap.add_argument("--max-hours", type=float, default=2.0)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "ab_r4_ckpt.json"))
    args = ap.parse_args()

    def _n_quiet(ra, rb):
        return sum(1 for a, b in zip(ra, rb)
                   if a["steal_pct"] <= 1.0 and b["steal_pct"] <= 1.0)

    runs_a, runs_b = [], []
    t_start, p = time.monotonic(), 0
    while True:
        if args.quiet_gate is not None:
            if _n_quiet(runs_a, runs_b) >= args.quiet_target:
                break
            if time.monotonic() - t_start > args.max_hours * 3600:
                print("  max-hours reached", flush=True)
                break
            g = _steal_probe(15)
            if g > args.quiet_gate:
                print(f"  steal probe {g:.2f}% > gate {args.quiet_gate}% — deferring", flush=True)
                time.sleep(60)
                continue
            print(f"  steal probe {g:.2f}% — launching pair {p}", flush=True)
        elif p >= args.pairs:
            break
        print(f"pair {p}:", flush=True)
        runs_a.append(run_leg(args.cpus, True, args.scale, args.wave_budget,
                              args.max_waves, args.image_px, args.shuffle_partitions))
        runs_b.append(run_leg(args.cpus, False, args.scale, args.wave_budget,
                              args.max_waves, args.image_px, args.shuffle_partitions))
        p += 1
        result = {
            "arm_a": "ckpt compiled under AQE (engine default; keep_layout cuts are static in both arms)",
            "arm_b": "CRAWLSPARK_CKPT_STATIC=1 (every cut compiled statically)",
            "cpus": args.cpus,
            "scale": args.scale,
            "image_px": args.image_px,
            "shuffle_partitions": args.shuffle_partitions,
            "wave_budget": args.wave_budget,
            "max_waves": args.max_waves,
            "median_a_urls_per_sec": statistics.median(r["urls_per_sec"] for r in runs_a),
            "median_b_urls_per_sec": statistics.median(r["urls_per_sec"] for r in runs_b),
            "runs_a": runs_a,
            "runs_b": runs_b,
        }
        result["speedup_b_over_a"] = round(
            result["median_b_urls_per_sec"] / result["median_a_urls_per_sec"], 3
        )
        # quiet pairs: both legs ran with ≤1% hypervisor steal — the change's
        # own effect, separated from external neighbor bursts
        qa = [a["urls_per_sec"] for a, b in zip(runs_a, runs_b)
              if a["steal_pct"] <= 1.0 and b["steal_pct"] <= 1.0]
        qb = [b["urls_per_sec"] for a, b in zip(runs_a, runs_b)
              if a["steal_pct"] <= 1.0 and b["steal_pct"] <= 1.0]
        result["quiet_pairs"] = len(qa)
        result["quiet_median_a"] = statistics.median(qa) if qa else None
        result["quiet_median_b"] = statistics.median(qb) if qb else None
        result["quiet_speedup_b_over_a"] = (
            round(statistics.median(qb) / statistics.median(qa), 3) if qa else None
        )
        result["quiet_gate"] = args.quiet_gate
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    if runs_a:
        print(json.dumps({k: result[k] for k in
                          ("median_a_urls_per_sec", "median_b_urls_per_sec",
                           "speedup_b_over_a", "quiet_pairs",
                           "quiet_speedup_b_over_a")}))


if __name__ == "__main__":
    main()
