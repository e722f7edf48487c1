"""Two-cluster-size scaling evidence (BASELINE.md §3): the same crawl job on
the same deterministic input at N=local[8] and 4N=local[32], ≥3 reps each,
medians reported.

    efficiency = urls_per_sec(local[32]) / (4 × urls_per_sec(local[8]))

Each parallelism level runs in its own subprocess (one SparkSession per
master). Writes BENCH/scaling_r{round}.json and regenerates BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_level(cpus: int, scale: str, wave_budget: int, max_waves: int, reps: int,
              no_images: bool, image_px: int, shuffle_partitions: int) -> list[dict]:
    outs = []
    for rep in range(reps):
        cmd = [
            sys.executable, os.path.join(HERE, "run_crawl.py"),
            "--cpus", str(cpus), "--scale", scale,
            "--wave-budget", str(wave_budget), "--max-waves", str(max_waves),
            "--image-px", str(image_px),
            # IDENTICAL physical partitioning at both levels — the controlled
            # variable is executor parallelism only
            "--shuffle-partitions", str(shuffle_partitions),
        ]
        if no_images:
            cmd.append("--no-images")
        env = dict(os.environ, PYTHONPATH=REPO, CRAWLSPARK_DRIVER_MEM="48g")
        res = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
        line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
        if not line:
            raise RuntimeError(f"rep {rep} cpus={cpus} produced no JSON:\n{res.stderr[-2000:]}")
        d = json.loads(line[-1])
        d.pop("per_wave", None)
        print(f"  cpus={cpus} rep={rep}: {d['urls_per_sec']} urls/s ({d['wall_sec']}s, {d['waves']} waves)", flush=True)
        outs.append(d)
    return outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="large")
    ap.add_argument("--wave-budget", type=int, default=120_000)
    ap.add_argument("--max-waves", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--n4", type=int, default=32)
    ap.add_argument("--no-images", action="store_true")
    ap.add_argument("--image-px", type=int, default=256)
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "scaling.json"))
    args = ap.parse_args()

    levels = {}
    for cpus in (args.n, args.n4):
        outs = run_level(cpus, args.scale, args.wave_budget, args.max_waves,
                         args.reps, args.no_images, args.image_px,
                         args.shuffle_partitions)
        med = statistics.median(o["urls_per_sec"] for o in outs)
        levels[str(cpus)] = {
            "median_urls_per_sec": med,
            "runs": outs,
        }
    t_n = levels[str(args.n)]["median_urls_per_sec"]
    t_4n = levels[str(args.n4)]["median_urls_per_sec"]
    eff = t_4n / (4 * t_n)
    result = {
        "scale": args.scale,
        "image_px": args.image_px,
        "shuffle_partitions": args.shuffle_partitions,
        "wave_budget": args.wave_budget,
        "max_waves": args.max_waves,
        "reps": args.reps,
        "n_cores": args.n,
        "n4_cores": args.n4,
        "throughput_n": t_n,
        "throughput_4n": t_4n,
        "scaling_efficiency": round(eff, 3),
        "levels": levels,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("throughput_n", "throughput_4n", "scaling_efficiency")}))


if __name__ == "__main__":
    main()
