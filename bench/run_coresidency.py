"""Control G (BASELINE.md §2l): hardware co-residency measured with ZERO
Spark-level sharing.

Launches `--legs` COMPLETELY INDEPENDENT crawl benches simultaneously, each
taskset-pinned to its own disjoint core quad, each with its own driver JVM,
its own in-process executor (local[4]), its own python UDF workers, its own
block-manager local dirs (Spark's per-app spark-<uuid> tempdirs) — nothing
shared above the operating system. The legs run the IDENTICAL workload a
lone pinned 4-core leg runs solo (Control A: 3,444.9 urls/s at 12 g).

If the aggregate of 4 co-resident-but-independent legs lands in the 16-wide
band (~8,800-9,600 urls/s), pure silicon sharing (LLC / memory-controller
queueing / one disk) reproduces the measured N->4N shortfall with zero
engine involvement — the single-application 16-wide execution is exonerated.
If each leg instead holds >=3,400 (aggregate >=13,600), hardware is refuted
and the channel must live inside one application's 16-wide execution.

Pre-registered in BENCH/BASELINE.md SS2l before the first run.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, HERE)

from run_scaling import (  # noqa: E402
    _bw_probe_mbps,
    _set_status,
    _steal_jiffies,
    _steal_probe,
    _wait_not_busy,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", type=int, default=4)
    ap.add_argument("--cores-per-leg", type=int, default=4)
    ap.add_argument("--scale", default="x10sat")
    ap.add_argument("--wave-budget", type=int, default=1_000_000)
    ap.add_argument("--max-waves", type=int, default=4)
    ap.add_argument("--image-px", type=int, default=224)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument("--bloom-bits", type=int, default=16_777_216)
    ap.add_argument("--driver-mem", default="12g")
    ap.add_argument("--quiet-gate", type=float, default=0.5)
    ap.add_argument("--leg-timeout", type=int, default=12_000)
    ap.add_argument(
        "--out",
        default=os.path.join(REPO, "BENCH", "scaling_r5_ctrl_G_coresidency.json"),
    )
    args = ap.parse_args()

    _wait_not_busy()
    while True:
        p = _steal_probe(15)
        if p <= args.quiet_gate:
            print(
                f"  steal probe {p:.2f}% — launching {args.legs} co-resident legs",
                flush=True,
            )
            break
        print(f"  steal probe {p:.2f}% > gate {args.quiet_gate}% — deferring", flush=True)
        time.sleep(30)

    _set_status("ctrl_G_legs_running", args.legs * args.cores_per_leg)
    bw0 = _bw_probe_mbps()
    s0, t0 = _steal_jiffies(), time.monotonic()
    procs = []
    for i in range(args.legs):
        lo = i * args.cores_per_leg
        hi = lo + args.cores_per_leg - 1
        cmd = [
            "taskset", "-c", f"{lo}-{hi}",
            sys.executable, os.path.join(HERE, "run_crawl.py"),
            "--cpus", str(args.cores_per_leg),
            "--scale", args.scale,
            "--wave-budget", str(args.wave_budget),
            "--max-waves", str(args.max_waves),
            "--image-px", str(args.image_px),
            "--shuffle-partitions", str(args.shuffle_partitions),
            "--bloom-bits", str(args.bloom_bits),
        ]
        # progress output suppressed and legs redirected to FILES, not pipes:
        # with subprocess.PIPE and a sequential communicate() loop, legs 1..3
        # fill their 64 KB stdout pipe with ConsoleProgressBar output and then
        # BLOCK inside SparkContext.runJob (the progress bar's finishAll lock
        # is held by the thread stuck writing to the full pipe), serializing
        # the legs and voiding the co-residency measurement. Measured, not
        # hypothetical: the first launch ran leg 0 at full speed while legs
        # 1-3 sat deadlocked at ~5% CPU for 45 minutes.
        cmd += ["--conf", "spark.ui.showConsoleProgress=false"]
        env = dict(os.environ, PYTHONPATH=REPO,
                   CRAWLSPARK_DRIVER_MEM=args.driver_mem)
        out_f = open(os.path.join("/tmp", f"crawlspark_ctrlG_leg{i}.out"), "w+")
        err_f = open(os.path.join("/tmp", f"crawlspark_ctrlG_leg{i}.err"), "w+")
        procs.append(
            (subprocess.Popen(cmd, stdout=out_f, stderr=err_f,
                              text=True, env=env), out_f, err_f)
        )

    legs: list[dict] = []
    try:
        for i, (proc, out_f, err_f) in enumerate(procs):
            proc.wait(timeout=args.leg_timeout)
            out_f.seek(0)
            out = out_f.read()
            err_f.seek(0)
            err = err_f.read()
            lines = [ln for ln in out.splitlines() if ln.startswith("{")]
            if not lines:
                raise RuntimeError(f"leg {i} produced no JSON:\n{err[-2000:]}")
            d = json.loads(lines[-1])
            # keep per_wave: the wave-loop vs payload-teardown split is the
            # decomposition the co-residency analysis needs (the wave loop is
            # the contended phase; the teardown scales ~1.0)
            d["leg"] = i
            d["cores"] = f"{i * args.cores_per_leg}-{i * args.cores_per_leg + args.cores_per_leg - 1}"
            legs.append(d)
            print(
                f"  leg {i} (cores {d['cores']}): {d['urls_per_sec']} urls/s "
                f"({d['wall_sec']}s, {d['waves']} waves)",
                flush=True,
            )
    except BaseException:
        # a timeout / missing-JSON error must not leave sibling Spark legs
        # running with the host status stuck at 'ctrl_G_legs_running' (the
        # busy flag other collectors gate on) — round-6 advice fix
        for proc, _, _ in procs:
            if proc.poll() is None:
                proc.kill()
        _set_status("idle")
        raise
    finally:
        for _, out_f, err_f in procs:
            for fh in (out_f, err_f):
                try:
                    fh.close()
                except Exception:
                    pass
    s1, t1 = _steal_jiffies(), time.monotonic()
    bw1 = _bw_probe_mbps()
    _set_status("idle")

    ncpu = os.cpu_count() or 1
    window = t1 - t0
    steal = round(100.0 * (s1 - s0) * 0.01 / (window * ncpu), 2)
    # every leg runs the identical deterministic workload — sanity-pin it
    counts = {(l["scheduled"], l["new_urls"], l["deduped"]) for l in legs}
    agg = round(sum(l["urls_per_sec"] for l in legs), 1)
    walls = [l["wall_sec"] for l in legs]
    # overlap fraction: the co-residency claim needs the legs actually
    # running together — min leg wall over the max leg wall
    overlap = round(min(walls) / max(walls), 3)
    result = {
        "control": "G_coresidency",
        "legs": args.legs,
        "cores_per_leg": args.cores_per_leg,
        "scale": args.scale,
        "wave_budget": args.wave_budget,
        "max_waves": args.max_waves,
        "image_px": args.image_px,
        "shuffle_partitions": args.shuffle_partitions,
        "bloom_bits": args.bloom_bits,
        "driver_mem": args.driver_mem,
        "pinned": True,
        "identical_counts_across_legs": len(counts) == 1,
        "aggregate_urls_per_sec": agg,
        "per_leg_urls_per_sec": [l["urls_per_sec"] for l in legs],
        "leg_wall_overlap": overlap,
        "window_wall_sec": round(window, 3),
        "steal_pct": steal,
        "bw_probe_mbps": [bw0, bw1],
        "solo_baselines": {
            "ctrl_A_local4_12g": 3444.9,
            "ctrl_F_cluster1x4_12g": 3624.4,
        },
        "runs": legs,
        "measured_round": 5,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({
        "aggregate_urls_per_sec": agg,
        "per_leg": [l["urls_per_sec"] for l in legs],
        "steal_pct": steal,
        "overlap": overlap,
    }))


if __name__ == "__main__":
    main()
