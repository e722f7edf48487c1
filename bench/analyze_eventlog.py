"""Stage-level profile of a crawl bench run from the Spark event log.

Finds where the wave loop's cores go idle: for every stage, wall time,
task count, per-task run-time distribution (p50/max), and an estimated
tail-idle cost = (stage wall) x cores - (sum of task run times) — the
core-seconds the stage held its cores without running tasks on them.
Stages are attributed to waves via the engine's per-wave job groups
(engine.py setJobGroup("wave-N")).

Usage: python bench/analyze_eventlog.py /tmp/sparklogs/<app-id> [--cores 16]
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="event log file (or dir containing one)")
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    path = args.path
    if os.path.isdir(path):
        entries = [os.path.join(path, p) for p in os.listdir(path)
                   if not p.startswith(".")]
        path = max(entries, key=os.path.getmtime)

    stage_info: dict[int, dict] = {}
    stage_tasks: dict[int, list] = defaultdict(list)
    stage_group: dict[int, str] = {}
    job_group: dict[int, str] = {}

    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                gid = (ev.get("Properties") or {}).get("spark.jobGroup.id", "")
                job_group[ev["Job ID"]] = gid
                for sid in ev.get("Stage IDs", []):
                    stage_group[sid] = gid
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub, comp = si.get("Submission Time"), si.get("Completion Time")
                stage_info[sid] = {
                    "name": si.get("Stage Name", "")[:90],
                    "tasks": si.get("Number of Tasks", 0),
                    "wall_s": (comp - sub) / 1e3 if sub and comp else None,
                }
            elif t == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                tm = ev.get("Task Metrics") or {}
                run_ms = tm.get("Executor Run Time", 0)
                dur_ms = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                stage_tasks[sid].append((run_ms / 1e3, dur_ms / 1e3))

    rows = []
    for sid, info in stage_info.items():
        runs = sorted(r for r, _ in stage_tasks.get(sid, []))
        if not runs or info["wall_s"] is None:
            continue
        p50 = runs[len(runs) // 2]
        mx = runs[-1]
        sum_run = sum(runs)
        idle = info["wall_s"] * args.cores - sum_run
        rows.append({
            "stage": sid,
            "group": stage_group.get(sid, ""),
            "wall_s": round(info["wall_s"], 1),
            "tasks": info["tasks"],
            "p50_task_s": round(p50, 1),
            "max_task_s": round(mx, 1),
            "skew": round(mx / p50, 1) if p50 > 0.05 else None,
            "sum_run_s": round(sum_run, 1),
            "idle_core_s": round(idle, 1),
            "name": info["name"],
        })

    rows.sort(key=lambda r: -r["wall_s"])
    total_wall = sum(r["wall_s"] for r in rows)
    total_idle = sum(max(0.0, r["idle_core_s"]) for r in rows)
    print(f"stages {len(rows)}  Σwall {total_wall:.0f}s  "
          f"Σidle {total_idle:.0f} core-s (of {total_wall * args.cores:.0f})")
    per_group = defaultdict(lambda: [0.0, 0.0])
    for r in rows:
        g = r["group"] or "(none)"
        per_group[g][0] += r["wall_s"]
        per_group[g][1] += max(0.0, r["idle_core_s"])
    for g, (w, i) in sorted(per_group.items()):
        print(f"  group {g or '(none)':<12} wall {w:7.1f}s idle {i:9.0f} core-s")
    print()
    hdr = ("stage", "group", "wall_s", "tasks", "p50", "max", "skew",
           "sum_run", "idle_cs")
    print(("{:>6} {:<10} {:>7} {:>5} {:>7} {:>7} {:>5} {:>8} {:>8}  name"
           ).format(*hdr))
    for r in rows[: args.top]:
        print(("{stage:>6} {group:<10} {wall_s:>7} {tasks:>5} {p50_task_s:>7} "
               "{max_task_s:>7} {skew!s:>5} {sum_run_s:>8} {idle_core_s:>8}  "
               "{name}").format(**r))


if __name__ == "__main__":
    main()
