"""Round-6 optimization harness (guide §1): per-query isolated timing with
the noop sink, plus /proc/stat steal%% capture so a noisy-host run is
self-identifying. Does NOT replace bench.py (frozen for measurement) — this
exists to isolate and compare individual queries while optimizing.

Usage:
    python bench_extra.py [--sf DIR] [--repeats N] [--queries a,b,c]
                          [--explain-dir plans/r06 --explain-tag before]

Prints one JSON line: {"sf": ..., "queries": {name: [sec, ...]},
"steal_pct": ..., "cpus": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def read_cpu_steal():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    total = sum(vals)
    steal = vals[7] if len(vals) > 7 else 0
    return steal, total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--queries", default="")
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--explain-tag", default="before")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from crawlspark.datapipe import release_caches
    from crawlspark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="crawlspark-bench-extra", master=f"local[{cpus}]")
    queries = entrymod.queries()
    names = [q for q in args.queries.split(",") if q] or list(queries)

    # codegen/JIT warmup at the smallest sf (same rationale as bench.py)
    if not args.no_warmup and os.path.isdir("/root/testdata/sf0.001"):
        for name in names:
            try:
                queries[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
        release_caches(spark)

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        import io
        from contextlib import redirect_stdout

        for name in names:
            try:
                df = queries[name](spark, args.sf)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                txt = buf.getvalue()
            except Exception as e:
                txt = f"explain failed: {e}"
            with open(
                os.path.join(args.explain_dir, f"{name}_{args.explain_tag}.txt"), "w"
            ) as f:
                f.write(txt)
            release_caches(spark)

    s0, t0c = read_cpu_steal()
    out: dict[str, list[float]] = {}
    for _ in range(args.repeats):
        for name in names:
            fn = queries[name]
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            out.setdefault(name, []).append(round(time.monotonic() - t0, 3))
            release_caches(spark)
    s1, t1c = read_cpu_steal()
    steal_pct = round(100.0 * (s1 - s0) / max(1, t1c - t0c), 3)
    print(json.dumps({"sf": args.sf, "queries": out, "steal_pct": steal_pct, "cpus": cpus}))


if __name__ == "__main__":
    main()
