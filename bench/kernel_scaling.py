"""Standalone payload-kernel scaling probe (no Spark).

The crawl bench's post-loop results materialization is dominated by
crawlspark.image.fetch_validate_udf's inner work (synthesize -> encode ->
decode -> PSNR -> phash at --px). This harness runs exactly that inner loop
across W worker processes and reports per-process and aggregate throughput,
isolating the kernel's core-count scaling from Spark entirely: if aggregate
rows/sec stops growing past ~8 workers, the kernel is memory-bandwidth-bound
on this host and no Spark-side change can fix the 4N leg.

Usage: python bench/kernel_scaling.py --px 224 --rows-per-worker 400 \
           --workers 4 16
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time
from multiprocessing import Process, Queue

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(wid: int, n_rows: int, px: int, q: Queue) -> None:
    from crawlspark import image as I

    fmts = ("ppm", "bmp", "qnt", "png")
    t0 = time.monotonic()
    acc = 0
    for i in range(n_rows):
        iid = f"img-{wid}-{i}"
        # % 3 ⇒ ppm/bmp/qnt only (png decode is the slow path) — intentional
        # mirror of fetch_validate_udf's format selector (image.py); changing
        # it to % 4 would invalidate every recorded kernel baseline.
        fsel = hashlib.md5(iid.encode()).digest()[0] % 3
        fmt = fmts[fsel]
        ref = I.reference_pixels(iid, px, px)
        payload = I.ENCODERS[fmt](ref)
        decoded = I.DECODERS[fmt](payload)
        p = I.psnr_db(decoded, ref)
        acc ^= I.average_hash(decoded) ^ (p == I.PSNR_EXACT)
    q.put((wid, time.monotonic() - t0, acc))


def run(workers: int, rows: int, px: int) -> dict:
    q: Queue = Queue()
    procs = [Process(target=_worker, args=(w, rows, px, q)) for w in range(workers)]
    t0 = time.monotonic()
    for p in procs:
        p.start()
    outs = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.monotonic() - t0
    total = workers * rows
    return {
        "workers": workers,
        "rows": total,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(total / wall, 1),
        "per_worker_sec": [round(o[1], 3) for o in sorted(outs)],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--px", type=int, default=224)
    ap.add_argument("--rows-per-worker", type=int, default=400)
    ap.add_argument("--workers", type=int, nargs="+", default=[4, 16])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import json

    for w in args.workers:
        best = max(
            (run(w, args.rows_per_worker, args.px) for _ in range(args.reps)),
            key=lambda d: d["rows_per_sec"],
        )
        print(json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
