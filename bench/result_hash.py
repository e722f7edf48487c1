"""Result-equivalence checker for optimization rounds: computes an
order-insensitive hash of every declared query's full output at a given sf
dir, so a plan restructure can be PROVEN to compute identical results before
it ships (the round-6 rule: no declared query may change what it computes).

Usage:
    python bench/result_hash.py --sf /root/testdata/sf0.01 --out /tmp/h.json
    python bench/result_hash.py --sf ... --out /tmp/h2.json --compare /tmp/h.json
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def row_hash(df) -> tuple[str, int]:
    """Order-insensitive md5 over the canonicalized rows + schema."""
    cols = df.columns
    rows = df.collect()
    canon = sorted(repr(tuple(r[c] for c in cols)) for r in rows)
    h = hashlib.md5()
    h.update(repr([(f.name, f.dataType.simpleString()) for f in df.schema.fields]).encode())
    for line in canon:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest(), len(rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--compare", default="")
    ap.add_argument("--queries", default="")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from crawlspark.datapipe import release_caches
    from crawlspark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="result-hash", master=f"local[{cpus}]")
    queries = entrymod.queries()
    names = [q for q in args.queries.split(",") if q] or list(queries)

    out: dict[str, dict] = {}
    for name in names:
        try:
            h, n = row_hash(queries[name](spark, args.sf))
            out[name] = {"hash": h, "rows": n}
        except Exception as e:
            out[name] = {"hash": None, "rows": None, "err": repr(e)[:200]}
        release_caches(spark)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    if args.compare:
        with open(args.compare) as f:
            base = json.load(f)
        bad = []
        for name, rec in out.items():
            b = base.get(name)
            if b is None:
                continue
            if b["hash"] != rec["hash"] or b["rows"] != rec["rows"]:
                bad.append((name, b, rec))
        if bad:
            print("MISMATCH:")
            for name, b, rec in bad:
                print(f"  {name}: base={b} new={rec}")
            sys.exit(1)
        print(f"OK: {len(out)} queries identical vs {args.compare}")


if __name__ == "__main__":
    main()
