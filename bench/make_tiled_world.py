"""Build a K-times tiled copy of an sf directory for SCALE TIMING checks.

The driver's large-sf worlds are driver-generated and not reproducible here,
so optimization rounds need a stand-in at roughly sf1.0 size to sanity-check
that plan changes hold at scale. This tiles every table K times with
copy-local key offsets (joins stay within a copy) and light per-copy
perturbations (a per-copy suffix token on document text, a cyclic roll of
embedding vectors) so dedup/similarity distributions resemble a fresh
corpus rather than K exact duplicates of the same one.

TIMING USE ONLY: results on a tiled world are not comparable to the
driver's own sf worlds — correctness is pinned at the official sfs by
bench/result_hash.py and the DuckDB oracle suite.

Usage: python bench/make_tiled_world.py --src /root/testdata/sf0.1 \
           --out /root/sfbig --k 10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFF = 100_000_000  # per-copy key offset; far above any sf0.1 key


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from crawlspark.session import get_spark

    spark = get_spark(app_name="make-tiled-world")
    os.makedirs(args.out, exist_ok=True)

    def tiled(name, key_cols, extra=None):
        base = spark.read.parquet(f"{args.src}/{name}.parquet")
        parts = []
        for i in range(args.k):
            df = base
            for c in key_cols:
                df = df.withColumn(c, (F.col(c) + F.lit(i * OFF)).cast("long"))
            if extra is not None:
                df = extra(df, i)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.coalesce(8).write.mode("overwrite").parquet(f"{args.out}/{name}.parquet")
        print(name, "rows:", spark.read.parquet(f"{args.out}/{name}.parquet").count())

    def doc_extra(df, i):
        if i == 0:
            return df
        return df.withColumn("text", F.concat(F.col("text"), F.lit(f" c{i}")))

    def emb_extra(df, i):
        if i == 0:
            return df
        # cyclic roll decorrelates copies while preserving norms/distribution
        n = F.size("embedding")
        rolled = F.concat(
            F.slice("embedding", i + 1, 10_000), F.slice("embedding", 1, i)
        )
        return df.withColumn("embedding", F.when(n > i, rolled).otherwise(F.col("embedding")))

    tiled("documents", ["doc_id"], doc_extra)
    tiled("embeddings", ["vec_id"], emb_extra)
    tiled("events", ["event_id", "user_id"])
    tiled("customer", ["c_custkey"])
    tiled("orders", ["o_orderkey", "o_custkey"])
    tiled("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    tiled("supplier", ["s_suppkey"])
    tiled("part", ["p_partkey"])
    for name in ("nation", "region"):
        spark.read.parquet(f"{args.src}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/{name}.parquet")
        print(name, "copied")


if __name__ == "__main__":
    main()
