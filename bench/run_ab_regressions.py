"""Interleaved A/B for the queries round 2 flagged as regressed-or-reworked.

Protocol (BENCH/BASELINE.md variance note): this box shows 1.2-2.7× spread
on identical workloads under load, so plan comparisons are only valid when
the variants ALTERNATE within one process — every rep of A is adjacent in
time to a rep of B, so machine noise hits both. ≥5 reps each, medians
reported, warmup pass first (codegen), caches released between runs.

Pairs:
  cosine_topk      A = round-2 plan (HOF dot products + full-corpus per-query
                       window)  B = round-3 plan (numpy-matmul mapInPandas +
                       per-batch top-k + re-rank)
  quantize_int8    A = HOF array expressions  B = numpy pandas UDF
  tfidf_top_terms  A = round-2 plan (eager count + forced vocab broadcast)
                   B = round-3 plan (lazy in-plan N, no broadcast hint)
  ngram_jaccard    A = uncapped shingle join (round-1 shape)  B = df-capped
Singles (plans byte-identical across rounds — pure variance probes):
  lang_id_heuristic, embedding_neardup

Usage: cd /root/repo && python bench/run_ab_regressions.py [--reps 5]
Writes BENCH/ab_r3.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)))
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawlspark.datapipe import release_caches
    from crawlspark.datapipe.dedup import embedding_neardup_pairs, ngram_jaccard_pairs
    from crawlspark.datapipe.similarity import _dot, _norm, cosine_topk, quantize_int8
    from crawlspark.datapipe.text import with_text_features
    from crawlspark.session import get_spark

    spark = get_spark(app_name="crawlspark-ab", master=f"local[{args.cpus}]")
    sf = args.sf_dir

    def emb():
        return (
            spark.read.parquet(f"{sf}/embeddings.parquet")
            .withColumn("embedding", F.transform(F.col("embedding"), lambda x: x.cast("double")))
        )

    def docs():
        return spark.read.parquet(f"{sf}/documents.parquet")

    def cosine_r2():
        # the replaced round-2 plan, verbatim shape: broadcast NLJ + HOF dot
        # + per-query window over the FULL corpus
        e = emb()
        c = e.select(F.col("vec_id").alias("nbr_id"), F.col("embedding").alias("cv"),
                     _norm(F.col("embedding")).alias("cn"))
        q = e.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"),
            _norm(F.col("embedding")).alias("qn"))
        scored = c.join(F.broadcast(q), F.col("query_id") != F.col("nbr_id")).withColumn(
            "cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
        return (scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
                .select("query_id", "nbr_id", F.round("cosine", 6).alias("cosine"),
                        F.col("rk").cast("int").alias("rk")))

    def tfidf_r2():
        # the replaced round-2 plan: eager count + forced broadcast of dfreq
        from crawlspark.datapipe.text import tokens
        d = docs()
        n_docs = d.count()
        tok = d.select(F.col("doc_id"), F.explode(tokens(F.col("text"))).alias("term"))
        tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
        dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
        idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + F.lit(1.0)
        scored = tf.join(F.broadcast(dfreq), "term").withColumn("tfidf", F.round(F.col("tf") * idf, 6))
        w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
        return (scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
                .select("doc_id", "term", "tfidf", F.col("rk").cast("int").alias("rk")))

    def tfidf_r3():
        from crawlspark.datapipe.text import tfidf_top_terms
        return tfidf_top_terms(docs(), k=3)

    PAIRS = {
        "cosine_topk": {
            "A_r2_hof_window": cosine_r2,
            "B_r3_numpy_two_phase": lambda: cosine_topk(emb(), emb().filter(F.col("vec_id") < 8), k=5),
        },
        "quantize_int8": {
            "A_hof": lambda: quantize_int8(spark.read.parquet(f"{sf}/embeddings.parquet"), impl="hof"),
            "B_numpy": lambda: quantize_int8(spark.read.parquet(f"{sf}/embeddings.parquet"), impl="numpy"),
        },
        "tfidf_top_terms": {
            "A_r2_eager_broadcast": tfidf_r2,
            "B_r3_lazy_noforce": tfidf_r3,
        },
        "ngram_jaccard": {
            "A_uncapped_r1": lambda: ngram_jaccard_pairs(docs(), min_jaccard=0.5, df_max=10**9),
            "B_dfcapped_r2": lambda: ngram_jaccard_pairs(docs(), min_jaccard=0.5),
        },
        "lang_id_heuristic": {
            "A_same_plan": lambda: with_text_features(docs()).select("doc_id", "lang_pred"),
        },
        "embedding_neardup": {
            "A_same_plan": lambda: embedding_neardup_pairs(
                emb().filter(F.col("vec_id") < 200), threshold=0.9),
        },
    }

    def run_once(build) -> float:
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        release_caches(spark)
        return dt

    # warmup every variant once (codegen/JIT), untimed
    for variants in PAIRS.values():
        for build in variants.values():
            run_once(build)

    samples: dict[str, dict[str, list[float]]] = {
        name: {v: [] for v in variants} for name, variants in PAIRS.items()
    }
    for _rep in range(args.reps):
        for name, variants in PAIRS.items():
            for vname, build in variants.items():  # interleaved: A then B, per rep
                samples[name][vname].append(round(run_once(build), 3))

    out = {"reps": args.reps, "sf_dir": sf, "cpus": args.cpus, "results": {}}
    for name, variants in samples.items():
        out["results"][name] = {
            vname: {"median": round(statistics.median(ts), 3), "runs": ts}
            for vname, ts in variants.items()
        }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BENCH", "ab_r3.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
