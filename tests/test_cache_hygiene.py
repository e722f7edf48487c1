"""Cache contract: operators may persist fan-out frames for their own plan,
and `datapipe.release_caches` must leave NO cached frames behind once the
consuming action is done (VERDICT r2 item 9 — storage-memory hygiene for
long-lived sessions)."""

from pyspark.sql import functions as F

from crawlspark.datapipe import release_caches


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _docs(spark):
    rows = [
        (i, f"src{i % 3}", f"the quick brown fox {i % 7} jumps over the lazy dog {i}")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_release_after_each_operator(spark):
    from crawlspark.datapipe.dedup import lsh_candidate_pairs, ngram_jaccard_pairs
    from crawlspark.datapipe.sampling import curation_pipeline, scan_cumsum

    d = _docs(spark)
    # baseline, not zero: in a shared session other suites' localCheckpoint
    # blocks (engine lineage cuts — NOT SQL-cache entries) legitimately
    # survive clearCache; the hygiene claim is about the operators' OWN
    # persisted frames, i.e. storage returns to baseline after release
    release_caches(spark)
    base = _n_cached(spark)
    persisted_any = False
    for build in (
        lambda: lsh_candidate_pairs(d, k=8, bands=4),
        lambda: ngram_jaccard_pairs(d, min_jaccard=0.2),
        lambda: curation_pipeline(d, budget=64, sample_pct=80),
        lambda: scan_cumsum(
            d.select("doc_id", F.length("text").alias("n")), "doc_id", "n"
        ),
    ):
        build().write.format("noop").mode("overwrite").save()  # consuming action
        persisted_any = persisted_any or _n_cached(spark) > base
        release_caches(spark)
        assert _n_cached(spark) <= base  # the hygiene hook fully releases it
    assert persisted_any  # the operators really do persist fan-out frames
