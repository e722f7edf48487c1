"""Round-6 pin: the lazy seed rank (with_inspark_rank) that the admission
phase now uses computes EXACTLY the ranks the old driver-collect form
(with_global_rank) produced — global rank by a unique key is independent of
range-partition boundaries, so the two plans must agree row for row."""

from pyspark.sql import functions as F

from crawlspark import frontier


def test_inspark_rank_matches_global_rank_on_unique_key(spark):
    rows = [(i, f"u{i % 7}") for i in (5, 3, 11, 0, 8, 2, 9, 1, 7, 4, 10, 6)]
    df = spark.createDataFrame(rows, "seed_order long, payload string")

    ranked_lazy = frontier.with_inspark_rank(df, ("seed_order",), "rank")
    ranked_eager, total = frontier.with_global_rank(df, ("seed_order",), "rank")

    got = {(r["seed_order"], r["rank"]) for r in ranked_lazy.collect()}
    want = {(r["seed_order"], r["rank"]) for r in ranked_eager.collect()}
    assert got == want
    assert total == len(rows)
    # rank is dense 1..N in seed_order order
    by_order = sorted(got)
    assert [r for _, r in by_order] == list(range(1, len(rows) + 1))
