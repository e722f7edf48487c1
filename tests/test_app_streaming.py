"""CrawlApp facade (writers fan-out, config wiring) + the Structured
Streaming politeness variant."""

import json
import os

import pytest

from crawlspark import synth
from crawlspark.app import AppConfig, CrawlApp


@pytest.fixture(scope="module")
def world():
    return synth.make_world(n_hosts=4, total_pages=60)


def test_app_runs_and_fans_out_to_all_writers(spark, world, tmp_path_factory):
    out = tmp_path_factory.mktemp("writers")
    cfg = AppConfig(
        wave_budget=40,
        validate_images=False,
        n_proxies=3,
        writers=[("csv", str(out / "csv")), ("json", str(out / "json"))],
    )
    app = CrawlApp(
        spark,
        pages=synth.pages_df(spark, world),
        robots=synth.robots_df(spark, world),
        budgets=synth.politeness_df(spark, world),
        config=cfg,
    )
    run = app.start(synth.seeds_df(spark, world))
    n = run.results.count()
    assert n > 0
    # true fan-out: BOTH sinks hold the full result stream (upgrade over the
    # reference's competing-writers channel, documented in app.py)
    csv_n = spark.read.option("header", True).csv(str(out / "csv")).count()
    json_rows = spark.read.json(str(out / "json"))
    assert csv_n == n
    assert json_rows.count() == n
    # F-18 proxy round-robin column present and bounded
    assert json_rows.filter("proxy_id < 0 OR proxy_id >= 3").count() == 0


def test_app_default_robots_budgets(spark, world):
    app = CrawlApp(spark, pages=synth.pages_df(spark, world),
                   config=AppConfig(wave_budget=20, validate_images=False, max_waves=2))
    run = app.start(synth.seeds_df(spark, world))
    assert run.waves == 2 and run.order.count() > 0


def test_streaming_politeness_budget(spark, tmp_path_factory):
    import pandas as pd

    from crawlspark.streaming import politeness_stream

    src = tmp_path_factory.mktemp("stream_src")
    rows = []
    for host in ("a.test", "b.test"):
        for i in range(10):
            rows.append({"host": host, "job_id": f"{host}/{i}", "priority": i % 3, "seq": i})
    pdf = pd.DataFrame(rows)
    spark.createDataFrame(pdf, "host string, job_id string, priority int, seq long").write.mode(
        "overwrite"
    ).parquet(str(src / "batch0"))

    stream = (
        spark.readStream.schema("host string, job_id string, priority int, seq long")
        .parquet(str(src / "batch0"))
    )
    admitted = politeness_stream(stream, budget_per_host=4)
    q = (
        admitted.writeStream.format("memory")
        .queryName("admit_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM admit_out").collect()
    assert len(out) == 20
    per_host = {}
    for r in out:
        per_host.setdefault(r.host, []).append(r)
    for host, rs in per_host.items():
        assert sum(1 for r in rs if r.admitted) == 4, host
        # best-first: the admitted 4 are the (priority, seq)-smallest
        best = sorted(rs, key=lambda r: (r.priority, r.seq))[:4]
        assert all(r.admitted for r in best), host


def test_streaming_dedup_first_occurrence_across_batches(spark, tmp_path_factory):
    import pandas as pd

    from crawlspark.streaming import dedup_stream

    src = tmp_path_factory.mktemp("dedup_src")
    # two files -> two micro-batches (maxFilesPerTrigger=1); keys overlap
    pd_a = pd.DataFrame({"cache_key": [f"k{i}" for i in range(10)], "batch": 0})
    pd_b = pd.DataFrame({"cache_key": [f"k{i}" for i in range(5, 15)], "batch": 1})
    spark.createDataFrame(pd_a, "cache_key string, batch int").coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(pd_b, "cache_key string, batch int").coalesce(1).write.parquet(str(src / "f1"))

    stream = (
        spark.readStream.schema("cache_key string, batch int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        dedup_stream(stream).writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_out").collect()
    # every key exactly once, 15 distinct keys survive out of 20 rows
    assert sorted(r.cache_key for r in out) == sorted(f"k{i}" for i in range(15))
