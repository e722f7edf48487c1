"""Runnable twin of the reference's books-to-scrape example
(`/root/reference/examples/books-to-scrape-simple`): a `collect` job type
walks catalog pages, emitting `detail` children (Priority=1, MaxRetries=3)
for each product link plus a next-page `collect` child, and returns no data;
a `detail` job type emits one result row and no children. Links no rule
claims (/banner/...) are ignored entirely — never fetched, never "seen".

Run:  cd /root/repo && python examples/books_to_scrape.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from crawlspark import constants as C
from crawlspark import synth
from crawlspark.engine import CrawlConfig, CrawlEngine
from crawlspark.jobtypes import ChildRule, JobTypeSpec
from crawlspark.session import get_spark

HOST = "books.test"

SPECS = {
    "collect": JobTypeSpec(
        "collect",
        emit_result=False,  # Process returns nil data (collect_job.go:71)
        child_rules=(
            ChildRule("/catalogue/", "detail", priority=1, max_retries=3),
            ChildRule("/page/", "collect"),
        ),
    ),
    "detail": JobTypeSpec("detail", emit_result=True, child_rules=()),
}


def shop_world(n_pages: int = 4, per_page: int = 5) -> synth.World:
    world = synth.make_world(n_hosts=1, total_pages=8)  # shell; pages replaced
    world.pages = {}
    for k in range(n_pages):
        links = [
            f"http://{HOST}/catalogue/book-{k * per_page + j}" for j in range(per_page)
        ]
        links.append(f"http://{HOST}/banner/{k}")  # no rule claims this
        if k + 1 < n_pages:
            links.append(f"http://{HOST}/page/{k + 1}")
        canon = synth.canon_of(f"http://{HOST}/page/{k}")
        world.pages[canon] = synth.PageSpec(
            url_canon=canon, status=200, flaky_attempts=0,
            body_image_id=None, out_links=links, latency_us=1000,
        )
    for i in range(n_pages * per_page):
        canon = synth.canon_of(f"http://{HOST}/catalogue/book-{i}")
        world.pages[canon] = synth.PageSpec(
            url_canon=canon, status=200, flaky_attempts=0,
            body_image_id=None, out_links=[], latency_us=1000,
        )
    world.seeds = [{
        "job_id": "collect00", "url": f"http://{HOST}/page/0", "method": "GET",
        "body": None, "headers": {}, "url_params": {}, "priority": 0,
        "max_retries": 2, "retry_policy": C.RETRY_JOB,
        "max_retry_delay_us": C.DEFAULT_MAX_RETRY_DELAY_US, "seed_order": 0,
        "job_type": "collect",
    }]
    world.robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_us": None}]
    world.politeness = [{"host": HOST, "max_per_wave": 100}]
    return world


def main() -> None:
    spark = get_spark(app_name="books-to-scrape", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    world = shop_world()
    eng = CrawlEngine(
        spark,
        pages=synth.pages_df(spark, world),
        robots=synth.robots_df(spark, world),
        budgets=synth.politeness_df(spark, world),
        images=None,
        config=CrawlConfig(validate_images=False, job_types=SPECS, wave_budget=50),
    )
    run = eng.run(synth.seeds_df(spark, world))

    print("\ncrawl order (wave, rank, url):")
    for r in run.order.orderBy("wave", "rank").collect():
        print(f"  {r.wave}  {r.rank:>3}  {r.url_canon}")

    n_detail = run.results.count()
    print(f"\nresults ({n_detail} rows — detail jobs only; collect emits none):")
    for r in run.results.orderBy("wave", "rank").limit(5).collect():
        print(f"  {r.job_id}  status={r.status}  {r.url_canon}")
    banner_seen = run.seen.filter("cache_key LIKE '%banner%'").count()
    print(f"\nbanner links fetched or seen: {banner_seen} (rule-less links are ignored)")
    assert n_detail == 20 and banner_seen == 0
    print("OK")
    spark.stop()


if __name__ == "__main__":
    main()
