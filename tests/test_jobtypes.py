"""P-2 per-job-type Process dispatch + P-3 body link extraction goldens.

Mirrors the reference's books-to-scrape example: a `collect` job extracts
product links from the page body and emits `detail` children (Priority=1,
MaxRetries=3) plus a next-page `collect` child, returning nil data (no
result row); a `detail` job emits a result and no children
(examples/books-to-scrape-simple/bookstoscrape/collect_job.go:19-72,
detail_job.go:15-30). Links no rule claims are ignored entirely.
"""

from crawlspark import constants as C
from crawlspark import synth
from crawlspark.engine import CrawlConfig, CrawlEngine
from crawlspark.jobtypes import ChildRule, JobTypeSpec
from crawlspark.oracle import run_oracle

SHOP_SPECS = {
    "collect": JobTypeSpec(
        "collect",
        emit_result=False,  # Process returns nil data (collect_job.go:71)
        child_rules=(
            # product links → detail jobs with Priority=1, MaxRetries=3
            # (collect_job.go:36-48)
            ChildRule("/p/", "detail", priority=1, max_retries=3),
            # next-page link → another collect job (collect_job.go:50-69)
            ChildRule("/page/", "collect"),
        ),
    ),
    "detail": JobTypeSpec("detail", emit_result=True, child_rules=()),
}


def _seed(job_id, url, order, **kw):
    d = {
        "job_id": job_id, "url": url, "method": "GET", "body": None,
        "headers": {}, "url_params": {}, "priority": 0, "max_retries": 2,
        "retry_policy": C.RETRY_JOB,
        "max_retry_delay_us": C.DEFAULT_MAX_RETRY_DELAY_US, "seed_order": order,
    }
    d.update(kw)
    return d


def _shop_world():
    """3 catalog pages, 3 products each, plus rule-less /banner links that
    must be ignored (never fetched, never 'seen')."""
    world = synth.make_world(n_hosts=2, total_pages=20)
    host = "h0000.test"
    world.pages = {}
    n_cat, per_page = 3, 3
    for k in range(n_cat):
        links = [f"http://{host}/p/{k * per_page + j}" for j in range(per_page)]
        links.append(f"http://{host}/banner/{k}")  # no rule claims this
        if k + 1 < n_cat:
            links.append(f"http://{host}/page/{k + 1}")
        canon = synth.canon_of(f"http://{host}/page/{k}")
        world.pages[canon] = synth.PageSpec(
            url_canon=canon, status=200, flaky_attempts=0,
            body_image_id=None, out_links=links, latency_us=1000,
        )
    for i in range(n_cat * per_page):
        canon = synth.canon_of(f"http://{host}/p/{i}")
        world.pages[canon] = synth.PageSpec(
            url_canon=canon, status=200, flaky_attempts=0,
            body_image_id=None, out_links=[], latency_us=1000,
        )
    world.seeds = [_seed("collect00", f"http://{host}/page/0", 0, job_type="collect")]
    world.robots = [{"host": host, "disallow_prefixes": [], "crawl_delay_us": None}]
    world.politeness = [{"host": host, "max_per_wave": 100}]
    return world


def _run_both(spark, world, specs=None, extract_from_body=False, **cfg_kwargs):
    cfg = CrawlConfig(
        validate_images=False, job_types=specs,
        extract_links_from_body=extract_from_body, **cfg_kwargs
    )
    eng = CrawlEngine(
        spark,
        pages=synth.pages_df(spark, world, with_body_html=extract_from_body),
        robots=synth.robots_df(spark, world),
        budgets=synth.politeness_df(spark, world),
        images=None,
        config=cfg,
    )
    run = eng.run(synth.seeds_df(spark, world))
    golden = run_oracle(
        world, wave_budget=cfg.wave_budget,
        default_host_budget=cfg.default_host_budget,
        wave_period_us=cfg.wave_period_us, max_waves=cfg.max_waves,
        job_types=specs,
    )
    return run, golden


def _assert_bit_for_bit(run, golden):
    got = [(r.wave, r.rank, r.job_id, r.url_canon)
           for r in run.order.orderBy("wave", "rank").collect()]
    want = [(g["wave"], g["rank"], g["job_id"], g["url_canon"]) for g in golden.crawl_order]
    assert got == want
    got_r = [(r.wave, r.rank, r.job_id, r.status)
             for r in run.results.orderBy("wave", "rank").collect()]
    want_r = [(g["wave"], g["rank"], g["job_id"], g["status"]) for g in golden.results]
    assert got_r == want_r
    assert run.seen.count() == len(golden.seen)


def test_collect_detail_dispatch(spark):
    world = _shop_world()
    run, golden = _run_both(spark, world, specs=SHOP_SPECS, wave_budget=50)
    _assert_bit_for_bit(run, golden)

    order = run.order.orderBy("wave", "rank").collect()
    results = run.results.collect()
    # collect jobs emit NO results; every result is a /p/ detail page
    assert results and all("/p/" in r.url_canon for r in results)
    assert len(results) == 9  # 3 catalog pages × 3 products
    # banner links were ignored: never fetched, never seen
    assert not any("/banner/" in r.url_canon for r in order)
    assert run.seen.filter("cache_key IS NOT NULL").count() == len(golden.seen)
    # the collect chain walks pages in order: /page/0 wave 1, /page/1 wave 2, ...
    cat_waves = {r.url_canon.rsplit("/", 1)[1]: r.wave for r in order if "/page/" in r.url_canon}
    assert cat_waves == {"0": 1, "1": 2, "2": 3}
    # parent-before-child: each catalog's products fetch the wave after it
    for r in results:
        assert r.wave >= 2


def test_collect_detail_with_body_extraction(spark):
    # P-3: identical crawl when links come from regexp over body_html
    world = _shop_world()
    run, golden = _run_both(
        spark, world, specs=SHOP_SPECS, extract_from_body=True, wave_budget=50
    )
    _assert_bit_for_bit(run, golden)
    assert run.results.count() == 9


def test_body_extraction_matches_outlinks_on_standard_world(spark):
    # extraction is semantics-preserving on the full messy link corpus
    # (uppercase hosts, :80 ports, fragments, dupes — urlnorm must still fold)
    world = synth.make_world(n_hosts=5, total_pages=80)
    run, golden = _run_both(spark, world, extract_from_body=True, wave_budget=40)
    _assert_bit_for_bit(run, golden)
