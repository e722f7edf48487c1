"""F-24 fetcher flavors: the js fetcher observes render-injected links the
plain http fetcher cannot (jshttp.go:191-235 vs nethttp.go:34-92). Both
flavors must match their oracle bit-for-bit, and js must strictly discover
more of the world."""

from crawlspark import synth
from crawlspark.engine import CrawlConfig, CrawlEngine
from crawlspark.oracle import run_oracle


def _run_both(spark, world, fetcher):
    cfg = CrawlConfig(validate_images=False, wave_budget=60, fetcher=fetcher)
    eng = CrawlEngine(
        spark,
        pages=synth.pages_df(spark, world),
        robots=synth.robots_df(spark, world),
        budgets=synth.politeness_df(spark, world),
        images=None,
        config=cfg,
    )
    run = eng.run(synth.seeds_df(spark, world))
    golden = run_oracle(world, wave_budget=60, fetcher=fetcher)
    return run, golden


def test_js_fetcher_discovers_ajax_links(spark):
    world = synth.make_world(n_hosts=5, total_pages=90)
    assert any(p.js_links for p in world.pages.values())

    for fetcher in ("http", "js"):
        run, golden = _run_both(spark, world, fetcher)
        got = [(r.wave, r.rank, r.job_id, r.url_canon)
               for r in run.order.orderBy("wave", "rank").collect()]
        want = [(g["wave"], g["rank"], g["job_id"], g["url_canon"])
                for g in golden.crawl_order]
        assert got == want, fetcher
        ajax = [u for (_, _, _, u) in got if "/ajax/" in u]
        if fetcher == "http":
            http_order, http_ajax = got, ajax
            assert not ajax  # invisible without rendering
        else:
            assert ajax  # js rendering exposes them
            # js crawls a strict superset of the http-reachable URL set
            assert {u for (_, _, _, u) in http_order} <= {u for (_, _, _, u) in got}
