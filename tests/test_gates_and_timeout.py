"""Golden tests for round-2 reference semantics:

  * O-1 use_in_results result-emit gate (job.go:112-114, scrapemate.go:585-591)
  * F-5 init-job BFS-to-exhaustion with results discarded (scrapemate.go:489-523)
  * F-17 per-job timeout (job.go:259-262, jshttp.go:219-226)
  * POST bodies/headers round-trip through the frontier (job.go:63-104,117-130)
  * F-22 private-network guard (local_proxy.go:375-386)

Every case runs the Spark engine AND the pure-Python oracle over the same
world and asserts bit-for-bit agreement, plus the semantic property itself.
"""

import pytest

from crawlspark import constants as C
from crawlspark import synth
from crawlspark.engine import CrawlConfig, CrawlEngine
from crawlspark.oracle import run_oracle


def _seed(job_id, url, order, **kw):
    d = {
        "job_id": job_id,
        "url": url,
        "method": "GET",
        "body": None,
        "headers": {},
        "url_params": {},
        "priority": 0,
        "max_retries": 2,
        "retry_policy": C.RETRY_JOB,
        "max_retry_delay_us": C.DEFAULT_MAX_RETRY_DELAY_US,
        "seed_order": order,
    }
    d.update(kw)
    return d


def _run_both(spark, world, **cfg_kwargs):
    cfg = CrawlConfig(validate_images=False, **cfg_kwargs)
    eng = CrawlEngine(
        spark,
        pages=synth.pages_df(spark, world),
        robots=synth.robots_df(spark, world),
        budgets=synth.politeness_df(spark, world),
        images=None,
        config=cfg,
    )
    run = eng.run(synth.seeds_df(spark, world))
    golden = run_oracle(
        world,
        wave_budget=cfg.wave_budget,
        default_host_budget=cfg.default_host_budget,
        wave_period_us=cfg.wave_period_us,
        max_waves=cfg.max_waves,
    )
    return run, golden


def _assert_bit_for_bit(run, golden):
    got_order = [
        (r.wave, r.rank, r.job_id) for r in run.order.orderBy("wave", "rank").collect()
    ]
    want_order = [(g["wave"], g["rank"], g["job_id"]) for g in golden.crawl_order]
    assert got_order == want_order
    got_results = [
        (r.wave, r.rank, r.job_id, r.status, r.attempts)
        for r in run.results.orderBy("wave", "rank").collect()
    ]
    want_results = [
        (g["wave"], g["rank"], g["job_id"], g["status"], g["attempts"])
        for g in golden.results
    ]
    assert got_results == want_results
    got_term = {r.job_id: (r.attempts, r.final_state) for r in run.terminal.collect()}
    want_term = {g["job_id"]: (g["attempts"], g["final_state"]) for g in golden.retry_trace}
    assert got_term == want_term


def test_init_job_bfs_runs_first_and_discards_results(spark):
    # login.go-style init seed: its whole BFS tree fetches before any regular
    # job, and none of its results are emitted
    world = synth.make_world(n_hosts=4, total_pages=80)
    world.seeds = [
        _seed("init0000", synth._page_url(0, 0), 0, is_init=True),
        _seed("regular00", synth._page_url(1, 0), 1),
        _seed("regular01", synth._page_url(2, 0), 2, priority=2),
    ]
    run, golden = _run_both(spark, world, wave_budget=50)
    _assert_bit_for_bit(run, golden)

    order = run.order.orderBy("wave", "rank").collect()
    # wave 1 is init-exclusive: the only scheduled job is the init seed
    wave1 = [r.job_id for r in order if r.wave == 1]
    assert wave1 == ["init0000"]
    # BFS to exhaustion: every init-tree fetch (seed + descendants, retries
    # included) happens strictly before ANY regular fetch
    init_waves = [r.wave for r in order if r.is_init]
    reg_waves = [r.wave for r in order if not r.is_init]
    assert len(init_waves) > 1  # the init tree actually expanded
    assert reg_waves and min(reg_waves) > max(init_waves)
    # init results are discarded, but the init fetches DID happen (terminal)
    result_ids = {r.job_id for r in run.results.collect()}
    assert "init0000" not in result_ids
    term_ids = {r.job_id for r in run.terminal.collect()}
    assert "init0000" in term_ids
    # regular results still flow
    assert "regular00" in result_ids


def test_use_in_results_gate(spark):
    # UseInResults()==false: job completes, children expand, result withheld
    world = synth.make_world(n_hosts=4, total_pages=80)
    world.seeds = [
        _seed("gated000", synth._page_url(0, 0), 0, use_in_results=False),
        _seed("normal00", synth._page_url(1, 0), 1),
    ]
    run, golden = _run_both(spark, world, wave_budget=50)
    _assert_bit_for_bit(run, golden)
    result_ids = {r.job_id for r in run.results.collect()}
    assert "gated000" not in result_ids
    assert "normal00" in result_ids
    # the gated job's children DID expand and emit (default use_in_results)
    children = {r.job_id for r in run.results.collect() if r.parent_id == "gated000"}
    assert children
    # and the gated fetch itself completed (terminal done)
    term = {r.job_id: r.final_state for r in run.terminal.collect()}
    assert term["gated000"] == C.ST_DONE


@pytest.mark.parametrize("max_retries,want_attempts", [(0, 1), (10, 6)])
def test_timeout_outcomes(spark, max_retries, want_attempts):
    # F-17: latency > timeout_us → deterministic 599 per attempt → retry path
    # identical to a 5xx, ending failed with the capped attempt count
    world = synth.make_world(n_hosts=4, total_pages=60)
    slow = synth.canon_of("http://h0001.test/slow/0")
    world.pages[slow] = synth.PageSpec(
        url_canon=slow, status=200, flaky_attempts=0,
        body_image_id=None, out_links=[], latency_us=30_000,
    )
    world.seeds = [
        _seed("timeout0", slow, 0, timeout_us=10_000, max_retries=max_retries),
        _seed("fine0000", slow, 1, timeout_us=50_000),  # same page, generous timeout
    ]
    run, golden = _run_both(spark, world, wave_budget=50)
    _assert_bit_for_bit(run, golden)
    term = {r.job_id: (r.attempts, r.final_state) for r in run.terminal.collect()}
    assert term["timeout0"] == (want_attempts, C.ST_FAILED)
    # dedup note: both seeds share the GET cache_key? No — same URL+method ⇒
    # second seed dedups away; assert exactly that (seen-set parity)
    assert "fine0000" not in term


def test_timeout_dedup_distinct_urls(spark):
    # distinct URLs: one times out, one succeeds with room to spare
    world = synth.make_world(n_hosts=4, total_pages=60)
    for name, lat in (("slow", 30_000), ("fast", 2_000)):
        canon = synth.canon_of(f"http://h0001.test/{name}/0")
        world.pages[canon] = synth.PageSpec(
            url_canon=canon, status=200, flaky_attempts=0,
            body_image_id=None, out_links=[], latency_us=lat,
        )
    world.seeds = [
        _seed("slow0000", "http://h0001.test/slow/0", 0, timeout_us=10_000, max_retries=1),
        _seed("fast0000", "http://h0001.test/fast/0", 1, timeout_us=10_000),
    ]
    run, golden = _run_both(spark, world, wave_budget=50)
    _assert_bit_for_bit(run, golden)
    term = {r.job_id: (r.attempts, r.final_state) for r in run.terminal.collect()}
    assert term["slow0000"] == (2, C.ST_FAILED)
    assert term["fast0000"] == (1, C.ST_DONE)
    # the timed-out fetch reports elapsed == timeout_us, the good one its latency
    res = {r.job_id: r.latency_us for r in run.results.collect()}
    assert res["fast0000"] == 2_000


def test_post_body_roundtrip(spark):
    # POST and GET to the same URL are DIFFERENT dedup keys
    # (md5(method:url[+body]), job.go:117-130) — both fetch
    world = synth.make_world(n_hosts=4, total_pages=60)
    url = synth._page_url(1, 0)
    world.seeds = [
        _seed("get00000", url, 0),
        _seed("post0000", url, 1, method="POST", body=b"q=1&lang=en",
              headers={"Content-Type": "application/x-www-form-urlencoded"}),
        _seed("post0001", url, 2, method="POST", body=b"q=2"),  # different body ⇒ 3rd key
        _seed("post_dup", url, 3, method="POST", body=b"q=1&lang=en"),  # dedups vs post0000
    ]
    run, golden = _run_both(spark, world, wave_budget=50)
    _assert_bit_for_bit(run, golden)
    term = {r.job_id for r in run.terminal.collect()}
    assert {"get00000", "post0000", "post0001"} <= term
    assert "post_dup" not in term  # deduped by identical method+url+body
    assert run.seen.count() == len(golden.seen)


def test_private_network_guard(spark):
    # F-22: loopback/private hosts are refused at admission (discarded)
    world = synth.make_world(n_hosts=4, total_pages=60)
    world.seeds = [
        _seed("loop0000", "http://127.0.0.1/admin", 0),
        _seed("rfc1918a", "http://10.1.2.3/x", 1),
        _seed("rfc1918b", "http://192.168.1.4/y", 2),
        _seed("rfc1918c", "http://172.16.0.9/z", 3),
        _seed("linklocl", "http://169.254.0.1/w", 4),
        _seed("lhost000", "http://localhost:8080/q", 5),
        _seed("public00", synth._page_url(1, 0), 6),
        _seed("notpriv0", "http://172.15.0.1/ok", 7),  # 172.15 is NOT rfc1918
    ]
    run, golden = _run_both(spark, world, wave_budget=50)
    _assert_bit_for_bit(run, golden)
    term = {r.job_id: r.final_state for r in run.terminal.collect()}
    for jid in ("loop0000", "rfc1918a", "rfc1918b", "rfc1918c", "linklocl", "lhost000"):
        assert term[jid] == C.ST_DISCARDED
    assert term["public00"] == C.ST_DONE
    # 172.15.x is public: it gets scheduled (and 404s — no such page)
    assert term["notpriv0"] == C.ST_FAILED
