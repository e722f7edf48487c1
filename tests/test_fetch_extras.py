"""F-23 header profiles, F-29 hooks side-output, F-11 gzip body decode,
O-5 screenshot/binary sink, F-4 driver-action retry."""

import gzip
import os

import pytest

from crawlspark import constants as C
from crawlspark import synth
from crawlspark.engine import CrawlConfig, CrawlEngine


@pytest.fixture(scope="module")
def world():
    return synth.make_world(n_hosts=4, total_pages=60)


def _engine(spark, world, cfg, **pages_kw):
    return CrawlEngine(
        spark,
        pages=synth.pages_df(spark, world, **pages_kw),
        robots=synth.robots_df(spark, world),
        budgets=synth.politeness_df(spark, world),
        images=None,
        config=cfg,
    )


def test_header_profile_merge(spark):
    # F-23 (stealth.go:41-97): profile headers merged UNDER job headers
    from pyspark.sql import functions as F

    from crawlspark.stealth import HEADER_PROFILES, with_profile_headers

    jobs = spark.createDataFrame(
        [("j1", {"User-Agent": "custom-ua", "X-Job": "1"}), ("j2", None)],
        "job_id string, headers map<string,string>",
    )
    out = {r["job_id"]: r["effective_headers"]
           for r in with_profile_headers(jobs, spark, "firefox").collect()}
    prof = HEADER_PROFILES["firefox"]
    # job overrides profile on collision, profile fills the rest
    assert out["j1"]["User-Agent"] == "custom-ua"
    assert out["j1"]["X-Job"] == "1"
    assert out["j1"]["Accept"] == prof["Accept"]
    # null job headers → pure profile
    assert out["j2"] == prof
    with pytest.raises(ValueError):
        with_profile_headers(jobs, spark, "nosuch").collect()


def test_hooks_side_output(spark, world):
    # F-29 (request_hooks.go:31-48): one request + one response event per
    # network fetch, attached to the result row
    cfg = CrawlConfig(validate_images=False, wave_budget=50, enable_hooks=True)
    run = _engine(spark, world, cfg).run(synth.seeds_df(spark, world))
    rows = run.results.collect()
    assert rows
    for r in rows:
        assert "hook_events" in r.asDict()
        if not r.from_cache:
            kinds = [e.kind for e in r.hook_events]
            assert kinds == ["request", "response"]
            assert r.hook_events[0].url == r.url_canon
            assert r.hook_events[1].status == r.status


def test_gzip_body_decode(spark, world):
    # F-11 (nethttp.go:76-86): Content-Encoding gzip transparently decoded
    cfg = CrawlConfig(validate_images=False, wave_budget=50, decode_gzip_body=True)
    run = _engine(spark, world, cfg, with_body_gz=True).run(synth.seeds_df(spark, world))
    rows = run.results.collect()
    assert rows
    for r in rows:
        assert r.body_text == synth.body_text_of(r.url_canon)


def test_gzip_roundtrip_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from crawlspark.fetch import gunzip_udf

    texts = ["hello", "ünïcødé ✓", "", "x" * 10000]
    df = spark.createDataFrame(
        [(t, gzip.compress(t.encode())) for t in texts] + [("missing", None)],
        "want string, gz binary",
    )
    got = df.select("want", gunzip_udf()(F.col("gz")).alias("got"), "gz").collect()
    for r in got:
        assert r.got == (r.want if r.gz is not None else None)


def test_screenshot_binary_sink(spark, tmp_path):
    # O-5: results carry the payload bytes; BinaryWriter → one file per row
    from crawlspark.app import AppConfig, CrawlApp

    world = synth.make_world(n_hosts=4, total_pages=60)
    shot_dir = tmp_path / "shots"
    app = CrawlApp(
        spark,
        pages=synth.pages_df(spark, world),
        robots=synth.robots_df(spark, world),
        budgets=synth.politeness_df(spark, world),
        images=synth.images_df(spark, world),
        config=AppConfig(
            screenshots=True, wave_budget=50,
            writers=[("binary", str(shot_dir))],
        ),
    )
    run = app.start(synth.seeds_df(spark, world))
    rows = run.results.filter("screenshot IS NOT NULL").collect()
    assert rows
    img_bytes = {r["image_id"]: bytes(r["bytes"])
                 for r in synth.images_df(spark, world).collect()}
    for r in rows[:10]:
        assert bytes(r.screenshot) == img_bytes[r.image_id]
        f = shot_dir / f"{r.job_id}.bin"
        assert f.exists() and f.read_bytes() == bytes(r.screenshot)


def test_driver_action_retry():
    # F-4 (scrapemate.go:532-543): transient action failures retried
    from crawlspark.engine import CrawlEngine

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert CrawlEngine._retry_action(None, flaky, attempts=3, delay_s=0.01) == "ok"
    assert calls["n"] == 3

    def always_fail():
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError, match="permanent"):
        CrawlEngine._retry_action(None, always_fail, attempts=2, delay_s=0.01)


def test_stealth_profile_through_engine(spark, world):
    # fetch_mode='stealth' wires the chrome profile without changing the
    # crawl's semantics (headers are not consumed by the simulator)
    from crawlspark.oracle import run_oracle

    cfg = CrawlConfig(validate_images=False, wave_budget=50, fetch_profile="chrome")
    run = _engine(spark, world, cfg).run(synth.seeds_df(spark, world))
    golden = run_oracle(world, wave_budget=50)
    got = [(r.wave, r.rank, r.job_id) for r in run.order.orderBy("wave", "rank").collect()]
    want = [(g["wave"], g["rank"], g["job_id"]) for g in golden.crawl_order]
    assert got == want
