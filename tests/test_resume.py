"""Checkpoint/resume contract (north rule: 'resumable from checkpoint with
per-partition lineage + metrics', no URL fetched twice): kill the BSP loop
after wave k, restart from the manifest, and the final crawl order / seen set
/ results must equal an uninterrupted run's exactly."""

import shutil

import pytest

from crawlspark import synth
from crawlspark.engine import CrawlConfig, CrawlEngine


def _mk_engine(spark, world, workdir, max_waves):
    cfg = CrawlConfig(
        validate_images=False,
        wave_budget=30,
        max_waves=max_waves,
        use_bloom=True,
        workdir=workdir,
    )
    return CrawlEngine(
        spark,
        pages=synth.pages_df(spark, world),
        robots=synth.robots_df(spark, world),
        budgets=synth.politeness_df(spark, world),
        images=None,
        config=cfg,
    )


@pytest.fixture(scope="module")
def world():
    return synth.make_world(n_hosts=4, total_pages=80)


def _order_rows(run):
    return [
        (r.wave, r.rank, r.job_id, r.url_canon)
        for r in run.order.orderBy("wave", "rank").collect()
    ]


def test_kill_and_resume_identical(spark, world, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("uninterrupted"))
    resumed = str(tmp_path_factory.mktemp("resumed"))

    # uninterrupted reference run
    full = _mk_engine(spark, world, base, max_waves=100).run(
        synth.seeds_df(spark, world)
    )

    # killed after 3 waves…
    part = _mk_engine(spark, world, resumed, max_waves=3).run(
        synth.seeds_df(spark, world)
    )
    assert part.waves == 3

    # …and resumed from the manifest
    eng2 = _mk_engine(spark, world, resumed, max_waves=100)
    cont = eng2.run(synth.seeds_df(spark, world), resume=True)
    assert cont.resumed_from_wave == 3

    assert _order_rows(cont) == _order_rows(full)
    assert {r.cache_key for r in cont.seen.collect()} == {
        r.cache_key for r in full.seen.collect()
    }
    got = {r.job_id: (r.attempts, r.final_state) for r in cont.terminal.collect()}
    want = {r.job_id: (r.attempts, r.final_state) for r in full.terminal.collect()}
    assert got == want

    # no URL fetched twice across the kill/resume boundary: a job_id appears
    # at most once per wave, and a done job never reappears in a later wave
    orders = _order_rows(cont)
    done_wave = {}
    for r in cont.terminal.collect():
        if r.final_state == "done":
            done_wave[r.job_id] = r.wave
    for wave, _rank, job_id, _u in orders:
        if job_id in done_wave:
            assert wave <= done_wave[job_id], f"{job_id} fetched after done"

    shutil.rmtree(base, ignore_errors=True)


def test_manifest_commit_is_atomic(spark, world, tmp_path_factory):
    # a manifest is only advanced after the wave's outputs are durable:
    # after a 2-wave run the manifest says wave=2 and every listed wave dir exists
    import json
    import os

    wd = str(tmp_path_factory.mktemp("atomic"))
    _mk_engine(spark, world, wd, max_waves=2).run(synth.seeds_df(spark, world))
    man = json.load(open(os.path.join(wd, "manifest.json")))
    assert man["wave"] == 2
    assert len(man["metrics"]) == 2
    for w in range(man["wave"] + 1):
        assert os.path.exists(os.path.join(wd, "pending", f"wave={w}")) or w < man["wave"]
    assert os.path.exists(os.path.join(wd, "pending", f"wave={man['wave']}"))
    assert os.path.exists(os.path.join(wd, "seen", "wave=0"))
