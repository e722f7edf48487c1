"""The recursive-CTE BSP oracle (crawlspark/bsporacle.py) must replay the
pure-Python scheduler (crawlspark/oracle.py) bit-for-bit.

Parity chain: DuckDB CTE == pure-Python oracle (here) and pure-Python oracle
== Spark engine (tests/test_engine_golden.py) ⇒ the driver's side-by-side
Spark-vs-DuckDB compare of `crawl_bsp_end_to_end` is pinned three ways.
No Spark session needed — this suite is pure DuckDB + Python.
"""

import duckdb
import pytest

from crawlspark import synth
from crawlspark.bsporacle import bsp_order_oracle_sql
from crawlspark.oracle import run_oracle

WORLDS = [
    # the contract query's exact world + budget
    (dict(n_hosts=4, total_pages=60), 30),
    # bigger graph, more waves
    (dict(n_hosts=6, total_pages=120), 40),
    # tight budgets → politeness + wave budget both bind, 50+ waves
    (dict(n_hosts=3, total_pages=200, host_budget=6, hot_host_budget=2), 25),
    # wider branching
    (dict(n_hosts=8, total_pages=90, branching=3), 50),
    # tiny world, binding global budget
    (dict(n_hosts=2, total_pages=30), 7),
]


def _python_order(world, wave_budget):
    g = run_oracle(world, wave_budget=wave_budget)
    return sorted(
        (r["wave"], r["rank"], r["job_id"], r["url_canon"], False)
        for r in g.crawl_order
    )


def _duckdb_order(world, wave_budget):
    sql = bsp_order_oracle_sql(world, wave_budget=wave_budget)
    return sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))


@pytest.mark.parametrize("kw,budget", WORLDS)
def test_cte_matches_python_scheduler(kw, budget):
    world = synth.make_world(**kw)
    exp = _python_order(world, budget)
    got = _duckdb_order(world, budget)
    assert len(exp) > 0
    assert got == exp


def test_retries_and_redirects_are_exercised():
    # the contract world must actually contain flaky pages (503 → backoff →
    # re-selection in a later wave) so the oracle pins the retry path, and a
    # duplicate-rank proves re-selection happened
    world = synth.make_world(n_hosts=4, total_pages=60)
    assert any(p.flaky_attempts > 0 for p in world.pages.values())
    g = run_oracle(world, wave_budget=30)
    ids = [r["job_id"] for r in g.crawl_order]
    assert len(ids) > len(set(ids)), "no job was ever re-selected — retry path untested"


def test_out_of_scope_config_assertions_fire():
    # round 4: per-job timeout/policy/max_retries ARE in scope now; what the
    # generator still refuses is the config it folds into constants —
    # StopScraping policy and a non-default backoff cap
    from crawlspark import constants as C

    world = synth.make_world(n_hosts=2, total_pages=20)
    world.seeds[0]["retry_policy"] = C.STOP_SCRAPING
    with pytest.raises(AssertionError):
        bsp_order_oracle_sql(world, wave_budget=10)

    world2 = synth.make_world(n_hosts=2, total_pages=20)
    world2.seeds[0]["max_retry_delay_us"] = 123_456
    with pytest.raises(AssertionError):
        bsp_order_oracle_sql(world2, wave_budget=10)


def test_cte_matches_python_scheduler_mixed_config():
    # round 4: per-job retry policy / retry cap / timeout carried through the
    # recursion — the mixed-config worlds get the same hard oracle
    for kw, budget in [
        (dict(n_hosts=4, total_pages=60), 30),
        (dict(n_hosts=5, total_pages=80), 25),
        (dict(n_hosts=3, total_pages=120, host_budget=5), 20),
    ]:
        world = synth.make_mixed_config_world(**kw)
        # the mix must actually exercise every policy and a biting timeout
        pols = {s["retry_policy"] for s in world.seeds}
        assert len(pols) == 3 and any(s["timeout_us"] for s in world.seeds)
        exp = _python_order(world, budget)
        got = _duckdb_order(world, budget)
        assert len(exp) > 0
        assert got == exp, (kw, budget)
