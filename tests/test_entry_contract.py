"""Mimic the driver's verify: run each __spark_entry__ query on Spark and its
oracle on DuckDB at sf0.001, compare row count + column names + exact
order-insensitive values. Strict equality — the driver hashes values."""

import math

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return sorted(rows, key=repr), cols


def _duck_rows(con, sql):
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in cols]
    rows = [tuple(_norm(row[i]) for i in idx) for row in rel.fetchall()]
    return sorted(rows, key=repr), cols


ORACLED = sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    q = E.queries()[name]
    got, gcols = _spark_rows(q(spark, SF))
    want, wcols = _duck_rows(ddb, E.oracle_sql()[name])
    assert gcols == wcols, f"{name}: column names differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    if got != want:
        diff_g = [r for r in got if r not in want][:5]
        diff_w = [r for r in want if r not in got][:5]
        raise AssertionError(f"{name}: values differ\n spark-only={diff_g}\n duck-only={diff_w}")


def test_every_query_is_oracled():
    # round 3: every queries() entry has a DuckDB oracle — including the BSP
    # crawl loop itself (recursive-CTE twin, crawlspark/bsporacle.py)
    assert set(E.queries()) == set(E.oracle_sql())


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"event_id", "priority", "host_rank"}
