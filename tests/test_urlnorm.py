"""URL canonicalization / cache-key parity: Spark built-ins vs the pure-Python
twins vs the reference semantics (job.go:117-130, 225-247)."""

import hashlib

from pyspark.sql import functions as F

from crawlspark import urlnorm
from crawlspark.pyparity import cache_key_py, canon_of, full_url_py, go_query_escape

CASES = [
    # (url, params) — covers sorted params, encoding, case, ports, fragments
    ("http://example.com/path", {}),
    ("http://example.com/path", {"b": "2", "a": "1"}),
    ("http://example.com/path", {"q": "hello world", "x": "a&b=c"}),
    ("http://example.com/path", {"z": "~tilde", "y": "star*", "w": "sla/sh"}),
    ("HTTP://EXAMPLE.com:80/path", {}),
    ("https://Example.COM:443/", {}),
    ("http://example.com:8080/p", {"k": "v"}),
    ("http://example.com/p#fragment", {}),
    ("http://example.com", {}),
    ("http://h0001.test/p/7?embedded=1", {}),
]


def test_full_url_matches_reference_semantics():
    # job.go:225-247: sorted keys, Go url.Values.Encode
    assert full_url_py("http://e.com/p", {"b": "2", "a": "1"}) == "http://e.com/p?a=1&b=2"
    assert full_url_py("http://e.com/p", {}) == "http://e.com/p"
    assert full_url_py("http://e.com/p", {"q": "a b"}) == "http://e.com/p?q=a+b"
    # Go QueryEscape: '*' escaped, '~' kept
    assert go_query_escape("star*~") == "star%2A~"


def test_cache_key_matches_reference_semantics():
    # job.go:117-130: md5("GET:url"), POST appends body
    full = "http://e.com/p?a=1"
    assert cache_key_py("GET", full) == hashlib.md5(b"GET:http://e.com/p?a=1").hexdigest()
    assert (
        cache_key_py("POST", full, b"body")
        == hashlib.md5(b"POST:http://e.com/p?a=1body").hexdigest()
    )


def test_spark_matches_python_twins(spark):
    rows = [
        {"url": u, "url_params": p, "method": "GET", "body": None} for u, p in CASES
    ] + [
        {"url": "http://e.com/post", "url_params": {"a": "1"}, "method": "POST", "body": b"xyz"}
    ]
    df = spark.createDataFrame(
        rows, schema="url string, url_params map<string,string>, method string, body binary"
    )
    out = urlnorm.with_url_columns(df).select(
        "url", "url_params", "method", "body", "url_canon", "cache_key", "host"
    )
    for r in out.collect():
        params = dict(r.url_params) if r.url_params else {}
        expect_canon = canon_of(r.url, params)
        assert r.url_canon == expect_canon, (r.url, params)
        expect_key = cache_key_py(r.method, expect_canon, bytes(r.body) if r.body else None)
        assert r.cache_key == expect_key, (r.url, params)
        assert r.host == expect_canon.split("/")[2].split(":")[0]


def test_variants_fold_to_same_canon(spark):
    variants = [
        "http://h0001.test/p/3",
        "HTTP://H0001.TEST/p/3",
        "http://h0001.test:80/p/3",
        "http://h0001.test/p/3#frag",
    ]
    df = spark.createDataFrame(
        [{"url": u, "url_params": {}, "method": "GET", "body": None} for u in variants],
        schema="url string, url_params map<string,string>, method string, body binary",
    )
    out = urlnorm.with_url_columns(df)
    assert out.select("url_canon").distinct().count() == 1
    assert out.select("url_hash").distinct().count() == 1
    assert out.select("cache_key").distinct().count() == 1


def test_host_bucket_stable_and_bounded(spark):
    df = spark.range(0, 100).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test")).alias("host")
    )
    out = df.select(urlnorm.host_bucket(F.col("host"), 16).alias("b"))
    vals = [r.b for r in out.collect()]
    assert all(0 <= v < 16 for v in vals)
    # deterministic across evaluations
    assert vals == [r.b for r in out.collect()]
