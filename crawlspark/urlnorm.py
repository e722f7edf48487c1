"""URL canonicalization, cache keys, and hashing — all Spark built-ins.

Reference parity (pinned by tests):
  * full URL  = url + "?" + url-encoded *sorted* params (when params exist)
    — /root/reference/job.go:225-247 (GetFullURL; Go url.Values.Encode).
  * cache key = md5(method + ":" + fullURL [+ body when POST])
    — /root/reference/job.go:117-130 (GetCacheKey).

Engine extensions (new-engine spec, SURVEY.md §2 F-9): canonical URL further
lowercases scheme+host, strips the fragment and default ports, and defaults an
empty path to "/". The embedded query of the *original* URL is preserved
verbatim (the reference never reorders it; only the params map is sorted).

Everything here is a Catalyst expression — zero Python in the hot path; the
pure-Python twins live in crawlspark.oracle for golden-file generation.
"""

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawlspark.constants import DEFAULT_HOST_BUCKETS, DEFAULT_HOST_SALT


def _go_query_escape(c: Column) -> Column:
    """Go url.QueryEscape semantics on top of Spark's url_encode.

    Java URLEncoder (behind F.url_encode) and Go's QueryEscape agree on
    space→'+' and uppercase %XX, but differ on two characters: Java keeps
    '*' raw and escapes '~'; Go escapes '*' (%2A) and keeps '~' raw.
    """
    enc = F.url_encode(c)
    enc = F.regexp_replace(enc, r"%7E", "~")
    return F.regexp_replace(enc, r"\*", "%2A")


def full_url(url: Column, url_params: Column) -> Column:
    """GetFullURL parity: append "?" + sorted urlencoded params if any.

    map_entries → array_sort gives lexicographic order by key (struct sort
    orders by first field; map keys are unique), matching Go's sort.Strings
    over the param keys (job.go:228-234).
    """
    entries = F.array_sort(F.map_entries(url_params))
    encoded = F.transform(
        entries,
        lambda e: F.concat(
            _go_query_escape(e.getField("key")),
            F.lit("="),
            _go_query_escape(e.getField("value")),
        ),
    )
    qs = F.array_join(encoded, "&")
    has_params = url_params.isNotNull() & (F.size(F.map_keys(url_params)) > 0)
    return F.when(has_params, F.concat(url, F.lit("?"), qs)).otherwise(url)


def cache_key(method: Column, full: Column, body: Column) -> Column:
    """GetCacheKey parity: md5(method:fullURL[+body for POST]) (job.go:117-130)."""
    base = F.concat(method, F.lit(":"), full)
    with_body = F.md5(F.concat(F.encode(base, "UTF-8"), F.coalesce(body, F.lit(b""))))
    return F.when(method == "POST", with_body).otherwise(F.md5(base))


def canonicalize(full: Column) -> Column:
    """Engine canonical URL: lower scheme/host, drop fragment + default port,
    empty path → "/", preserve the (already sorted) query verbatim."""
    proto = F.lower(F.parse_url(full, F.lit("PROTOCOL")))
    authority = F.parse_url(full, F.lit("AUTHORITY"))
    host = F.lower(F.parse_url(full, F.lit("HOST")))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = ((proto == "http") & (port == "80")) | (
        (proto == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.parse_url(full, F.lit("PATH"))
    path = F.when((path.isNull()) | (path == ""), F.lit("/")).otherwise(path)
    query = F.parse_url(full, F.lit("QUERY"))
    query_part = F.when(query.isNull(), F.lit("")).otherwise(F.concat(F.lit("?"), query))
    return F.concat(proto, F.lit("://"), host, port_part, path, query_part)


def url_host(url_canon: Column) -> Column:
    return F.parse_url(url_canon, F.lit("HOST"))


def url_hash(url_canon: Column) -> Column:
    """Seen-set key: xxhash64 of the canonical URL (north rule)."""
    return F.xxhash64(url_canon)


def host_bucket(
    host: Column,
    n_buckets: int = DEFAULT_HOST_BUCKETS,
    salt: int = DEFAULT_HOST_SALT,
) -> Column:
    """Salted host bucket to defuse hot-host skew (SURVEY.md §4.3.1).

    The salt perturbs the hash so adversarial/hot host names don't all land
    in one bucket across deployments; pmod keeps it non-negative.
    """
    return F.pmod(F.xxhash64(host, F.lit(salt)), F.lit(n_buckets)).cast("int")


def with_url_columns(df, n_buckets: int = DEFAULT_HOST_BUCKETS):
    """Derive (url_canon, url_hash, cache_key, host, host_bucket) for a frame
    holding raw (url, url_params, method, body) — one projection, no shuffle."""
    full = full_url(F.col("url"), F.col("url_params"))
    canon = canonicalize(full)
    # three projections, not five: every classic-API transformation eagerly
    # re-analyzes the whole accumulated tree, and this helper sits inside the
    # per-wave expansion plan build — batching the independent columns with
    # withColumns keeps the derivation chain (canon → hash/key/host → bucket)
    # while halving the analysis passes (round 6; engine dedup key note: the
    # reference's GetCacheKey applied to the CANONICAL url, F-9 extension)
    df = df.withColumn("url_canon", canon)
    df = df.withColumns(
        {
            "url_hash": url_hash(F.col("url_canon")),
            "cache_key": cache_key(F.col("method"), F.col("url_canon"), F.col("body")),
            "host": url_host(F.col("url_canon")),
        }
    )
    return df.withColumn("host_bucket", host_bucket(F.col("host"), n_buckets))
