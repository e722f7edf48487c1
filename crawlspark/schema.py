"""Table schemas for the crawlspark engine (SURVEY.md §1.3).

The reference models Job/Response/Result as Go structs flowing through
channels (/root/reference/job.go:63-104, response.go:9-27, result.go:4-7);
here every record type is a fixed Spark StructType and every stream is a
table. Binary payloads (request body, image bytes) are BinaryType; durations
are bigint microseconds (Spark tables have no duration type).
"""

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# frontier — the job queue (reference: JobProvider, services.go:13-17;
# memory impl adapters/providers/memory/memory.go:20-98)
# ---------------------------------------------------------------------------
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("parent_id", T.StringType(), True),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("cache_key", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("body", T.BinaryType(), True),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("url_params", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("max_retries", T.IntegerType(), False),
        T.StructField("retry_policy", T.IntegerType(), False),
        T.StructField("max_retry_delay_us", T.LongType(), False),
        T.StructField("timeout_us", T.LongType(), True),
        # O-1 result-emit gate (job.go:112-114, gate at scrapemate.go:585-591)
        T.StructField("use_in_results", T.BooleanType(), False),
        # F-5 init-job BFS: init jobs (and their descendants) run to
        # exhaustion before regular jobs; their results are discarded
        # (scrapemate.go:489-523, comment 166-172)
        T.StructField("is_init", T.BooleanType(), False),
        # P-2 per-job-type Process dispatch (job.go:46-47)
        T.StructField("job_type", T.StringType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("not_before_us", T.LongType(), False),  # virtual-time backoff gate
        T.StructField("state", T.StringType(), False),
        T.StructField("wave", T.IntegerType(), False),  # superstep that enqueued it
    ]
)

# ---------------------------------------------------------------------------
# images — payload table (authoritative shape: BASELINE.json input_hint)
# ---------------------------------------------------------------------------
IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# pages — the fetch simulator's world (synthetic web graph, FIXTURES.md A3)
# ---------------------------------------------------------------------------
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("flaky_attempts", T.IntegerType(), False),  # first k fetches return 503
        T.StructField("body_image_id", T.StringType(), True),
        T.StructField("out_links", T.ArrayType(T.StringType()), True),
        T.StructField("redirect_to", T.StringType(), True),
        T.StructField("latency_us", T.LongType(), False),
        # optional raw HTML body (P-3 link-extraction source); None unless
        # the world is generated with bodies
        T.StructField("body_html", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# robots / politeness (new-engine spec — absent in the reference, SURVEY.md
# scope note; semantics defined in FIXTURES.md A4/A5)
# ---------------------------------------------------------------------------
ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay_us", T.LongType(), True),
    ]
)

POLITENESS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("max_per_wave", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# seen — the URL-seen set (reference analog: response cache keyed by
# md5(method:fullURL[+body]), job.go:117-130; here additionally keyed by
# xxhash64(url_canon) per the north rule)
# ---------------------------------------------------------------------------
SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("cache_key", T.StringType(), False),
        T.StructField("first_seen_wave", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# results — reference analog: results chan Result (scrapemate.go:191) +
# Response fields (response.go:9-27); image payload validated inline.
# ---------------------------------------------------------------------------
RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("parent_id", T.StringType(), True),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("rank", T.IntegerType(), False),  # (priority, seq) rank within wave
        T.StructField("status", T.IntegerType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("from_cache", T.BooleanType(), False),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("psnr_db", T.DoubleType(), True),
        T.StructField("pixels_ok", T.BooleanType(), True),
        T.StructField("latency_us", T.LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# metrics — per-wave counters (reference analog: stats struct
# scrapemate.go:605-633 + throughput ticker scrapemate.go:236-268)
# ---------------------------------------------------------------------------
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("scheduled", T.LongType(), False),
        T.StructField("completed", T.LongType(), False),
        T.StructField("failed", T.LongType(), False),
        T.StructField("discarded", T.LongType(), False),
        T.StructField("retried", T.LongType(), False),
        T.StructField("new_urls", T.LongType(), False),
        T.StructField("deduped", T.LongType(), False),
        T.StructField("pending_after", T.LongType(), False),
        T.StructField("wall_sec", T.DoubleType(), False),
    ]
)

SEEDS_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("body", T.BinaryType(), True),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("url_params", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("max_retries", T.IntegerType(), False),
        T.StructField("retry_policy", T.IntegerType(), False),
        T.StructField("max_retry_delay_us", T.LongType(), False),
        T.StructField("accept_lo", T.IntegerType(), True),  # DoCheckResponse range
        T.StructField("accept_hi", T.IntegerType(), True),  # (null → 200-299 default)
        T.StructField("timeout_us", T.LongType(), True),  # F-17 (null → no timeout)
        T.StructField("use_in_results", T.BooleanType(), True),  # O-1 (null → true)
        T.StructField("is_init", T.BooleanType(), True),  # F-5 (null → false)
        T.StructField("job_type", T.StringType(), True),  # P-2 (null → "page")
        T.StructField("seed_order", T.LongType(), False),  # push order (FIFO parity)
    ]
)
