"""Fetch simulation + retry/backoff/policy dispatch as DataFrame ops.

Reference analogs:
  * HTTP fetch (nethttp.go:34-92) → a shuffle join of the wave against the
    synthetic `pages` table on url_hash. At production scale the join target
    is the real network: an applyInPandas per host-bucket doing async HTTP —
    the surrounding plan (and all the retry semantics below) is unchanged.
  * transparent redirect follow (Go http.Client default) → `resolve_redirects`
    pre-resolves chains ≤3 hops with iterative self-joins, once per run.
  * doFetch retry loop (scrapemate.go:398-453) → virtual time: a failed
    attempt re-enters `pending` with retry_count+1 and not_before = wave_ts +
    backoff delay. Backoff is metadata, not sleeping tasks.
  * DoCheckResponse default accept 2xx (job.go:180-188).
  * policy dispatch (scrapemate.go:422-451): Discard → give up after first
    failure; Stop → cancel the whole crawl; RefreshIP → retry without delay
    (the reference leaves it unimplemented).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark import constants as C

MAX_REDIRECT_HOPS = 3


def resolve_redirects(pages: DataFrame, max_hops: int = MAX_REDIRECT_HOPS) -> DataFrame:
    """Collapse redirect chains so the wave join is a single equi-join.

    Iterative self-join on the redirect edge (≤3 hops, like a browser's
    redirect limit); pages still redirecting after max_hops surface as 508.
    One-time batch cost, amortized over every wave.
    """
    # payload columns share one rule: resolved → target's value, missing
    # target → null, no redirect → own value (body_html is the P-3 link
    # source; body_gz the F-11 gzip body)
    payload_cols = ["body_image_id", "out_links"] + [
        c for c in ("body_html", "body_gz", "js_links") if c in pages.columns
    ]
    resolved = pages
    for _ in range(max_hops):
        tgt_cols = [
            F.col("url").alias("_t_url"),
            F.col("status").alias("_t_status"),
            F.col("flaky_attempts").alias("_t_flaky"),
            F.col("redirect_to").alias("_t_next"),
            F.col("latency_us").alias("_t_lat"),
        ] + [F.col(c).alias(f"_t_{c}") for c in payload_cols]
        tgt = pages.select(*tgt_cols)
        out_cols = [
            "url_hash",
            "url",
            F.when(F.col("redirect_to").isNotNull() & F.col("_t_url").isNotNull(), F.col("_t_status"))
            .when(F.col("redirect_to").isNotNull(), F.lit(404))
            .otherwise(F.col("status"))
            .alias("status"),
            F.when(F.col("redirect_to").isNotNull() & F.col("_t_url").isNotNull(), F.col("_t_flaky"))
            .when(F.col("redirect_to").isNotNull(), F.lit(0))
            .otherwise(F.col("flaky_attempts"))
            .alias("flaky_attempts"),
        ] + [
            F.when(F.col("redirect_to").isNotNull() & F.col("_t_url").isNotNull(), F.col(f"_t_{c}"))
            .when(F.col("redirect_to").isNotNull(), F.lit(None))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload_cols
        ] + [
            F.when(F.col("redirect_to").isNotNull(), F.col("_t_next"))
            .otherwise(F.lit(None))
            .alias("redirect_to"),
            (F.col("latency_us") + F.coalesce(F.when(F.col("redirect_to").isNotNull(), F.col("_t_lat")), F.lit(0))).alias("latency_us"),
        ]
        resolved = resolved.join(
            tgt, resolved["redirect_to"] == tgt["_t_url"], "left"
        ).select(*out_cols)
    # chains longer than max_hops: loop exhausted → 508
    return resolved.withColumn(
        "status",
        F.when(F.col("redirect_to").isNotNull(), F.lit(508)).otherwise(F.col("status")),
    ).withColumn("redirect_to", F.lit(None).cast("string"))


def fetch_simulate(
    wave: DataFrame,
    pages_resolved: DataFrame,
    response_cache: DataFrame | None = None,
    carry_body_html: bool = False,
    carry_body_gz: bool = False,
    carry_js_links: bool = False,
) -> DataFrame:
    """One fetch attempt per selected row: equi-join on url_hash.

    Missing page → 404 (network-level failure analog); a page with
    flaky_attempts=k returns 503 for attempts 0..k-1 then its real status —
    the deterministic failure source that drives the retry goldens.

    Cache tier (C-2 parity, scrapemate.go:345-375): when `response_cache`
    (cache_key → successful response) is given, hits are served WITHOUT the
    fetch join contributing — from_cache=True rows still flow through parse/
    process/expansion exactly like fetched ones. Only successful responses
    ever enter the cache (scrapemate.go:370-374), so a hit is always ok.
    """
    p_cols = [
        "url_hash",
        F.col("status").alias("page_status"),
        "flaky_attempts",
        "body_image_id",
        "out_links",
        "latency_us",
    ]
    if carry_body_html and "body_html" in pages_resolved.columns:
        p_cols.append("body_html")
    if carry_body_gz and "body_gz" in pages_resolved.columns:
        p_cols.append("body_gz")
    if carry_js_links and "js_links" in pages_resolved.columns:
        p_cols.append("js_links")
    p = pages_resolved.select(*p_cols)
    if "timeout_us" not in wave.columns:
        wave = wave.withColumn("timeout_us", F.lit(None).cast("long"))
    joined = wave.join(p, "url_hash", "left")
    # F-17 per-job timeout (job.go:259-262, jshttp.go:219-226): the request
    # aborts when the page's (redirect-chain-resolved) latency exceeds the
    # job's timeout — status 599 sentinel, same retry path as a 5xx. Checked
    # before flakiness: a timed-out request never observes its response.
    joined = joined.withColumn(
        "_timed_out",
        F.col("page_status").isNotNull()
        & F.col("timeout_us").isNotNull()
        & (F.col("timeout_us") > 0)
        & (F.col("latency_us") > F.col("timeout_us")),
    ).withColumn(
        # elapsed time of a timed-out request is the timeout itself
        "latency_us",
        F.when(F.col("_timed_out"), F.col("timeout_us")).otherwise(F.col("latency_us")),
    )
    sim_status = (
        F.when(F.col("page_status").isNull(), F.lit(404))
        .when(F.col("_timed_out"), F.lit(599))
        .when(F.col("retry_count") < F.coalesce(F.col("flaky_attempts"), F.lit(0)), F.lit(503))
        .otherwise(F.col("page_status"))
    )
    if response_cache is not None:
        c = response_cache.select(
            "cache_key",
            F.col("status").alias("c_status"),
            F.col("body_image_id").alias("c_img"),
            F.col("out_links").alias("c_links"),
        )
        joined = joined.join(c, "cache_key", "left")
        hit = F.col("c_status").isNotNull()
        joined = (
            joined.withColumn("from_cache", hit)
            .withColumn("status", F.when(hit, F.col("c_status")).otherwise(sim_status).cast("int"))
            .withColumn("body_image_id", F.when(hit, F.col("c_img")).otherwise(F.col("body_image_id")))
            .withColumn("out_links", F.when(hit, F.col("c_links")).otherwise(F.col("out_links")))
            .withColumn("latency_us", F.when(hit, F.lit(0)).otherwise(F.col("latency_us")))
            .drop("c_status", "c_img", "c_links")
        )
    else:
        joined = joined.withColumn("from_cache", F.lit(False)).withColumn(
            "status", sim_status.cast("int")
        )
    # DoCheckResponse: per-job accept range, default 2xx (job.go:180-188;
    # customDoCheckResponse pinned by scrapemate_test.go:710-732)
    ok = F.col("status").between(
        F.coalesce(F.col("accept_lo"), F.lit(200)),
        F.coalesce(F.col("accept_hi"), F.lit(299)),
    )
    return (
        joined.withColumn("ok", ok)
        .withColumn("attempts", (F.col("retry_count") + 1).cast("int"))
        .drop("page_status", "_timed_out")
    )


def gunzip_udf():
    """F-11 transparent gzip body decode (nethttp.go:76-86): Arrow-batched
    pandas UDF; the decompress itself is zlib C code per value."""
    import gzip

    @F.pandas_udf("string")
    def _gunzip(b: pd.Series) -> pd.Series:
        return b.map(
            lambda x: gzip.decompress(bytes(x)).decode("utf-8") if x is not None else None
        )

    return _gunzip


def hook_events_expr():
    """F-29 request/response hooks as a side-output column
    (request_hooks.go:31-48): one request event and one response event per
    NETWORK fetch; cache hits fire no hooks (no request went out)."""
    ev = F.array(
        F.struct(
            F.lit("request").alias("kind"),
            F.col("url_canon").alias("url"),
            F.lit(None).cast("int").alias("status"),
        ),
        F.struct(
            F.lit("response").alias("kind"),
            F.col("url_canon").alias("url"),
            F.col("status").cast("int").alias("status"),
        ),
    )
    empty = F.array().cast("array<struct<kind:string,url:string,status:int>>")
    return F.when(F.col("from_cache"), empty).otherwise(ev)


def backoff_delay_expr(retry_k, cap_us):
    """Delay before the k-th retry — the exact doFetch recurrence
    (scrapemate.go:408-448): d₁=100ms; after each sleep,
    if d > cap: d = cap else d *= 2. Unrolled as a CASE chain (retries are
    capped at 5, so the chain depth is bounded; pure Catalyst, no UDF)."""
    d = F.lit(C.INITIAL_RETRY_DELAY_US).cast("long")
    expr = F.when(retry_k == 1, d)
    for k in range(2, C.MAX_RETRIES_CAP + 2):
        d = F.when(d > cap_us, cap_us).otherwise(d * 2)
        expr = expr.when(retry_k == k, d)
    return expr.otherwise(cap_us)


def apply_outcomes(fetched: DataFrame, wave_ts_us: int) -> DataFrame:
    """Policy dispatch → an `outcome` column ∈ {done, failed, retry, stop}.

    retry rows also get their updated retry_count / not_before_us. `stop`
    rows are terminal failures whose policy cancels the whole crawl — the
    driver checks for any such row after the wave commits (deterministic
    analog of cancelFn, scrapemate.go:429-435).
    """
    eff_max = F.greatest(F.lit(0), F.least(F.col("max_retries"), F.lit(C.MAX_RETRIES_CAP)))
    can_retry = F.col("retry_count") < eff_max
    is_retry_pol = F.col("retry_policy").isin(C.RETRY_JOB, C.REFRESH_IP)

    outcome = (
        F.when(F.col("ok"), F.lit("done"))
        .when(F.col("retry_policy") == C.DISCARD_JOB, F.lit("failed"))
        .when(F.col("retry_policy") == C.STOP_SCRAPING, F.lit("stop"))
        .when(is_retry_pol & can_retry, F.lit("retry"))
        .otherwise(F.lit("failed"))
    )
    # pin the incremented count in its own column FIRST: column expressions
    # resolve lazily against the frame they are applied to, so computing the
    # backoff from `retry_count + 1` after retry_count has been overwritten
    # would silently double-increment inside the delay lookup. Both columns
    # of each withColumns batch read only PRIOR-frame columns (the _rc_next
    # batch inlines the outcome expression), so the batching is the identical
    # projection with fewer eager analysis passes (round 6 — this helper runs
    # inside every wave's plan build).
    out = fetched.withColumns(
        {
            "outcome": outcome,
            "_rc_next": F.when(outcome == "retry", F.col("retry_count") + 1)
            .otherwise(F.col("retry_count"))
            .cast("int"),
        }
    )
    delay = F.when(
        F.col("retry_policy") == C.REFRESH_IP, F.lit(0).cast("long")
    ).otherwise(backoff_delay_expr(F.col("_rc_next"), F.col("max_retry_delay_us")))
    return (
        out.withColumns(
            {
                "not_before_us": F.when(
                    F.col("outcome") == "retry", F.lit(wave_ts_us) + delay
                )
                .otherwise(F.col("not_before_us"))
                .cast("long"),
                "retry_count": F.col("_rc_next"),
            }
        )
        .drop("_rc_next")
    )
