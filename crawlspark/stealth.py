"""F-23 stealth header profiles — broadcast profile table.

Reference: the stealth fetcher attaches a browser-specific ordered header
profile to every request (/root/reference/adapters/fetchers/stealth/
stealth.go:41-97, browsers.go:31-113). The TLS-fingerprint mimicry itself is
network plumbing (out of scope, SURVEY.md §7.6); the semantics-bearing part
is the per-profile header set merged under the job's own headers — which is
a broadcast map lookup + map_concat here. Header values below are
engine-defined stand-ins (not copied from the reference), keyed by the same
profile names the reference dispatches on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlspark.constants import DEFAULT_USER_AGENT

# profile → default header map (job headers override on key collision)
HEADER_PROFILES: dict[str, dict[str, str]] = {
    "chrome": {
        "User-Agent": DEFAULT_USER_AGENT,
        "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
        "Accept-Language": "en-US,en;q=0.9",
        "Accept-Encoding": "gzip, deflate, br",
        "Sec-Fetch-Mode": "navigate",
    },
    "firefox": {
        "User-Agent": "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",
        "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
        "Accept-Language": "en-US,en;q=0.5",
        "Accept-Encoding": "gzip, deflate, br",
        "Upgrade-Insecure-Requests": "1",
    },
    "safari": {
        "User-Agent": (
            "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
            "(KHTML, like Gecko) Version/16.5 Safari/605.1.15"
        ),
        "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
        "Accept-Language": "en-US,en;q=0.9",
        "Accept-Encoding": "gzip, deflate, br",
    },
}


def profiles_df(spark) -> DataFrame:
    rows = [(name, hdrs) for name, hdrs in HEADER_PROFILES.items()]
    return spark.createDataFrame(rows, "profile string, profile_headers map<string,string>")


def with_profile_headers(jobs: DataFrame, spark, profile: str) -> DataFrame:
    """Broadcast-join the profile's header map onto every job and merge it
    UNDER the job's own headers (job wins on collision — the reference sets
    profile headers first, then the job's explicit ones)."""
    if profile not in HEADER_PROFILES:
        raise ValueError(f"unknown header profile: {profile!r} (have {sorted(HEADER_PROFILES)})")
    prof = profiles_df(spark).filter(F.col("profile") == profile)
    joined = jobs.crossJoin(F.broadcast(prof.select("profile_headers")))
    # map_concat keeps the LAST value per duplicate key with mapKeyDedupPolicy
    # LAST_WIN; to stay policy-independent, drop profile keys that the job
    # already sets, then concat
    job_h = F.coalesce(F.col("headers"), F.map_from_arrays(F.array(), F.array()))
    prof_minus_job = F.map_filter(
        F.col("profile_headers"),
        lambda k, _v: ~F.array_contains(F.map_keys(job_h), k),
    )
    return joined.withColumn(
        "effective_headers", F.map_concat(prof_minus_job, job_h)
    ).drop("profile_headers")
