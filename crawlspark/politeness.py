"""Per-host politeness + robots gating (new-engine spec — the reference has
neither; SURVEY.md scope note. Semantics defined in FIXTURES.md A4/A5 and
pinned by the oracle).

Skew story (SURVEY.md §4.3.1): a hot host would funnel its whole backlog into
one window task. The per-host top-k therefore runs in two phases:
  1. rank within (host, salt) where salt = pmod(url_hash, S) — a hot host's
     rows are spread over S tasks; each salt keeps at most `budget` rows, so
     survivors ≤ S × budget per host;
  2. rank within host over the tiny survivor set.
Phase-2 input is bounded by S×budget×n_hosts — never the raw backlog. The
top-k by (priority, seq) of a union of per-salt top-k's equals the global
per-host top-k, so this is exact, not approximate. AQE skew-join handling is
the second line of defense behind this explicit salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawlspark import constants as C


# F-22 private-network guard (reference: refuse CONNECT to loopback/private
# IPs, /root/reference/adapters/fetchers/jshttp/local_proxy.go:375-386).
# Hostname/literal-IP patterns only — admission must not do DNS. Kept in
# exact sync with the pure-Python twin in crawlspark.oracle.
PRIVATE_HOST_RE = (
    r"^(localhost$|127\.|0\.0\.0\.0$|10\.|192\.168\.|169\.254\."
    r"|172\.(1[6-9]|2[0-9]|3[01])\.|::1$|\[::1\]$)"
)


def is_private_host(host) -> "F.Column":
    """True for loopback / RFC-1918 / link-local hosts (F-22 guard)."""
    return F.coalesce(host, F.lit("")).rlike(PRIVATE_HOST_RE)


def with_robots_flag(jobs: DataFrame, robots: DataFrame) -> DataFrame:
    """Row-preserving admission check: adds `_blocked` when either the host's
    robots disallow-prefixes match the path OR the host is private (F-22).

    robots is per-host and small relative to the frontier → broadcast join.
    Path extraction + prefix match are built-ins (no UDF).
    """
    r = robots.select("host", "disallow_prefixes")
    joined = jobs.join(F.broadcast(r), "host", "left")
    path = F.coalesce(F.parse_url(F.col("url_canon"), F.lit("PATH")), F.lit("/"))
    blocked_expr = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array()),
        lambda p: F.startswith(path, p),
    )
    return joined.withColumn(
        "_blocked",
        F.coalesce(blocked_expr, F.lit(False)) | is_private_host(F.col("host")),
    ).drop("disallow_prefixes")


def robots_gate(jobs: DataFrame, robots: DataFrame) -> DataFrame:
    """Split jobs into (allowed, blocked) by disallow-prefix match."""
    with_flag = with_robots_flag(jobs, robots)
    allowed = with_flag.filter(~F.col("_blocked")).drop("_blocked")
    blocked = with_flag.filter(F.col("_blocked")).drop("_blocked")
    return allowed, blocked


def per_host_topk(
    eligible: DataFrame,
    budgets: DataFrame,
    default_budget: int = C.DEFAULT_HOST_BUDGET,
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep at most budget(host) rows per host, best-first by (priority, seq).

    Two-phase salted window (see module docstring). Budgets broadcast-join on
    host; hosts missing from the table get `default_budget`.
    """
    b = budgets.select("host", "max_per_wave")
    df = eligible.join(F.broadcast(b), "host", "left").withColumn(
        "_budget", F.coalesce(F.col("max_per_wave"), F.lit(default_budget))
    ).drop("max_per_wave")

    # When the frame carries its frontier layout column (host_bucket =
    # f(host), urlnorm.host_bucket), lead the window partition keys with it.
    # Semantics are identical — row_number within (host_bucket, host, salt)
    # IS row_number within (host, salt) since host determines host_bucket —
    # but the required distribution becomes ClusteredDistribution(host_bucket,
    # …), which the frontier snapshot's stored hashpartitioning(host_bucket)
    # already satisfies (a subset partitioning satisfies a clustered
    # requirement), so BOTH politeness windows run exchange-free on top of
    # the persisted frontier: two full shuffles of the pending set removed
    # from every wave. Frames without the column (library callers) keep the
    # plain keys and pay the exchanges.
    lead = [F.col("host_bucket")] if "host_bucket" in df.columns else []
    salt = F.pmod(F.col("url_hash"), F.lit(salt_buckets))
    w1 = Window.partitionBy(*lead, F.col("host"), salt).orderBy("priority", "seq")
    phase1 = df.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= F.col("_budget")
    ).drop("_r1")

    w2 = Window.partitionBy(*lead, F.col("host")).orderBy("priority", "seq")
    return (
        phase1.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= F.col("_budget"))
        .drop("_r2", "_budget")
    )
