"""Proxy semantics — parity with the reference (F-18/F-20).

  * NewProxy parsing (/root/reference/proxy.go:32-63, pinned by
    proxy_test.go:10-99): default scheme socks5:// when none given; allowed
    schemes {socks5, http, https, socks5h} (case-insensitive); credentials
    split from the authority; clean URL = scheme://host[:port].
  * Round-robin rotation (/root/reference/adapters/proxy/proxy.go:54-60):
    Next() = atomic counter % len(proxies) — a pure column function here.

Both a Catalyst expression set (hot path, e.g. validating a proxy config
column) and a pure-Python twin (driver-side config parsing + unit tests).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SUPPORTED_SCHEMES = ("socks5", "http", "https", "socks5h")


def proxy_parse_cols(u: Column) -> dict[str, Column]:
    """Catalyst twin of NewProxy: returns {scheme, valid, clean_url,
    username, password} column expressions. Invalid scheme → valid=false and
    null fields (the error return of proxy.go:49-51)."""
    has_scheme = F.instr(u, "://") > 0
    full = F.when(has_scheme, u).otherwise(F.concat(F.lit("socks5://"), u))
    scheme = F.lower(F.substring_index(full, "://", 1))
    valid = scheme.isin(*SUPPORTED_SCHEMES)
    rest = F.substring_index(full, "://", -1)
    # authority splits at the LAST '@' (Go net/url parseAuthority)
    host = F.regexp_replace(rest, "^.*@", "")
    userinfo = F.when(
        F.length(rest) > F.length(host),
        F.substring(rest, F.lit(1), F.length(rest) - F.length(host) - 1),
    ).otherwise(F.lit(""))
    username = F.substring_index(userinfo, ":", 1)
    password = F.when(
        F.instr(userinfo, ":") > 0,
        F.substring(userinfo, F.instr(userinfo, ":") + 1, F.length(userinfo)),
    ).otherwise(F.lit(""))
    clean = F.concat(scheme, F.lit("://"), host)
    return {
        "scheme": F.when(valid, scheme),
        "valid": valid,
        "clean_url": F.when(valid, clean),
        "username": F.when(valid, username),
        "password": F.when(valid, password),
    }


def parse_proxy_py(u: str) -> dict:
    """Pure-Python twin (proxy.go:32-63) — raises ValueError on an
    unsupported scheme, exactly like NewProxy's error return."""
    if "://" not in u:
        u = "socks5://" + u
    scheme, rest = u.split("://", 1)
    scheme = scheme.lower()
    if scheme not in SUPPORTED_SCHEMES:
        raise ValueError(f"invalid proxy type: {scheme}")
    if "@" in rest:
        userinfo, host = rest.rsplit("@", 1)
    else:
        userinfo, host = "", rest
    if ":" in userinfo:
        username, password = userinfo.split(":", 1)
    else:
        username, password = userinfo, ""
    return {
        "url": f"{scheme}://{host}",
        "username": username,
        "password": password,
    }


def round_robin_expr(counter: Column, n_proxies: int) -> Column:
    """Next() = counter % len(proxies) (adapters/proxy/proxy.go:54-60)."""
    return F.pmod(counter, F.lit(n_proxies)).cast("int")
