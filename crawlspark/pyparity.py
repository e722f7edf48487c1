"""Pure-Python twins of the Spark URL expressions in crawlspark.urlnorm.

Used ONLY by the golden-oracle generator and unit tests (never in the Spark
hot path). Pinned against the reference:
  * full_url_py — /root/reference/job.go:225-247 (sorted params, Go
    url.Values.Encode: QueryEscape with space→'+', safe set [A-Za-z0-9-_.~])
  * cache_key_py — /root/reference/job.go:117-130
"""

from __future__ import annotations

import hashlib
from urllib.parse import quote_plus, urlsplit


def go_query_escape(s: str) -> str:
    # Python's quote_plus and Go's url.QueryEscape share the safe set
    # [A-Za-z0-9 ._~-] and space→'+'; both emit uppercase hex.
    return quote_plus(s, safe="")


def full_url_py(url: str, url_params: dict[str, str] | None) -> str:
    if not url_params:
        return url
    qs = "&".join(
        f"{go_query_escape(k)}={go_query_escape(url_params[k])}"
        for k in sorted(url_params)
    )
    return f"{url}?{qs}"


def cache_key_py(method: str, full: str, body: bytes | None = None) -> str:
    to_hash = f"{method}:{full}".encode()
    if method == "POST":
        to_hash += body or b""
    return hashlib.md5(to_hash).hexdigest()


def canonicalize_py(full: str) -> str:
    """Twin of urlnorm.canonicalize: lower scheme/host, strip fragment and
    default port, empty path → '/', query preserved verbatim."""
    parts = urlsplit(full)
    proto = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    port_part = ""
    if port is not None and not (
        (proto == "http" and port == 80) or (proto == "https" and port == 443)
    ):
        port_part = f":{port}"
    path = parts.path or "/"
    query_part = f"?{parts.query}" if parts.query else ""
    return f"{proto}://{host}{port_part}{path}{query_part}"


def canon_of(url: str, url_params: dict[str, str] | None = None) -> str:
    return canonicalize_py(full_url_py(url, url_params))


def host_of(url_canon: str) -> str:
    return urlsplit(url_canon).hostname or ""
