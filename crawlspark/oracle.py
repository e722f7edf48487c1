"""Pure-Python scheduler oracle — the executable spec for the BSP engine.

Reimplements scrapemate's scheduler semantics (the bit-for-bit contract,
SURVEY.md §2.3) over the synthetic world at wave granularity, in plain Python.
The Spark engine must reproduce this oracle's crawl order, seen set, retry
trace, and results exactly (tests/test_engine_golden.py).

Parity rules embedded here (reference file:line):
  * strict priority 0>1>2, FIFO(seq) within priority, unknown→high
    — adapters/providers/memory/memory.go:29-98
  * attempts = 1 + max(0, min(max_retries, 5)) — scrapemate.go:455-464
  * backoff 100ms, ×2 after each sleep, clamped AFTER comparison with the cap
    — scrapemate.go:408-448 (crawlspark.constants.backoff_delays_us)
  * DiscardJob → give up after first failed attempt; StopScraping → cancel
    the whole crawl; RefreshIP → retry without delay — scrapemate.go:422-451
  * accept iff 200 ≤ status < 300 (DoCheckResponse default) — job.go:180-188
  * dedup key md5(method:fullURL[+body]) with sorted params — job.go:117-130
  * parent's results precede children (expansion order) — scrapemate_test.go:445-534

New-engine extensions specified here (absent in the reference — SURVEY.md
scope note): robots disallow-prefix gate at admission, per-host politeness
top-k per wave, global wave budget, virtual-time backoff (not_before vs
wave_ts), enqueue-time seen-set dedup.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from crawlspark import constants as C
from crawlspark.jobtypes import DEFAULT_JOB_TYPE, default_specs
from crawlspark.pyparity import cache_key_py, canon_of, host_of
from crawlspark.synth import World

MAX_REDIRECT_HOPS = 3


@dataclass
class OJob:
    job_id: str
    parent_id: str | None
    url_canon: str
    cache_key: str
    host: str
    priority: int
    seq: int
    max_retries: int
    retry_policy: int
    max_retry_delay_us: int
    accept_lo: int = 200
    accept_hi: int = 299
    timeout_us: int | None = None  # F-17 (job.go:259-262)
    use_in_results: bool = True  # O-1 (job.go:112-114)
    is_init: bool = False  # F-5 (scrapemate.go:489-523)
    job_type: str = DEFAULT_JOB_TYPE  # P-2 (job.go:46-47)
    retry_count: int = 0
    not_before_us: int = 0
    state: str = C.ST_PENDING
    wave: int = 0
    attempts: int = 0


@dataclass
class GoldenCrawl:
    crawl_order: list[dict] = field(default_factory=list)  # wave, rank, job_id, url_canon
    seen: list[dict] = field(default_factory=list)  # url_canon, cache_key
    retry_trace: list[dict] = field(default_factory=list)  # job_id, attempts, final_state
    results: list[dict] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)
    stopped: bool = False
    waves: int = 0


def child_job_id(parent_id: str, link_pos: int, url_canon: str) -> str:
    return hashlib.md5(f"{parent_id}|{link_pos}|{url_canon}".encode()).hexdigest()[:16]


def _norm_priority(p: int) -> int:
    # memory.go:78-87: unknown priority routes to the high channel
    return p if p in C.KNOWN_PRIORITIES else C.PRIORITY_HIGH


# F-22 private-network guard — exact twin of politeness.PRIVATE_HOST_RE
# (local_proxy.go:375-386: refuse loopback/private hosts)
_PRIVATE_HOST_RE = __import__("re").compile(
    r"^(localhost$|127\.|0\.0\.0\.0$|10\.|192\.168\.|169\.254\."
    r"|172\.(1[6-9]|2[0-9]|3[01])\.|::1$|\[::1\]$)"
)


def _is_private(host: str) -> bool:
    return bool(_PRIVATE_HOST_RE.match(host or ""))


def _path_of(url_canon: str) -> str:
    """Path component, query stripped — twin of F.parse_url(url, 'PATH')."""
    parts = url_canon.split("/", 3)
    path = "/" + parts[3] if len(parts) > 3 else "/"
    return path.split("?", 1)[0]


def _robots_blocked(robots: dict[str, list[str]], host: str, url_canon: str) -> bool:
    if _is_private(host):
        return True
    prefixes = robots.get(host, [])
    path = _path_of(url_canon)
    return any(path.startswith(p) for p in prefixes)


def _match_child_rule(specs, parent_type: str, url_canon: str):
    """First matching child rule of the parent's type (P-2 dispatch); None
    means the link is ignored — never becomes a job, never enters seen."""
    spec = specs.get(parent_type) or default_specs()[DEFAULT_JOB_TYPE]
    path = _path_of(url_canon)
    for r in spec.child_rules:
        if not r.path_prefix or path.startswith(r.path_prefix):
            return r
    return None


def run_oracle(
    world: World,
    wave_budget: int = C.DEFAULT_WAVE_BUDGET,
    default_host_budget: int = C.DEFAULT_HOST_BUDGET,
    wave_period_us: int = 500_000,
    max_waves: int = C.DEFAULT_MAX_WAVES,
    job_types: dict | None = None,
    fetcher: str = "http",
) -> GoldenCrawl:
    robots = {r["host"]: r["disallow_prefixes"] for r in world.robots}
    budgets = {p["host"]: p["max_per_wave"] for p in world.politeness}
    specs = job_types or default_specs()

    g = GoldenCrawl()
    seen_keys: set[str] = set()
    frontier: list[OJob] = []
    seq_counter = 0

    def admit(job: OJob, wave: int) -> None:
        nonlocal seq_counter
        if job.cache_key in seen_keys:
            return
        seen_keys.add(job.cache_key)
        g.seen.append({"url_canon": job.url_canon, "cache_key": job.cache_key})
        if _robots_blocked(robots, job.host, job.url_canon):
            job.state = C.ST_DISCARDED
            g.retry_trace.append(
                {"job_id": job.job_id, "attempts": 0, "final_state": C.ST_DISCARDED}
            )
            return
        job.seq = seq_counter
        seq_counter += 1
        job.wave = wave
        frontier.append(job)

    # --- wave 0: seed injection (scrapemateapp.go:73-81 analog) -----------
    # Engine dedup key = md5(method:CANONICAL url[+body]) — the reference's
    # GetCacheKey (job.go:117-130) applied to the canonicalized URL (the F-9
    # canonicalization extension folds case/port/fragment variants too).
    for s in sorted(world.seeds, key=lambda x: x["seed_order"]):
        canon = canon_of(s["url"], s["url_params"])
        admit(
            OJob(
                job_id=s["job_id"],
                parent_id=None,
                url_canon=canon,
                cache_key=cache_key_py(s["method"], canon, s["body"]),
                host=host_of(canon),
                priority=_norm_priority(s["priority"]),
                seq=-1,
                max_retries=s["max_retries"],
                retry_policy=s["retry_policy"],
                max_retry_delay_us=s["max_retry_delay_us"] or C.DEFAULT_MAX_RETRY_DELAY_US,
                accept_lo=s.get("accept_lo") or 200,
                accept_hi=s.get("accept_hi") or 299,
                timeout_us=s.get("timeout_us"),
                use_in_results=(
                    True if s.get("use_in_results") is None else bool(s["use_in_results"])
                ),
                is_init=bool(s.get("is_init") or False),
                job_type=s.get("job_type") or DEFAULT_JOB_TYPE,
            ),
            wave=0,
        )

    # --- BSP wave loop (SURVEY.md §3.4) ------------------------------------
    wave = 0
    while wave < max_waves and not g.stopped:
        wave += 1
        wave_ts = wave * wave_period_us

        # F-5 init phase: while any init job is pending, ONLY init jobs run —
        # BFS to exhaustion before workers (scrapemate.go:219-221, 489-523)
        init_phase = any(j.state == C.ST_PENDING and j.is_init for j in frontier)
        eligible = [
            j
            for j in frontier
            if j.state == C.ST_PENDING
            and j.not_before_us <= wave_ts
            and (j.is_init or not init_phase)
        ]
        if not eligible:
            if any(j.state == C.ST_PENDING for j in frontier):
                continue  # backoff not yet eligible — advance virtual time
            break  # fixpoint: inactivity exit analog (scrapemate.go:247-276)

        # politeness: per-host top-k by (priority, seq)
        eligible.sort(key=lambda j: (j.priority, j.seq))
        per_host: dict[str, int] = {}
        polite: list[OJob] = []
        for j in eligible:
            cap = budgets.get(j.host, default_host_budget)
            used = per_host.get(j.host, 0)
            if used < cap:
                per_host[j.host] = used + 1
                polite.append(j)
        # global budget: top-k by (priority, seq) — strict priority, FIFO within
        selected = polite[:wave_budget]

        n_done = n_failed = n_retried = n_new = n_dedup = 0
        children_buffer: list[tuple[int, int, OJob, list[str]]] = []

        for rank, j in enumerate(selected, start=1):
            j.attempts += 1
            g.crawl_order.append(
                {"wave": wave, "rank": rank, "job_id": j.job_id,
                 "url_canon": j.url_canon, "is_init": j.is_init}
            )

            # fetch simulation with transparent redirect follow (Go http client);
            # latency accumulates along the redirect chain (fetch.resolve_redirects)
            page = world.pages.get(j.url_canon)
            missing_target = False
            if page is None:
                status, lat = 404, 0
            else:
                lat, hops = page.latency_us, 0
                while page.redirect_to and hops < MAX_REDIRECT_HOPS:
                    nxt = world.pages.get(canon_of(page.redirect_to))
                    hops += 1
                    if nxt is None:
                        missing_target = True  # resolve_redirects → 404
                        break
                    lat += nxt.latency_us
                    page = nxt
                timed_out = j.timeout_us is not None and j.timeout_us > 0 and lat > j.timeout_us
                if timed_out:
                    status = 599  # F-17: aborted before any response is observed
                elif missing_target:
                    status = 404
                elif page.redirect_to:
                    status = 508  # redirect loop exhausted
                elif j.retry_count < page.flaky_attempts:
                    status = 503
                else:
                    status = page.status
            # DoCheckResponse: per-job accept range (default 2xx,
            # job.go:180-188; custom predicate scrapemate_test.go:710-732)
            ok = j.accept_lo <= status <= j.accept_hi

            if ok:
                j.state = C.ST_DONE
                # O-1 result-emit gate (scrapemate.go:585-591) + F-5 init
                # results discarded (scrapemate.go:489-523) + P-2 per-type
                # emit (collect jobs return nil data); expansion and
                # seen/cache bookkeeping are NOT gated
                emit_type = specs[j.job_type].emit_result if j.job_type in specs else True
                if j.use_in_results and not j.is_init and emit_type:
                    g.results.append(
                        {
                            "job_id": j.job_id,
                            "parent_id": j.parent_id,
                            "url_canon": j.url_canon,
                            "wave": wave,
                            "rank": rank,
                            "status": status,
                            "attempts": j.attempts,
                            "image_id": page.body_image_id if page else None,
                        }
                    )
                g.retry_trace.append(
                    {"job_id": j.job_id, "attempts": j.attempts, "final_state": C.ST_DONE}
                )
                n_done += 1
                if page is not None:
                    # F-24: the js fetcher also observes render-injected
                    # links, appended after the static ones
                    links = list(page.out_links)
                    if fetcher == "js":
                        links += list(page.js_links)
                    if links:
                        children_buffer.append((rank, j.priority, j, links))
                continue

            # failure → policy dispatch (scrapemate.go:422-451)
            pol = j.retry_policy
            if pol == C.DISCARD_JOB:
                j.state = C.ST_FAILED
                g.retry_trace.append(
                    {"job_id": j.job_id, "attempts": j.attempts, "final_state": C.ST_FAILED}
                )
                n_failed += 1
            elif pol == C.STOP_SCRAPING:
                j.state = C.ST_FAILED
                g.retry_trace.append(
                    {"job_id": j.job_id, "attempts": j.attempts, "final_state": C.ST_FAILED}
                )
                n_failed += 1
                g.stopped = True  # whole crawl cancels after this wave commits
            else:  # RETRY_JOB or REFRESH_IP
                if j.retry_count >= C.effective_max_retries(j.max_retries):
                    j.state = C.ST_FAILED
                    g.retry_trace.append(
                        {
                            "job_id": j.job_id,
                            "attempts": j.attempts,
                            "final_state": C.ST_FAILED,
                        }
                    )
                    n_failed += 1
                else:
                    j.retry_count += 1
                    if pol == C.RETRY_JOB:
                        delay = C.backoff_delays_us(
                            j.retry_count, j.max_retry_delay_us
                        )[-1]
                    else:  # RefreshIP: no sleep (scrapemate.go:450 TODO)
                        delay = 0
                    j.not_before_us = wave_ts + delay
                    n_retried += 1

        # crawl expansion: parents in rank order, links in document order
        # (results stream sees parent before child — scrapemate_test.go:445-534)
        for rank, _prio, parent, links in sorted(children_buffer, key=lambda t: t[0]):
            for pos, raw in enumerate(links):
                canon = canon_of(raw)
                # P-2 dispatch: the parent type's rules decide whether this
                # link becomes a job and with which type/config overrides
                rule = _match_child_rule(specs, parent.job_type, canon)
                if rule is None:
                    continue  # ignored by Process — not a job, not "seen"
                ck = cache_key_py("GET", canon)
                if ck in seen_keys:
                    n_dedup += 1
                    continue
                n_new += 1
                admit(
                    OJob(
                        job_id=child_job_id(parent.job_id, pos, canon),
                        parent_id=parent.job_id,
                        url_canon=canon,
                        cache_key=ck,
                        host=host_of(canon),
                        priority=_norm_priority(
                            rule.priority if rule.priority is not None else parent.priority
                        ),
                        seq=-1,
                        max_retries=(
                            rule.max_retries if rule.max_retries is not None else parent.max_retries
                        ),
                        retry_policy=parent.retry_policy,
                        max_retry_delay_us=parent.max_retry_delay_us,
                        accept_lo=parent.accept_lo,
                        accept_hi=parent.accept_hi,
                        timeout_us=(
                            rule.timeout_us if rule.timeout_us is not None else parent.timeout_us
                        ),
                        use_in_results=(
                            rule.use_in_results if rule.use_in_results is not None else True
                        ),  # fresh jobs default true (job.go:112-114)
                        is_init=parent.is_init,  # init descendants stay init
                        job_type=rule.child_type,
                        not_before_us=wave_ts,
                    ),
                    wave=wave,
                )

        g.metrics.append(
            {
                "wave": wave,
                "scheduled": len(selected),
                "completed": n_done,
                "failed": n_failed,
                "retried": n_retried,
                "new_urls": n_new,
                "deduped": n_dedup,
                "pending_after": sum(1 for j in frontier if j.state == C.ST_PENDING),
            }
        )

    g.waves = wave
    return g
