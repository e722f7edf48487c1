"""DuckDB recursive-CTE twin of the BSP crawl loop — the SQL oracle for
`crawl_bsp_end_to_end` (the engine's flagship query).

The engine's wave loop (engine.py `CrawlEngine.run`, SURVEY.md §3.4) is an
iterated dataflow: selection is a window, fetch is a join, expansion is an
anti-joined union. That makes it expressible as ONE recursive CTE whose
working table carries the full scheduler state between iterations:

    kind='p'  pending frontier rows (job_id, url_canon, host, priority, seq,
              retry_count, not_before)
    kind='s'  the seen set (url_canon — GET-only world, so canon ≡ cache_key)
    kind='c'  one control row: wave counter + the monotone seq_base
    kind='o'  crawl-order output rows (wave, rank) — emitted once, ignored
              by later iterations, collected by the final SELECT

Per iteration (= one wave) the recursive term rebuilds the next state:
eligibility filter (`not_before <= wave*period`), per-host politeness top-k
(ROW_NUMBER PARTITION BY host — the engine's salted two-phase window is an
exact-equivalence optimization, politeness.py docstring), global budget rank
(ROW_NUMBER ORDER BY priority, seq = frontier.select_wave), fetch via LEFT
JOIN against the redirect-resolved pages (fetch.fetch_simulate: missing page
→ 404, attempt < flaky_attempts → 503), outcome dispatch with the exact
doFetch backoff recurrence (scrapemate.go:398-464; delays 100ms·2^k clamped
AFTER the cap comparison), and expansion: links of done parents → SQL
canonicalization → first-occurrence window → NOT EXISTS seen → robots/
private-host gate → seq assignment by (parent_rank, link_pos). Termination:
the control row is produced only while pending rows exist, and every branch
joins it — an empty frontier ends the recursion (the inactivity-exit analog).

Scope (round 4 — per-job config): the state rows carry each job's
retry_policy / max_retries / timeout_us, inherited by children exactly like
engine._expand_plan, so mixed-config worlds (RetryJob + DiscardJob +
RefreshIP policies, per-job retry caps, per-job timeouts against the
redirect-accumulated page latency) get the same hard oracle as the uniform
world (`crawl_bsp_mixed` contract query). Still hard-coded: a uniform
max_retry_delay_us (the unrolled backoff CASE folds the cap), default 2xx
accept ranges, no init jobs, no StopScraping policy (stop truncates the
whole run mid-recursion; it stays pinned by the engine stop golden), a
query-free URL space, and the default single job type.

Reference parity chain: this SQL ⟷ the pure-Python scheduler
(crawlspark/oracle.py, itself pinned to scrapemate.go/memory.go semantics)
⟷ the Spark engine (tests/test_engine_golden.py). The new link is pinned by
tests/test_bsp_oracle.py (DuckDB == pure-Python on multiple worlds).
"""

from __future__ import annotations

from crawlspark import constants as C
from crawlspark.synth import World

_PRIVATE_RE = (
    r"^(localhost$|127\.|0\.0\.0\.0$|10\.|192\.168\.|169\.254\."
    r"|172\.(1[6-9]|2[0-9]|3[01])\.|::1$|\[::1\]$)"
)


def _q(s: str | None) -> str:
    if s is None:
        return "NULL"
    return "'" + s.replace("'", "''") + "'"


def _canon_sql(raw: str) -> str:
    """Canonicalize a raw URL in SQL — twin of urlnorm.canonicalize for
    query-free URLs: strip fragment, lower scheme+host, drop :80/:443
    default ports, empty path → '/'. (`raw` is a SQL expression.)"""
    nf = f"split_part({raw}, '#', 1)"
    scheme = f"lower(split_part({nf}, '://', 1))"
    rest = f"split_part({nf}, '://', 2)"
    auth = f"split_part({rest}, '/', 1)"
    host = f"lower(split_part({auth}, ':', 1))"
    port = f"CASE WHEN strpos({auth}, ':') > 0 THEN split_part({auth}, ':', 2) ELSE '' END"
    port_part = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443') THEN '' "
        f"ELSE ':' || {port} END"
    )
    path = (
        f"CASE WHEN strpos({rest}, '/') > 0 "
        f"THEN substr({rest}, strpos({rest}, '/')) ELSE '/' END"
    )
    return f"({scheme} || '://' || {host} || {port_part} || {path})"


def _backoff_case_sql(expr: str, cap_us: int) -> str:
    """Delay before the k-th retry — the exact doFetch recurrence unrolled
    (fetch.backoff_delay_expr twin): d1=100ms; after each sleep,
    if d > cap: d = cap else d *= 2 (clamp AFTER the comparison)."""
    d = C.INITIAL_RETRY_DELAY_US
    arms = [f"WHEN {expr} = 1 THEN {d}"]
    for k in range(2, C.MAX_RETRIES_CAP + 2):
        d = cap_us if d > cap_us else d * 2
        arms.append(f"WHEN {expr} = {k} THEN {d}")
    return "CASE " + " ".join(arms) + f" ELSE {cap_us} END"


def bsp_order_oracle_sql(
    world: World,
    wave_budget: int,
    default_host_budget: int = C.DEFAULT_HOST_BUDGET,
    wave_period_us: int = 500_000,
    max_waves: int = C.DEFAULT_MAX_WAVES,
) -> str:
    """The full crawl-order oracle query; per-job retry_policy / max_retries /
    timeout_us are carried through the recursion (round 4).

    Returns SQL producing (wave int, rank bigint, job_id, url_canon,
    is_init boolean) — the engine's CrawlRun.order schema."""
    # the generated SQL still folds SOME config into constants — assert the
    # world honors the remaining scope so a drifted fixture fails loudly
    for s in world.seeds:
        assert s["retry_policy"] in (C.RETRY_JOB, C.DISCARD_JOB, C.REFRESH_IP), (
            "oracle excludes StopScraping (stop truncates the run mid-wave; "
            "pinned by the engine stop golden instead)"
        )
        assert (s["max_retry_delay_us"] or C.DEFAULT_MAX_RETRY_DELAY_US) == \
            C.DEFAULT_MAX_RETRY_DELAY_US, "oracle folds a uniform backoff cap"
        assert s.get("accept_lo", 200) == 200 and s.get("accept_hi", 299) == 299
        assert not s.get("is_init"), "oracle assumes no init jobs"
        assert not s.get("url_params"), "oracle assumes query-free URLs"
    backoff = _backoff_case_sql("o.retry_count + 1", C.DEFAULT_MAX_RETRY_DELAY_US)
    eff_max = f"greatest(0, least(o.maxr, {C.MAX_RETRIES_CAP}))"

    pages_vals = ",\n      ".join(
        f"({_q(p.url_canon)}, {p.status}, {p.flaky_attempts}, {_q(p.redirect_to)}, "
        f"{p.latency_us})"
        for p in world.pages.values()
    )
    link_rows = [
        f"({_q(p.url_canon)}, {pos}, {_q(raw)})"
        for p in world.pages.values()
        for pos, raw in enumerate(p.out_links)
    ]
    links_vals = ",\n      ".join(link_rows) if link_rows else "(NULL, NULL, NULL)"
    seeds_vals = ",\n      ".join(
        f"({_q(s['job_id'])}, {_q(s['url'])}, {s['priority']}, {s['seed_order']}, "
        f"{s['retry_policy']}, {s['max_retries']}, "
        f"{s['timeout_us'] if s.get('timeout_us') else 'NULL'})"
        for s in world.seeds
    )
    robots_rows = [
        f"({_q(r['host'])}, {_q(p)})"
        for r in world.robots
        for p in r["disallow_prefixes"]
    ]
    robots_vals = ",\n      ".join(robots_rows) if robots_rows else "(NULL, NULL)"
    budget_vals = ",\n      ".join(
        f"({_q(b['host'])}, {b['max_per_wave']})" for b in world.politeness
    )

    kcanon = _canon_sql("raw")
    scanon = _canon_sql("url")
    krest = "split_part(kcanon, '://', 2)"

    # one redirect-resolution hop (fetch.resolve_redirects): targets come
    # from the ORIGINAL pages table every hop; missing target → 404, no
    # links; latency ACCUMULATES along followed hops (the value the per-job
    # timeout is checked against, fetch.py:124-138)
    def hop(src: str, out: str) -> str:
        return f"""
    {out} AS (
      SELECT a.canon,
        CASE WHEN a.redirect_to IS NOT NULL AND b.canon IS NOT NULL THEN b.status
             WHEN a.redirect_to IS NOT NULL THEN 404 ELSE a.status END AS status,
        CASE WHEN a.redirect_to IS NOT NULL AND b.canon IS NOT NULL THEN b.flaky
             WHEN a.redirect_to IS NOT NULL THEN 0 ELSE a.flaky END AS flaky,
        CASE WHEN a.redirect_to IS NOT NULL AND b.canon IS NOT NULL THEN b.canon
             WHEN a.redirect_to IS NOT NULL THEN NULL ELSE a.link_src END AS link_src,
        CASE WHEN a.redirect_to IS NOT NULL THEN b.redirect_to ELSE NULL END AS redirect_to,
        a.lat + CASE WHEN a.redirect_to IS NOT NULL THEN coalesce(b.lat, 0) ELSE 0 END AS lat
      FROM {src} a LEFT JOIN raw_pages b ON b.canon = a.redirect_to)"""

    return f"""
    WITH RECURSIVE
    raw_pages(canon, status, flaky, redirect_to, lat) AS (VALUES
      {pages_vals}),
    raw_links(page_canon, pos, raw) AS (
      SELECT * FROM (VALUES
      {links_vals}) AS t(page_canon, pos, raw) WHERE page_canon IS NOT NULL),
    robots(host, prefix) AS (
      SELECT * FROM (VALUES
      {robots_vals}) AS t(host, prefix) WHERE host IS NOT NULL),
    budgets(host, budget) AS (VALUES
      {budget_vals}),
    r0 AS (SELECT canon, status, flaky, canon AS link_src, redirect_to, lat FROM raw_pages),
    {hop("r0", "r1")},
    {hop("r1", "r2")},
    {hop("r2", "r3")},
    resolved AS (
      SELECT canon,
             CASE WHEN redirect_to IS NOT NULL THEN 508 ELSE status END AS status,
             flaky, link_src, lat
      FROM r3),
    -- wave-0 seed admission (engine._admit_seeds): canon → in-list dedup by
    -- first seed_order → robots gate → seq by seed_order rank
    seeds_raw(job_id, url, priority, seed_order, pol, maxr, tmo) AS (VALUES
      {seeds_vals}),
    seedc AS (
      SELECT job_id, {scanon} AS canon,
             CASE WHEN priority IN (0, 1, 2) THEN priority ELSE 0 END AS priority,
             seed_order, pol, maxr, CAST(tmo AS BIGINT) AS tmo
      FROM seeds_raw),
    seedd AS (
      SELECT *, split_part(split_part(canon, '://', 2), '/', 1) AS host,
             split_part(substr(split_part(canon, '://', 2),
                        strpos(split_part(canon, '://', 2), '/')), '?', 1) AS path
      FROM (SELECT *, row_number() OVER (PARTITION BY canon ORDER BY seed_order) AS rn
            FROM seedc)
      WHERE rn = 1),
    seed_allowed AS (
      SELECT *, row_number() OVER (ORDER BY seed_order) - 1 AS seq
      FROM seedd d
      WHERE NOT (EXISTS (SELECT 1 FROM robots r
                         WHERE r.host = d.host AND starts_with(d.path, r.prefix))
                 OR regexp_matches(d.host, '{_PRIVATE_RE}'))),
    bsp(kind, wave, job_id, url_canon, host, priority, seq, retry_count, not_before, rank,
        pol, maxr, tmo) AS (
      SELECT 'p', 0, job_id, canon, host, priority, CAST(seq AS BIGINT),
             0, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), pol, maxr, tmo
      FROM seed_allowed
      UNION ALL SELECT 's', 0, NULL, canon, NULL, NULL, NULL, NULL, NULL, NULL,
             NULL, NULL, NULL FROM seedd
      UNION ALL SELECT 'c', 0, NULL, NULL, NULL, NULL,
             (SELECT count(*) FROM seed_allowed), NULL, NULL, NULL, NULL, NULL, NULL
      UNION ALL
      SELECT * FROM (
        WITH prev AS (SELECT * FROM bsp),
        -- the control row exists only while pending rows do → termination
        ctl AS (
          SELECT wave + 1 AS wave, seq AS seq_base FROM prev
          WHERE kind = 'c' AND wave < {max_waves}
            AND EXISTS (SELECT 1 FROM prev p2 WHERE p2.kind = 'p')),
        pend AS (SELECT * FROM prev WHERE kind = 'p'),
        seen AS (SELECT url_canon FROM prev WHERE kind = 's'),
        elig AS (SELECT p.* FROM pend p CROSS JOIN ctl c
                 WHERE p.not_before <= CAST(c.wave AS BIGINT) * {wave_period_us}),
        fut AS (SELECT p.* FROM pend p CROSS JOIN ctl c
                WHERE p.not_before > CAST(c.wave AS BIGINT) * {wave_period_us}),
        -- politeness.per_host_topk (salting is plan-shape only; exact top-k)
        pol AS (SELECT *, row_number() OVER (PARTITION BY host ORDER BY priority, seq) AS hr
                FROM elig),
        pol2 AS (SELECT p.* FROM pol p LEFT JOIN budgets b ON b.host = p.host
                 WHERE p.hr <= coalesce(b.budget, {default_host_budget})),
        -- frontier.select_wave: global (priority, seq) rank, budget cut
        ranked AS (SELECT *, row_number() OVER (ORDER BY priority, seq) AS wrank FROM pol2),
        sel AS (SELECT * FROM ranked WHERE wrank <= {wave_budget}),
        leftover AS (SELECT e.* FROM elig e
                     WHERE NOT EXISTS (SELECT 1 FROM sel s WHERE s.job_id = e.job_id)),
        -- fetch.fetch_simulate: miss → 404; existing page whose accumulated
        -- latency exceeds the job's timeout → 599 (checked BEFORE flakiness:
        -- a timed-out request never observes its response, fetch.py:124-141);
        -- attempt < flaky → 503
        fetched AS (
          SELECT s.*, CASE WHEN r.canon IS NULL THEN 404
                           WHEN s.tmo IS NOT NULL AND s.tmo > 0 AND r.lat > s.tmo THEN 599
                           WHEN s.retry_count < r.flaky THEN 503
                           ELSE r.status END AS status,
                 r.link_src
          FROM sel s LEFT JOIN resolved r ON r.canon = s.url_canon),
        -- fetch.apply_outcomes: per-job policy dispatch (scrapemate.go:422-451)
        -- DiscardJob({C.DISCARD_JOB}) → failed on first failure; RetryJob/
        -- RefreshIP retry while retry_count < min(max_retries, {C.MAX_RETRIES_CAP})
        outc AS (
          SELECT o.*, CASE WHEN o.status BETWEEN 200 AND 299 THEN 'done'
                           WHEN o.pol = {C.DISCARD_JOB} THEN 'failed'
                           WHEN o.retry_count < {eff_max} THEN 'retry'
                           ELSE 'failed' END AS outcome
          FROM fetched o),
        -- engine._expand_plan: links of done parents, doc order
        kids AS (
          SELECT o.job_id AS parent_id, o.wrank AS parent_rank,
                 o.priority AS pprio, o.pol AS kpol, o.maxr AS kmaxr, o.tmo AS ktmo,
                 l.pos, {kcanon} AS kcanon
          FROM outc o JOIN raw_links l ON l.page_canon = o.link_src
          WHERE o.outcome = 'done'),
        kidsh AS (
          SELECT *, split_part({krest}, '/', 1) AS khost,
                 split_part(substr({krest}, strpos({krest}, '/')), '?', 1) AS kpath
          FROM kids),
        kfirst AS (
          SELECT *, row_number() OVER (PARTITION BY kcanon ORDER BY parent_rank, pos) AS krn
          FROM kidsh),
        kmark AS (
          SELECT k.*, (k.krn = 1) AS is_first,
                 EXISTS (SELECT 1 FROM seen s WHERE s.url_canon = k.kcanon) AS is_seen,
                 (EXISTS (SELECT 1 FROM robots r
                          WHERE r.host = k.khost AND starts_with(k.kpath, r.prefix))
                  OR regexp_matches(k.khost, '{_PRIVATE_RE}')) AS is_blocked
          FROM kfirst k),
        admitted AS (
          SELECT *, row_number() OVER (ORDER BY parent_rank, pos) AS arn
          FROM kmark WHERE is_first AND NOT is_seen AND NOT is_blocked),
        freshk AS (SELECT kcanon FROM kmark WHERE is_first AND NOT is_seen)
        -- ------- next-state emission (every branch joins ctl) -------------
        SELECT 'o' AS kind, c.wave, o.job_id, o.url_canon,
               CAST(NULL AS VARCHAR), CAST(NULL AS INT), CAST(NULL AS BIGINT),
               CAST(NULL AS INT), CAST(NULL AS BIGINT), o.wrank,
               CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BIGINT)
        FROM outc o CROSS JOIN ctl c
        UNION ALL
        SELECT 'p', c.wave, f.job_id, f.url_canon, f.host, f.priority, f.seq,
               f.retry_count, f.not_before, NULL, f.pol, f.maxr, f.tmo
        FROM fut f CROSS JOIN ctl c
        UNION ALL
        SELECT 'p', c.wave, e.job_id, e.url_canon, e.host, e.priority, e.seq,
               e.retry_count, e.not_before, NULL, e.pol, e.maxr, e.tmo
        FROM leftover e CROSS JOIN ctl c
        UNION ALL
        -- RefreshIP retries re-enter with NO delay (scrapemate.go:450 TODO)
        SELECT 'p', c.wave, o.job_id, o.url_canon, o.host, o.priority, o.seq,
               o.retry_count + 1,
               CAST(c.wave AS BIGINT) * {wave_period_us}
                 + (CASE WHEN o.pol = {C.REFRESH_IP} THEN 0 ELSE ({backoff}) END),
               NULL, o.pol, o.maxr, o.tmo
        FROM outc o CROSS JOIN ctl c WHERE o.outcome = 'retry'
        UNION ALL
        -- children inherit the parent's retry/timeout config (engine.py:269-270)
        SELECT 'p', c.wave,
               substr(md5(a.parent_id || '|' || CAST(a.pos AS VARCHAR) || '|' || a.kcanon), 1, 16),
               a.kcanon, a.khost, a.pprio, c.seq_base + a.arn - 1, 0,
               CAST(c.wave AS BIGINT) * {wave_period_us}, NULL,
               a.kpol, a.kmaxr, a.ktmo
        FROM admitted a CROSS JOIN ctl c
        UNION ALL
        SELECT 's', c.wave, NULL, s.url_canon, NULL, NULL, NULL, NULL, NULL, NULL,
               NULL, NULL, NULL
        FROM seen s CROSS JOIN ctl c
        UNION ALL
        SELECT 's', c.wave, NULL, f.kcanon, NULL, NULL, NULL, NULL, NULL, NULL,
               NULL, NULL, NULL
        FROM freshk f CROSS JOIN ctl c
        UNION ALL
        SELECT 'c', c.wave, NULL, NULL, NULL, NULL,
               c.seq_base + (SELECT count(*) FROM admitted), NULL, NULL, NULL,
               NULL, NULL, NULL
        FROM ctl c
      )
    )
    SELECT CAST(wave AS INT) AS wave, CAST(rank AS BIGINT) AS rank,
           job_id, url_canon, CAST(FALSE AS BOOLEAN) AS is_init
    FROM bsp WHERE kind = 'o'
    """
