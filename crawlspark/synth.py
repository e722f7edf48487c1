"""Deterministic fixture synthesis (seed=42, no external data) — FIXTURES.md §A.

Generates the crawl world shared by the Spark engine AND the pure-Python
scheduler oracle: images (the BASELINE.json input_hint payload table), a
host-skewed Zipf link graph (`pages`), seed jobs, robots rules, and per-host
politeness budgets. Everything is a pure function of (seed, sizes), so the
same world can be rebuilt at any scale for tests vs bench.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from crawlspark import constants as C
from crawlspark import image as IMG
from crawlspark import schema as S
from crawlspark.pyparity import canon_of, host_of

FMT_CYCLE = ("ppm", "bmp", "png", "qnt")


def _h(s: str) -> int:
    """Deterministic 64-bit hash for traffic-shaping decisions (not xxhash —
    only used to pick statuses/latencies, never as the engine's seen key)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


@dataclass
class PageSpec:
    url_canon: str
    status: int
    flaky_attempts: int  # first k attempts return 503, then `status`
    body_image_id: str | None
    out_links: list[str] = field(default_factory=list)  # raw (pre-canon) link strings
    redirect_to: str | None = None
    latency_us: int = 1000
    body_html: str | None = None  # P-3 link-extraction source (optional)
    # F-24: links injected by client-side rendering — only a js fetcher
    # (jshttp.go:191-235) observes them; the plain http fetcher cannot
    js_links: list[str] = field(default_factory=list)


def render_body_html(url: str, links: list[str]) -> str:
    """Deterministic HTML body whose anchors are exactly `links` in order —
    the P-3 extraction regexp must recover them bit-for-bit."""
    anchors = "".join(f'<a href="{u}">link {i}</a>' for i, u in enumerate(links))
    return f'<html><body><h1>{url}</h1><div class="links">{anchors}</div></body></html>'


@dataclass
class World:
    pages: dict[str, PageSpec]  # keyed by canonical URL
    images: list[dict]
    seeds: list[dict]
    robots: list[dict]
    politeness: list[dict]
    n_hosts: int


def _typed_rows(records: list[dict], schema) -> list[tuple]:
    """Plain-Python row tuples in schema field order.

    Bypasses pandas for small dimension tables: pandas coerces a mixed
    int/None column (e.g. robots.crawl_delay_us) to float64, and the
    non-Arrow createDataFrame verifier rejects 100000.0 for LongType
    (the driver harness runs without Arrow). Tuples keep int/None exact
    on both the Arrow and non-Arrow paths.
    """
    names = [f.name for f in schema.fields]
    return [tuple(r.get(n) for n in names) for r in records]


def _host_name(h: int) -> str:
    return f"h{h:04d}.test"


def _page_url(h: int, i: int) -> str:
    return f"http://{_host_name(h)}/p/{i}"


def make_world(
    n_hosts: int = 12,
    total_pages: int = 400,
    n_images: int | None = None,
    n_seeds: int | None = None,
    seed: int = 42,
    image_sizes: tuple[int, ...] = (16, 32),
    branching: int = 2,
    host_budget: int = 16,
    hot_host_budget: int = 4,
) -> World:
    """Build the deterministic crawl world.

    Host sizes follow Zipf(s≈1.2) so host 0 is hot (the skew the salted
    host-bucket scheme must defuse). The within-host link graph is a binary
    tree (page i → 2i+1, 2i+2) plus cross-host edges and deliberately messy
    link variants (uppercase host, :80, fragments, duplicates) that must all
    canonicalize + dedup to one fetch.
    """
    rng = np.random.Generator(np.random.PCG64(seed))

    weights = np.array([(h + 1) ** -1.2 for h in range(n_hosts)])
    weights /= weights.sum()
    pages_per_host = np.maximum(1, (weights * total_pages).astype(int))

    if n_images is None:
        n_images = max(16, int(pages_per_host.sum()) // 4)

    # --- images (input_hint shape) -------------------------------------
    images = []
    for i in range(n_images):
        iid = f"img{i:08d}"
        w = int(image_sizes[i % len(image_sizes)])
        hgt = int(image_sizes[(i // len(image_sizes)) % len(image_sizes)])
        fmt = FMT_CYCLE[i % len(FMT_CYCLE)]
        px = IMG.reference_pixels(iid, w, hgt)
        data = IMG.ENCODERS[fmt](px)
        decoded = IMG.DECODERS[fmt](data)
        images.append(
            {
                "image_id": iid,
                "bytes": data,
                "w": w,
                "h": hgt,
                "fmt": fmt,
                "caption": f"caption for {iid}: a deterministic {w}x{hgt} {fmt} test image",
                "phash": IMG.average_hash(decoded),
            }
        )

    # --- pages ----------------------------------------------------------
    pages: dict[str, PageSpec] = {}
    for h in range(n_hosts):
        n_p = int(pages_per_host[h])
        for i in range(n_p):
            url = _page_url(h, i)
            canon = canon_of(url)
            hv = _h(canon)
            status, flaky, redirect_to = 200, 0, None
            r = hv % 100
            if r < 4:
                status = 404
            elif r < 7:
                flaky = 1 + (hv >> 8) % 2  # 503 for 1-2 attempts, then 200
            elif r < 9:
                status = 500  # permanently failing
            elif r < 11 and i + 1 < n_p:
                status = 301
                redirect_to = _page_url(h, i + 1)

            links: list[str] = []
            for child in range(branching * i + 1, branching * i + branching + 1):
                if child < n_p:
                    links.append(_page_url(h, child))
            # cross-host edge (hot host gets extra in-links — skew by design)
            if i % 3 == 0 and n_hosts > 1:
                links.append(_page_url((h + i) % n_hosts, i % max(1, int(pages_per_host[(h + i) % n_hosts]))))
            if i % 5 == 0:
                links.append(_page_url(0, i % int(pages_per_host[0])))
            # messy variants: must canonicalize to an existing link above
            if links and i % 4 == 0:
                tgt = links[0]
                hostpart = tgt.split("/")[2]
                variants = [
                    tgt.replace(hostpart, hostpart.upper()),
                    tgt.replace(hostpart, hostpart + ":80"),
                    tgt + "#frag",
                    tgt,  # plain duplicate
                ]
                links.append(variants[(i // 4) % len(variants)])
            # a robots-disallowed link on some hosts
            if i % 6 == 0:
                links.append(f"http://{_host_name(h)}/private/{i}")

            # F-24: some pages inject a link at render time — only the js
            # fetcher discovers it (kept disjoint-ish from static links by
            # using a distinct /ajax/ path)
            js_links: list[str] = []
            if i % 7 == 0:
                js_links.append(f"http://{_host_name(h)}/ajax/{i}")

            pages[canon] = PageSpec(
                url_canon=canon,
                status=status,
                flaky_attempts=flaky,
                body_image_id=f"img{hv % n_images:08d}" if status == 200 or flaky else None,
                out_links=links,
                redirect_to=redirect_to,
                latency_us=1000 + hv % 49000,
                js_links=js_links,
            )

    # /private pages exist but are robots-gated (never fetched if gate works)
    for h in range(n_hosts):
        n_p = int(pages_per_host[h])
        for i in range(0, n_p, 6):
            canon = canon_of(f"http://{_host_name(h)}/private/{i}")
            pages[canon] = PageSpec(
                url_canon=canon,
                status=200,
                flaky_attempts=0,
                body_image_id=f"img{_h(canon) % n_images:08d}",
                out_links=[],
                latency_us=1000,
            )

    # /ajax pages exist; only reachable via js_links (F-24)
    for h in range(n_hosts):
        n_p = int(pages_per_host[h])
        for i in range(0, n_p, 7):
            canon = canon_of(f"http://{_host_name(h)}/ajax/{i}")
            pages[canon] = PageSpec(
                url_canon=canon,
                status=200,
                flaky_attempts=0,
                body_image_id=f"img{_h(canon) % n_images:08d}",
                out_links=[],
                latency_us=1000,
            )

    # --- redirect resolution targets must exist ------------------------
    for spec in list(pages.values()):
        if spec.redirect_to and canon_of(spec.redirect_to) not in pages:
            spec.status, spec.redirect_to = 404, None

    # --- seeds ----------------------------------------------------------
    if n_seeds is None:
        n_seeds = min(n_hosts, 8)
    seeds = []
    for k in range(n_seeds):
        h = k % n_hosts
        url = _page_url(h, 0)
        seeds.append(
            {
                "job_id": f"seed{k:04d}",
                "url": url,
                "method": "GET",
                "body": None,
                "headers": {"User-Agent": C.DEFAULT_USER_AGENT},
                "url_params": {},
                "priority": k % 3,  # exercise all three priority channels
                "max_retries": 2,
                "retry_policy": C.RETRY_JOB,
                "max_retry_delay_us": C.DEFAULT_MAX_RETRY_DELAY_US,
                "accept_lo": 200,
                "accept_hi": 299,
                "timeout_us": None,
                "use_in_results": True,
                "is_init": False,
                "job_type": "page",
                "seed_order": k,
            }
        )

    # --- robots + politeness (new-engine spec, FIXTURES.md A4/A5) -------
    robots = [
        {
            "host": _host_name(h),
            "disallow_prefixes": ["/private"] if h % 2 == 0 else [],
            "crawl_delay_us": 100_000 if h % 5 == 0 else None,
        }
        for h in range(n_hosts)
    ]
    politeness = [
        # hot host gets a tight budget so the per-host window actually bites
        {"host": _host_name(h), "max_per_wave": hot_host_budget if h == 0 else host_budget}
        for h in range(n_hosts)
    ]
    del rng  # all decisions above are hash-derived; rng reserved for future knobs
    return World(
        pages=pages,
        images=images,
        seeds=seeds,
        robots=robots,
        politeness=politeness,
        n_hosts=n_hosts,
    )


def make_mixed_config_world(**kw) -> World:
    """A make_world variant with deterministic PER-JOB fetch config spread
    over the seeds (round 4, for the `crawl_bsp_mixed` oracle): retry policy
    cycles RetryJob / DiscardJob / RefreshIP, per-job retry caps vary 0..3,
    and two timeout tiers (30 ms / 12 ms) bite against the pages' 1–50 ms
    deterministic latencies. Children inherit their seed subtree's config
    (engine._expand_plan), so the whole frontier is config-mixed.
    StopScraping is deliberately absent — the recursive-CTE oracle excludes
    it (bsporacle.py scope note); stop stays pinned by the engine golden."""
    world = make_world(**kw)
    policies = (C.RETRY_JOB, C.DISCARD_JOB, C.REFRESH_IP, C.RETRY_JOB)
    retries = (2, 0, 3, 1)
    timeouts = (None, None, 30_000, 12_000)
    for k, s in enumerate(world.seeds):
        s["retry_policy"] = policies[k % 4]
        s["max_retries"] = retries[k % 4]
        s["timeout_us"] = timeouts[k % 4]
    return world


# ---------------------------------------------------------------------------
# Spark DataFrame construction
# ---------------------------------------------------------------------------


def spark_pages_df(
    spark,
    n_hosts: int = 256,
    total_pages: int = 1_000_000,
    n_images: int = 512,
    branching: int = 4,
    unique_images: bool = False,
):
    """Bench-scale pages table generated ENTIRELY in Spark (no driver loop).

    Same shape and traffic rules as the Python world (Zipf host sizes, md5-
    derived statuses/flakiness, n-ary within-host tree + cross-host edges +
    hot-host skew edges + robots-gated /private links), but the generation is
    a Catalyst expression over spark.range — this is how the 10^10-URL
    frontier world would actually be synthesized on a cluster. Not oracle-
    paired (golden tests use the small Python world); deterministic.
    """
    from pyspark.sql import functions as F

    weights = np.array([(h + 1) ** -1.2 for h in range(n_hosts)])
    weights /= weights.sum()
    sizes = np.maximum(1, (weights * total_pages).astype(int))
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    total = int(sizes.sum())

    sizes_arr = F.array(*[F.lit(int(x)) for x in sizes])
    starts_arr = F.array(*[F.lit(int(x)) for x in starts])

    df = spark.range(total)
    host = (F.size(F.filter(starts_arr, lambda b: b <= F.col("id"))) - 1).alias("host_no")
    df = df.withColumn("host_no", host)
    df = df.withColumn("i", (F.col("id") - F.element_at(starts_arr, F.col("host_no") + 1)).cast("long"))
    df = df.withColumn("n_p", F.element_at(sizes_arr, F.col("host_no") + 1).cast("long"))
    hostname = F.concat(F.lit("h"), F.lpad(F.col("host_no").cast("string"), 4, "0"), F.lit(".test"))
    df = df.withColumn("url", F.concat(F.lit("http://"), hostname, F.lit("/p/"), F.col("i")))
    df = df.withColumn("hv", F.conv(F.substring(F.md5("url"), 1, 15), 16, 10).cast("long"))
    r = F.pmod(F.col("hv"), F.lit(100))
    df = df.withColumn(
        "status",
        F.when(r < 4, 404).when(r < 9, F.when(r < 7, 200).otherwise(500)).otherwise(200).cast("int"),
    ).withColumn(
        "flaky_attempts",
        F.when((r >= 4) & (r < 7), (F.lit(1) + F.pmod(F.shiftright(F.col("hv"), 8), F.lit(2)))).otherwise(0).cast("int"),
    )

    tree = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.lit(branching)),
            lambda k: F.when(
                F.lit(branching) * F.col("i") + k < F.col("n_p"),
                F.concat(F.lit("http://"), hostname, F.lit("/p/"), F.lit(branching) * F.col("i") + k),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    cross_host_no = F.pmod(F.col("host_no") + F.col("i"), F.lit(n_hosts)).cast("int")
    cross_idx = F.pmod(F.col("i"), F.greatest(F.element_at(sizes_arr, (cross_host_no + F.lit(1)).cast("int")).cast("long"), F.lit(1)))
    cross = F.when(
        F.pmod(F.col("i"), F.lit(3)) == 0,
        F.array(
            F.concat(
                F.lit("http://h"), F.lpad(cross_host_no.cast("string"), 4, "0"),
                F.lit(".test/p/"), cross_idx,
            )
        ),
    ).otherwise(F.array())
    hot_idx = F.pmod(F.col("i"), F.lit(int(sizes[0])))
    hot = F.when(
        F.pmod(F.col("i"), F.lit(5)) == 0,
        F.array(F.concat(F.lit("http://h0000.test/p/"), hot_idx)),
    ).otherwise(F.array())
    private = F.when(
        F.pmod(F.col("i"), F.lit(6)) == 0,
        F.array(F.concat(F.lit("http://"), hostname, F.lit("/private/"), F.col("i"))),
    ).otherwise(F.array())
    df = df.withColumn("out_links", F.concat(tree, cross, hot, private))

    if unique_images:
        # every page carries its OWN image (the 10^10-scale reality) — the
        # id is self-describing; payload synthesis/validation derives pixels
        # from it deterministically (image.fetch_validate_udf)
        img = F.concat(F.lit("uimg-"), F.conv(F.col("hv").cast("string"), 10, 16))
    else:
        img = F.concat(F.lit("img"), F.lpad(F.pmod(F.col("hv"), F.lit(n_images)).cast("string"), 8, "0"))
    df = df.withColumn(
        "body_image_id",
        F.when((F.col("status") == 200) | (F.col("flaky_attempts") > 0), img),
    )
    return df.select(
        F.xxhash64("url").alias("url_hash"),
        "url",
        "status",
        "flaky_attempts",
        "body_image_id",
        "out_links",
        F.lit(None).cast("string").alias("redirect_to"),
        (F.lit(1000) + F.pmod(F.col("hv"), F.lit(49000))).cast("long").alias("latency_us"),
    )


def spark_world_tables(
    spark,
    n_hosts: int = 256,
    total_pages: int = 1_000_000,
    n_images: int = 512,
    branching: int = 4,
    n_seeds: int = 64,
    host_budget: int = 4000,
    hot_host_budget: int = 2000,
    image_sizes: tuple[int, ...] = (64,),
    unique_images: bool = False,
):
    """Full bench-scale table set: Spark-generated pages + small python-side
    seeds/robots/budgets/images (those are inherently small)."""
    pages = spark_pages_df(spark, n_hosts, total_pages, n_images, branching, unique_images)
    weights = np.array([(h + 1) ** -1.2 for h in range(n_hosts)])
    weights /= weights.sum()
    sizes = np.maximum(1, (weights * total_pages).astype(int))
    seeds = [
        {
            "job_id": f"seed{k:06d}",
            # spread seeds across hosts AND distinct pages within each host
            # (k % n_hosts alone would collide on page 0 and dedup away)
            "url": _page_url(k % n_hosts, (k // n_hosts) * 97 % int(sizes[k % n_hosts])),
            "method": "GET",
            "body": None,
            "headers": {},
            "url_params": {},
            "priority": k % 3,
            "max_retries": 2,
            "retry_policy": C.RETRY_JOB,
            "max_retry_delay_us": C.DEFAULT_MAX_RETRY_DELAY_US,
            "accept_lo": 200,
            "accept_hi": 299,
            "seed_order": k,
        }
        for k in range(n_seeds)
    ]
    seeds_sdf = spark.createDataFrame(
        _typed_rows(seeds, S.SEEDS_SCHEMA), schema=S.SEEDS_SCHEMA
    )
    robots = spark.createDataFrame(
        _typed_rows(
            [
                {"host": _host_name(h), "disallow_prefixes": ["/private"] if h % 2 == 0 else [],
                 "crawl_delay_us": None}
                for h in range(n_hosts)
            ],
            S.ROBOTS_SCHEMA,
        ),
        schema=S.ROBOTS_SCHEMA,
    )
    budgets = spark.createDataFrame(
        _typed_rows(
            [
                {"host": _host_name(h), "max_per_wave": hot_host_budget if h == 0 else host_budget}
                for h in range(n_hosts)
            ],
            S.POLITENESS_SCHEMA,
        ),
        schema=S.POLITENESS_SCHEMA,
    )
    images = []
    for i in range(n_images):
        iid = f"img{i:08d}"
        w = int(image_sizes[i % len(image_sizes)])
        hgt = int(image_sizes[(i // len(image_sizes)) % len(image_sizes)])
        fmt = FMT_CYCLE[i % len(FMT_CYCLE)]
        px = IMG.reference_pixels(iid, w, hgt)
        data = IMG.ENCODERS[fmt](px)
        images.append(
            {"image_id": iid, "bytes": data, "w": w, "h": hgt, "fmt": fmt,
             "caption": f"caption for {iid}", "phash": IMG.average_hash(IMG.DECODERS[fmt](data))}
        )
    images_sdf = spark.createDataFrame(
        _typed_rows(images, S.IMAGES_SCHEMA), schema=S.IMAGES_SCHEMA
    )
    return pages, seeds_sdf, robots, budgets, images_sdf


def images_df(spark, world: World):
    return spark.createDataFrame(
        _typed_rows(world.images, S.IMAGES_SCHEMA), schema=S.IMAGES_SCHEMA
    )


def body_text_of(url_canon: str) -> str:
    """Deterministic plain-text body (the F-11 gzip payload source)."""
    return f"body of {url_canon} :: deterministic text payload"


def pages_df(spark, world: World, with_body_html: bool = False, with_body_gz: bool = False):
    """Pages table with url_hash computed IN SPARK (xxhash64 parity with the
    frontier's seen keys — no Python xxhash implementation exists or is needed).

    with_body_html=True renders each page's out_links into an HTML body (the
    P-3 extraction source) — the engine's regexp must recover the exact list.
    with_body_gz=True gzips a deterministic text body per page (the F-11
    transparent-decode source).
    """
    import gzip

    rows = [
        {
            "url": p.url_canon,
            "status": p.status,
            "flaky_attempts": p.flaky_attempts,
            "body_image_id": p.body_image_id,
            "out_links": p.out_links,
            "redirect_to": canon_of(p.redirect_to) if p.redirect_to else None,
            "latency_us": p.latency_us,
            "body_html": (
                p.body_html
                if p.body_html is not None
                else (render_body_html(p.url_canon, p.out_links) if with_body_html else None)
            ),
            "body_gz": (
                gzip.compress(body_text_of(p.url_canon).encode(), mtime=0)
                if with_body_gz
                else None
            ),
            "js_links": p.js_links,
        }
        for p in world.pages.values()
    ]
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(
        pdf,
        schema=(
            "url string, status int, flaky_attempts int, body_image_id string, "
            "out_links array<string>, redirect_to string, latency_us bigint, "
            "body_html string, body_gz binary, js_links array<string>"
        ),
    )
    from pyspark.sql import functions as F

    return df.select(
        F.xxhash64("url").alias("url_hash"),
        "url",
        "status",
        "flaky_attempts",
        "body_image_id",
        "out_links",
        "redirect_to",
        "latency_us",
        "body_html",
        "body_gz",
        "js_links",
    )


def seeds_df(spark, world: World):
    return spark.createDataFrame(
        _typed_rows(world.seeds, S.SEEDS_SCHEMA), schema=S.SEEDS_SCHEMA
    )


def robots_df(spark, world: World):
    return spark.createDataFrame(
        _typed_rows(world.robots, S.ROBOTS_SCHEMA), schema=S.ROBOTS_SCHEMA
    )


def politeness_df(spark, world: World):
    return spark.createDataFrame(
        _typed_rows(world.politeness, S.POLITENESS_SCHEMA), schema=S.POLITENESS_SCHEMA
    )
