"""Runnable twin of the reference's books-to-scrape example
(`/root/reference/examples/books-to-scrape-simple`), round 4: extraction is
now driven by CSS SELECTORS over real HTML bodies, not hand-built regexes —
the same selectors the reference's Process code uses:

  * `collect` pages harvest product links with
    `article.product_pod > div.image_container > a::attr(href)` and the
    next-page link with `li.next > a::attr(href)` (collect_job.go:28-52);
    the sidebar banner anchor is never extracted at all — the selector does
    the filtering user Process code does by simply not Find()-ing it.
  * `detail` pages are parsed field-by-field like parseProduct
    (product.go:33-81): `div.product_main > h1` for the name, the
    `p.price_color` text for currency+price, and the th/td table rows
    zipped into a map for UPC / availability / review count.

Run:  cd /root/repo && python examples/books_to_scrape.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from crawlspark import constants as C
from crawlspark import selectors as SEL
from crawlspark import synth
from crawlspark.engine import CrawlConfig, CrawlEngine
from crawlspark.jobtypes import ChildRule, JobTypeSpec
from crawlspark.session import get_spark

HOST = "books.test"

SPECS = {
    "collect": JobTypeSpec(
        "collect",
        emit_result=False,  # Process returns nil data (collect_job.go:71)
        child_rules=(
            ChildRule("/catalogue/", "detail", priority=1, max_retries=3),
            ChildRule("/page/", "collect"),
        ),
        link_selectors=(
            # [href] (round-5 grammar) guards bare <a> anchors, same matches
            "article.product_pod > div.image_container > a[href]::attr(href)",
            "li.next > a[href]::attr(href)",
        ),
    ),
    "detail": JobTypeSpec("detail", emit_result=True, child_rules=()),
}


def _book_url(i: int) -> str:
    return f"http://{HOST}/catalogue/book-{i}"


def _catalog_html(k: int, n_pages: int, per_page: int) -> str:
    pods = "".join(
        f'<article class="product_pod">'
        f'<h3><a href="{_book_url(i)}">Book {i}</a></h3>'
        f'<div class="image_container"><a href="{_book_url(i)}">'
        f'<img src="media/{i}.jpg"></a></div>'
        f'<p class="price_color">£{10 + i % 7}.{i % 100:02d}</p>'
        f"</article>"
        for i in range(k * per_page, (k + 1) * per_page)
    )
    pager = (
        f'<ul class="pager"><li class="next">'
        f'<a href="http://{HOST}/page/{k + 1}">next</a></li></ul>'
        if k + 1 < n_pages
        else '<ul class="pager"></ul>'
    )
    banner = f'<div class="sidebar"><a href="http://{HOST}/banner/{k}">ad</a></div>'
    return f"<html><body><section>{pods}{banner}{pager}</section></body></html>"


def _detail_html(i: int) -> str:
    n_avail = (i * 3) % 7
    avail = f"In stock ({n_avail} available)" if n_avail else "Out of stock"
    rows = "".join(
        f"<tr><th>{k}</th><td>{v}</td></tr>"
        for k, v in (
            ("UPC", f"upc-{i:04d}"),
            ("Product Type", "Books"),
            ("Price (excl. tax)", f"£{10 + i % 7}.{i % 100:02d}"),
            ("Availability", avail),
            ("Number of reviews", str(i % 4)),
        )
    )
    # the real product page wraps the article in <div id="content_inner">
    # (books.toscrape.com markup) — kept here so the parse twin can anchor
    # on #id, exercising the round-5 selector grammar end-to-end
    return (
        f'<html><body><div id="content_inner"><div class="product_main">'
        f"<h1>Book {i}</h1>"
        f'<p class="price_color">£{10 + i % 7}.{i % 100:02d}</p></div>'
        f'<table class="table-striped"><tbody>{rows}</tbody></table>'
        f"</div></body></html>"
    )


def shop_world(n_pages: int = 4, per_page: int = 5) -> synth.World:
    world = synth.make_world(n_hosts=1, total_pages=8)  # shell; pages replaced
    world.pages = {}
    for k in range(n_pages):
        canon = synth.canon_of(f"http://{HOST}/page/{k}")
        world.pages[canon] = synth.PageSpec(
            url_canon=canon, status=200, flaky_attempts=0,
            body_image_id=None, out_links=[], latency_us=1000,
            body_html=_catalog_html(k, n_pages, per_page),
        )
    for i in range(n_pages * per_page):
        canon = synth.canon_of(_book_url(i))
        world.pages[canon] = synth.PageSpec(
            url_canon=canon, status=200, flaky_attempts=0,
            body_image_id=None, out_links=[], latency_us=1000,
            body_html=_detail_html(i),
        )
    world.seeds = [{
        "job_id": "collect00", "url": f"http://{HOST}/page/0", "method": "GET",
        "body": None, "headers": {}, "url_params": {}, "priority": 0,
        "max_retries": 2, "retry_policy": C.RETRY_JOB,
        "max_retry_delay_us": C.DEFAULT_MAX_RETRY_DELAY_US, "seed_order": 0,
        "job_type": "collect",
    }]
    world.robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_us": None}]
    world.politeness = [{"host": HOST, "max_per_wave": 100}]
    return world


def parse_products(spark, world: synth.World):
    """The parseProduct twin (product.go:33-81) as one DataFrame pass:
    selector UDFs pull the fields, map_from_arrays zips the th/td rows (the
    switch-on-header loop), regexps mirror parseCurrency/parsePrice/
    parseAvailability's Sscanf formats."""
    pages = synth.pages_df(spark, world).filter(F.col("url").contains("/catalogue/"))
    body = F.col("body_html")
    first = lambda sel: F.element_at(SEL.css_select_udf(sel)(body), 1)  # noqa: E731
    # #content_inner anchors on the real page's id wrapper (round-5 grammar)
    price_txt = first("#content_inner div.product_main > p.price_color")
    kv = F.map_from_arrays(
        SEL.css_select_udf("#content_inner table.table-striped th")(body),
        SEL.css_select_udf("#content_inner table.table-striped td")(body),
    )
    avail_n = F.coalesce(
        F.regexp_extract(kv["Availability"], r"In stock \((\d+) available\)", 1)
        .try_cast("int"),
        F.lit(0),
    )
    return pages.select(
        F.col("url").alias("url_canon"),
        first("div.product_main > h1").alias("name"),
        F.substring(price_txt, 1, 1).alias("currency"),  # parseCurrency: 1st rune
        F.regexp_extract(price_txt, r"([0-9.]+)", 1).cast("double").alias("price_excl_tax"),
        kv["UPC"].alias("upc"),
        kv["Product Type"].alias("product_type"),
        avail_n.alias("availability"),
        (avail_n > 0).alias("in_stock"),
        kv["Number of reviews"].cast("int").alias("numbers_of_reviews"),
    )


def run_books(spark):
    world = shop_world()
    eng = CrawlEngine(
        spark,
        pages=synth.pages_df(spark, world),
        robots=synth.robots_df(spark, world),
        budgets=synth.politeness_df(spark, world),
        images=None,
        config=CrawlConfig(
            validate_images=False, job_types=SPECS, wave_budget=50,
            extract_links_from_body=True,
        ),
    )
    run = eng.run(synth.seeds_df(spark, world))
    products = run.results.select("job_id", "url_canon", "wave", "rank").join(
        parse_products(spark, world), "url_canon"
    )
    return world, run, products


def main() -> None:
    spark = get_spark(app_name="books-to-scrape", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    world, run, products = run_books(spark)

    print("\ncrawl order (wave, rank, url):")
    for r in run.order.orderBy("wave", "rank").collect():
        print(f"  {r.wave}  {r.rank:>3}  {r.url_canon}")

    rows = products.orderBy("url_canon").collect()
    print(f"\nproducts ({len(rows)} rows — detail jobs only; collect emits none):")
    for r in rows[:5]:
        print(f"  {r.upc}  {r.name}  {r.currency}{r.price_excl_tax:.2f} "
              f"in_stock={r.in_stock} reviews={r.numbers_of_reviews}")
    banner_seen = run.seen.filter("cache_key LIKE '%banner%'").count()
    print(f"\nbanner links fetched or seen: {banner_seen} "
          "(the selector never extracts them)")
    assert len(rows) == 20 and banner_seen == 0
    print("OK")
    spark.stop()


if __name__ == "__main__":
    main()
