"""Crawler-trap detection (plans/traps.py)."""

from __future__ import annotations

from secretscraper_spark.plans.traps import trap_candidates, url_prefix_profile


def _pages(spark):
    rows = []
    # dup trap: 6 distinct URLs under cal/2026, one repeated content
    for i in range(6):
        rows.append((f"http://a.example/cal/2026/d{i}", "same calendar page"))
    # healthy prefix: 3 URLs, 3 distinct contents
    for i in range(3):
        rows.append((f"http://a.example/blog/posts/{i}", f"post {i}"))
    # explosion: many URLs, all-distinct content
    for i in range(8):
        rows.append((f"http://b.example/search/q/{i}", f"results {i}"))
    # shallow path + NULL content
    rows.append(("http://c.example/", None))
    # query-string pagination: all ?page= values must bucket into ONE
    # prefix (the faceted-search explosion signature)
    for i in range(7):
        rows.append((f"http://d.example/list/all?page={i}", "same listing"))
    return spark.createDataFrame(rows, "url_norm string, caption string")


def test_url_prefix_profile(spark):
    prof = {
        (r.host, r.prefix): (r.n_urls, r.n_content, r.dup_ratio)
        for r in url_prefix_profile(_pages(spark)).collect()
    }
    assert prof[("a.example", "cal/2026")] == (6, 1, round(1 - 1 / 6, 6))
    assert prof[("a.example", "blog/posts")] == (3, 3, 0.0)
    assert prof[("b.example", "search/q")] == (8, 8, 0.0)
    assert prof[("c.example", "")] == (1, 1, 0.0)
    assert prof[("d.example", "list/all")] == (7, 1, round(1 - 1 / 7, 6))


def test_prune_trapped_antijoin(spark):
    """The enqueue-side consumer: trapped prefixes vanish from the
    frontier, everything else (including the shallow root URL) survives
    with columns unchanged."""
    from pyspark.sql import functions as F

    from secretscraper_spark.plans.traps import prune_trapped

    pages = _pages(spark)
    traps = trap_candidates(
        url_prefix_profile(pages), max_urls=5, min_dup=0.8, explosion_cap=8
    )
    frontier = pages.select("url_norm", F.lit(1).alias("depth"))
    kept = prune_trapped(frontier, traps)
    assert kept.columns == ["url_norm", "depth"]
    urls = {r.url_norm for r in kept.collect()}
    assert urls == {
        *(f"http://a.example/blog/posts/{i}" for i in range(3)),
        "http://c.example/",
    }
    # plan: the trap dim broadcasts; the frontier side never shuffles
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_trap_candidates_flags(spark):
    prof = url_prefix_profile(_pages(spark))
    got = {
        (r.host, r.prefix): (r.dup_trap, r.explosion)
        for r in trap_candidates(
            prof, max_urls=5, min_dup=0.8, explosion_cap=8
        ).collect()
    }
    # cal/2026: dup trap (6 >= 5 urls, ratio 0.833 >= 0.8), not an explosion
    # search/q: explosion (8 urls), not a dup trap (all content distinct)
    # list/all: query-string pagination collapses into one dup-trap bucket
    assert got == {
        ("a.example", "cal/2026"): (True, False),
        ("b.example", "search/q"): (False, True),
        ("d.example", "list/all"): (True, False),
    }


def test_crawler_trap_gate(spark):
    """trap_cap wiring: a never-firing cap reproduces the reference crawl
    bit-for-bit; a small per-host cap (prefix_depth=1 groups the sitegen
    '/p/<i>' URLs by host) stops enqueuing into saturated hosts, yielding
    a strict subset crawl with seeds intact."""
    from secretscraper_spark.config import CrawlConfig
    from secretscraper_spark.plans.crawler import SparkCrawler
    from secretscraper_spark.refsim import simulate, site_from_pandas
    from secretscraper_spark.sources.sitegen import (
        generate_pages_pandas,
        seeds_for,
        url_for,
    )

    pdf = generate_pages_pandas(200, 4)
    site = site_from_pandas(pdf)
    cfg = CrawlConfig(max_depth=2, max_page_num=0)
    sim = simulate(site, seeds_for(4), cfg)
    pages = spark.createDataFrame(pdf.drop(columns=["bytes"]))

    never = SparkCrawler(
        spark, pages, cfg, trap_cap=10**9, trap_prefix_depth=1
    ).run(seeds_for(4))
    got = {r.url_norm: (r.depth, r.discovery_seq) for r in never.seen.collect()}
    assert got == sim.seen

    # cap=3: the depth-1 enqueue sees ~5 seen URLs per host, so every
    # host's 'p' prefix is hot and the depth-2 frontier is pruned away
    gated = SparkCrawler(
        spark, pages, cfg, trap_cap=3, trap_prefix_depth=1
    ).run(seeds_for(4))
    gated_seen = {r.url_norm for r in gated.seen.collect()}
    assert gated_seen < set(sim.seen)  # strict subset
    seeds = {url_for(i, 4) for i in (5, 7, 10)}
    assert seeds <= gated_seen  # seeds always crawl; only ENQUEUE is gated
