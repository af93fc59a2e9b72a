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
