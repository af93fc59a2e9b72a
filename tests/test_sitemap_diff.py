"""Sitemap source + crawl-snapshot diff tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from secretscraper_spark.plans.snapdiff import crawl_diff, diff_summary
from secretscraper_spark.sources.sitemap import (
    expand_sitemap_indexes,
    parse_sitemap_entries,
    sitemap_seed_urls,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> http://a.example/p1 </loc><lastmod>2026-01-01</lastmod></url>
  <url><loc>http://a.example/p2?x=1&amp;y=2</loc></url>
  <url><loc>http://a.example/p3&amp;lt;odd</loc></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.example/sitemap_a.xml</loc></sitemap>
  <sitemap><loc>http://a.example/sitemap_missing.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_entries(spark):
    df = spark.createDataFrame(
        [("http://a.example/sitemap.xml", URLSET),
         ("http://a.example/sitemap_index.xml", INDEX)],
        "url string, body string",
    )
    rows = {(r.sitemap_url, r.loc, r.kind) for r in parse_sitemap_entries(df).collect()}
    assert rows == {
        # whitespace trimmed, entities unescaped exactly one level
        ("http://a.example/sitemap.xml", "http://a.example/p1", "url"),
        ("http://a.example/sitemap.xml", "http://a.example/p2?x=1&y=2", "url"),
        ("http://a.example/sitemap.xml", "http://a.example/p3&lt;odd", "url"),
        ("http://a.example/sitemap_index.xml", "http://a.example/sitemap_a.xml", "sitemap"),
        ("http://a.example/sitemap_index.xml", "http://a.example/sitemap_missing.xml", "sitemap"),
    }


def test_expand_sitemap_indexes(spark):
    child = """<urlset><url><loc>http://a.example/deep1</loc></url>
    <url><loc>http://a.example/deep2</loc></url></urlset>"""
    bodies = spark.createDataFrame(
        [("http://a.example/sitemap_index.xml", INDEX),
         ("http://a.example/sitemap_a.xml", child)],
        "url string, body string",
    )
    roots = bodies.filter(F.col("url").contains("index"))
    got = {r.url for r in expand_sitemap_indexes(roots, bodies).collect()}
    # the missing child contributes nothing; the fetched child's pages land
    assert got == {"http://a.example/deep1", "http://a.example/deep2"}


def test_sitemap_seed_urls_from_pages(spark):
    pages = spark.createDataFrame(
        [("http://a.example/sitemap.xml", URLSET),
         ("http://a.example/not-a-map.html", "<html><loc>nope</loc></html>")],
        "url_norm string, caption string",
    )
    got = {r.url for r in sitemap_seed_urls(pages).collect()}
    assert got == {
        "http://a.example/p1",
        "http://a.example/p2?x=1&y=2",
        "http://a.example/p3&lt;odd",
    }


def test_seeds_from_robots_sitemaps(spark):
    """Cold-start path: robots.txt Sitemap: records → sitemap bodies in the
    pages store → page URLs; a listed-but-unfetched sitemap contributes
    nothing, and sitemaps NOT listed in robots are not used as roots
    (though an index may still reach them as children)."""
    from secretscraper_spark.sources.sitemap import seeds_from_robots_sitemaps

    robots = "\n".join([
        "User-agent: *",
        "Disallow: /private",
        # arbitrary filename: the robots listing is authoritative, names
        # need not contain 'sitemap'
        "Sitemap: http://a.example/feeds.xml",
        "  sitemap:\thttp://a.example/sitemap_missing2.xml",
        "NotSitemap: http://a.example/decoy.xml",
    ])
    index = (
        '<sitemapindex><sitemap><loc>http://a.example/sitemap_a.xml'
        "</loc></sitemap></sitemapindex>"
    )
    orphan = "<urlset><url><loc>http://a.example/orphan</loc></url></urlset>"
    pages = spark.createDataFrame(
        [
            ("http://a.example/robots.txt", robots),
            ("http://a.example/feeds.xml", index),
            ("http://a.example/sitemap_a.xml", URLSET),
            # fetched but not listed in robots and not reachable from the
            # index -> must not contribute
            ("http://a.example/sitemap_orphan.xml", orphan),
            ("http://a.example/page.html", "<html>Sitemap: http://x/no</html>"),
        ],
        "url_norm string, caption string",
    )
    got = {r.url for r in seeds_from_robots_sitemaps(pages).collect()}
    assert got == {
        "http://a.example/p1",
        "http://a.example/p2?x=1&y=2",
        "http://a.example/p3&lt;odd",
    }


def test_crawl_diff_all_classes(spark):
    old = spark.createDataFrame(
        [("u_removed", "200", 10), ("u_status", "200", 10),
         ("u_content", "200", 10), ("u_same", "200", 10),
         ("u_nullst", None, 10)],
        "url_norm string, status string, content_length int",
    )
    new = spark.createDataFrame(
        [("u_added", "200", 10), ("u_status", "404", 10),
         ("u_content", "200", 11), ("u_same", "200", 10),
         ("u_nullst", None, 10)],
        "url_norm string, status string, content_length int",
    )
    got = {r.url_norm: r.change for r in crawl_diff(old, new).collect()}
    assert got == {
        "u_added": "added",
        "u_removed": "removed",
        "u_status": "status_changed",
        "u_content": "content_changed",
        "u_same": "unchanged",
        # NULL status in BOTH snapshots is presence, not absence
        "u_nullst": "unchanged",
    }
    summary = {r.change: r.n for r in diff_summary(crawl_diff(old, new)).collect()}
    assert summary == {
        "added": 1, "removed": 1, "status_changed": 1,
        "content_changed": 1, "unchanged": 2,
    }


def test_crawl_diff_no_fingerprint(spark):
    old = spark.createDataFrame([("u", "200", 10)], "url_norm string, status string, content_length int")
    new = spark.createDataFrame([("u", "200", 99)], "url_norm string, status string, content_length int")
    got = crawl_diff(old, new, fingerprint_col=None).collect()
    assert got[0].change == "unchanged"  # content ignored when disabled


def test_parse_sitemap_hints_changefreq_priority(spark):
    """changefreq/priority parse per block with structural pairing;
    absent → NULL; unparseable priority → NULL (try_cast); changefreq
    lowercased."""
    from secretscraper_spark.sources.sitemap import (
        parse_sitemap_urls_with_lastmod,
    )

    body = (
        "<urlset>"
        "<url><loc>http://a.example/p1</loc>"
        "<changefreq>Daily</changefreq><priority>0.9</priority></url>"
        "<url><loc>http://a.example/p2</loc></url>"
        "<url><loc>http://a.example/p3</loc>"
        "<priority>high</priority><changefreq>never</changefreq></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("http://a.example/sm.xml", body)], "url string, body string"
    )
    got = {
        r.loc: (r.changefreq, r.priority)
        for r in parse_sitemap_urls_with_lastmod(df).collect()
    }
    assert got["http://a.example/p1"] == ("daily", 0.9)
    assert got["http://a.example/p2"] == (None, None)
    assert got["http://a.example/p3"] == ("never", None)


def test_merge_sitemap_hints(spark):
    """Hand-computed merge: changefreq tightens but never loosens the
    observed gap; 'never'/unknown tokens leave it alone; lastmod newer
    than the last fetch flags known_changed; duplicate locs pre-aggregate;
    priority defaults to 0.5."""
    from secretscraper_spark.plans.recrawl import merge_sitemap_hints

    day = 86_400_000
    now = 100 * day
    schedule = spark.createDataFrame(
        [
            # url, last_ms, gap_ms (observed)
            ("u-tight", 90 * day, 10 * day),   # hinted daily -> gap 1 day
            ("u-loose", 90 * day, 2 * day),    # hinted monthly -> stays 2d
            ("u-never", 90 * day, 5 * day),    # 'never' -> stays 5d
            ("u-nohint", 90 * day, 3 * day),   # absent -> stays 3d
            ("u-changed", 99 * day, 10 * day), # lastmod > last fetch
        ],
        "url string, last_ms long, gap_ms long",
    ).withColumns(
        {
            "next_due_ms": F.col("last_ms") + F.col("gap_ms"),
            "overdue_ms": F.lit(now) - (F.col("last_ms") + F.col("gap_ms")),
        }
    )
    hints = spark.createDataFrame(
        [
            ("u-tight", None, "daily", 0.9),
            # duplicate loc: tightest freq + freshest lastmod + max prio win
            ("u-tight", 80 * day, "monthly", 0.2),
            ("u-loose", None, "monthly", None),
            ("u-never", None, "never", 0.1),
            ("u-changed", 99 * day + 1, None, None),
        ],
        "loc string, lastmod_ms long, changefreq string, priority double",
    )
    got = {
        r.url: r
        for r in merge_sitemap_hints(schedule, hints, now_ms=now).collect()
    }
    assert got["u-tight"].gap_ms == day and got["u-tight"].hint_priority == 0.9
    assert got["u-tight"].overdue_ms == now - (90 * day + day)
    assert not got["u-tight"].known_changed  # lastmod 80d < last fetch 90d
    assert got["u-loose"].gap_ms == 2 * day          # hint never loosens
    assert got["u-never"].gap_ms == 5 * day          # 'never' -> NULL freq
    assert got["u-nohint"].gap_ms == 3 * day
    assert got["u-nohint"].hint_priority == 0.5      # spec default
    assert got["u-changed"].known_changed


def test_parse_sitemap_urls_with_lastmod(spark):
    """Structural pairing: a block without lastmod yields NULL and never
    borrows a neighbour's; date and datetime forms parse to epoch ms;
    garbage dates yield NULL ms, not errors."""
    from secretscraper_spark.sources.sitemap import parse_sitemap_urls_with_lastmod

    body = (
        "<urlset>"
        "<url><loc>http://a.example/p1</loc>"
        "<lastmod>2026-01-02</lastmod></url>"
        "<url><loc>http://a.example/p2</loc></url>"
        "<url><lastmod>2026-01-03T12:00:00Z</lastmod>"
        "<loc> http://a.example/p3 </loc></url>"
        "<url><loc>http://a.example/p4</loc><lastmod>garbage</lastmod></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("http://a.example/sitemap.xml", body)], "url string, body string"
    )
    got = {
        r.loc: (r.lastmod, r.lastmod_ms)
        for r in parse_sitemap_urls_with_lastmod(df).collect()
    }
    day_ms = 86_400_000
    base = 1_767_225_600_000  # 2026-01-01T00:00:00Z
    assert got["http://a.example/p1"] == ("2026-01-02", base + day_ms)
    assert got["http://a.example/p2"] == (None, None)
    assert got["http://a.example/p3"] == (
        "2026-01-03T12:00:00Z", base + 2 * day_ms + 12 * 3_600_000
    )
    assert got["http://a.example/p4"] == ("garbage", None)


def test_expand_sitemap_indexes_depth_zero_is_empty(spark):
    bodies = spark.createDataFrame(
        [("http://a.example/sitemap.xml", URLSET)], "url string, body string"
    )
    got = expand_sitemap_indexes(bodies, bodies, max_depth=0).collect()
    assert got == []  # page URLs only — never the sitemap docs themselves


def test_sitemap_seed_urls_resolves_oddly_named_children(spark):
    # the root is name-filtered, but index CHILDREN may be named anything
    # — they must resolve against the full pages store
    index = ("<sitemapindex><sitemap><loc>http://a.example/feeds.xml"
             "</loc></sitemap></sitemapindex>")
    child = "<urlset><url><loc>http://a.example/via-feed</loc></url></urlset>"
    pages = spark.createDataFrame(
        [("http://a.example/sitemap_index.xml", index),
         ("http://a.example/feeds.xml", child)],
        "url_norm string, caption string",
    )
    got = {r.url for r in sitemap_seed_urls(pages).collect()}
    assert got == {"http://a.example/via-feed"}
