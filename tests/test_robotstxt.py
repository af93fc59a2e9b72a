"""robots.txt parser tests: unit semantics, stdlib urllib.robotparser
parity on Allow-free corpora, the Spark robots_table/robots_from_pages
plans, and the parsed dim driving the existing robots_gate."""

from __future__ import annotations

import urllib.robotparser

from pyspark.sql import functions as F

from secretscraper_spark.plans.robotstxt import (
    parse_robots_text,
    robots_from_pages,
    robots_table,
)
from secretscraper_spark.plans.politeness import robots_gate

BODY = """
# global rules
User-agent: *
Disallow: /private
Disallow: /tmp/
Crawl-delay: 2

User-agent: fastbot
Disallow:

User-agent: secretscraper
User-agent: otherbot
Disallow: /only-for-us   # trailing comment
Crawl-delay: 0.5
Unknown-directive: ignored
"""


def test_parse_group_selection_longest_match():
    # exact product token beats '*'
    assert parse_robots_text(BODY, "secretscraper") == (["/only-for-us"], 0.5)
    # multi-agent group binds to every listed agent
    assert parse_robots_text(BODY, "otherbot") == (["/only-for-us"], 0.5)
    # empty Disallow = allow all for that agent
    assert parse_robots_text(BODY, "fastbot") == ([], None)
    # anyone else falls back to '*'
    assert parse_robots_text(BODY, "randombot") == (["/private", "/tmp/"], 2.0)


def test_parse_edge_cases():
    assert parse_robots_text("", "x") == ([], None)
    assert parse_robots_text(None, "x") == ([], None)
    # no matching group and no '*': nothing applies
    assert parse_robots_text("User-agent: a\nDisallow: /x", "b") == ([], None)
    # malformed crawl-delay ignored, valid rules kept
    got = parse_robots_text(
        "User-agent: *\nCrawl-delay: soon\nDisallow: /y", "x"
    )
    assert got == (["/y"], None)
    # a second User-agent line AFTER rules starts a NEW group
    body = "User-agent: a\nDisallow: /a\nUser-agent: b\nDisallow: /b"
    assert parse_robots_text(body, "a") == (["/a"], None)
    assert parse_robots_text(body, "b") == (["/b"], None)


def test_parity_with_urllib_robotparser():
    # Allow-free corpus, specific groups before '*' (urllib consults the
    # '*' entry only as fallback — same selection our longest-match makes)
    bodies = [
        "User-agent: alphabot\nDisallow: /a\nDisallow: /b/c\n\nUser-agent: *\nDisallow: /all\nCrawl-delay: 3",
        "User-agent: *\nDisallow:",
        "User-agent: *\nDisallow: /",
        "User-agent: alphabot\nCrawl-delay: 7\nDisallow: /deep/path\n",
    ]
    paths = ["/", "/a", "/a/sub", "/b", "/b/c/d", "/all", "/allx", "/deep/path", "/ok"]
    for body in bodies:
        for ua in ("alphabot", "zetabot"):
            rp = urllib.robotparser.RobotFileParser()
            rp.parse(body.splitlines())
            prefixes, delay = parse_robots_text(body, ua)
            for p in paths:
                ours = not any(p.startswith(pre) for pre in prefixes)
                assert ours == rp.can_fetch(ua, f"http://h.example{p}"), (
                    body, ua, p,
                )
            assert delay == rp.crawl_delay(ua)


def test_robots_table_spark(spark):
    df = spark.createDataFrame(
        [
            ("h1.example", "User-agent: *\nDisallow: /x\nDisallow: /y\nCrawl-delay: 1"),
            ("h2.example", "User-agent: *\nDisallow:"),
            ("h3.example", "User-agent: *\nCrawl-delay: 4"),
            ("h4.example", None),
        ],
        "host string, body string",
    )
    rows = {
        (r.host, r.disallow_prefix, r.crawl_delay)
        for r in robots_table(df, user_agent="secretscraper").collect()
    }
    assert rows == {
        ("h1.example", "/x", 1.0),
        ("h1.example", "/y", 1.0),
        ("h3.example", None, 4.0),  # delay-only host still reaches the dim
    }


def test_sitemap_urls_from_robots(spark):
    """RFC 9309 §2.3 Sitemap records: case-insensitive, whitespace
    tolerant, line-anchored (a mid-line or suffixed directive never
    matches), NULL bodies safe, duplicates collapsed."""
    from secretscraper_spark.plans.robotstxt import sitemap_urls_from_robots

    df = spark.createDataFrame(
        [
            ("h1.example",
             "User-agent: *\nDisallow: /x\n"
             "Sitemap: http://h1.example/a.xml\n"
             "  SITEMAP:\thttp://h1.example/b.xml\r\n"
             "Sitemap: http://h1.example/a.xml\n"      # dup collapses
             "NotSitemap: http://h1.example/no.xml\n"  # suffixed directive
             "x Sitemap: http://h1.example/no2.xml"),  # mid-line
            ("h2.example", "User-agent: *\nDisallow: /"),
            ("h3.example", None),
        ],
        "host string, body string",
    )
    rows = {(r.host, r.sitemap_url) for r in sitemap_urls_from_robots(df).collect()}
    assert rows == {
        ("h1.example", "http://h1.example/a.xml"),
        ("h1.example", "http://h1.example/b.xml"),
    }


def test_robots_from_pages_feeds_gate(spark):
    pages = spark.createDataFrame(
        [
            ("http://a.example/robots.txt", "User-agent: *\nDisallow: /secret"),
            ("http://a.example/index.html", "<html>not robots</html>"),
            ("http://b.example/robots.txt", "User-agent: *\nDisallow:"),
        ],
        "url_norm string, caption string",
    )
    dim = robots_from_pages(pages)
    got = {(r.host, r.disallow_prefix) for r in dim.collect()}
    assert got == {("a.example", "/secret")}

    frontier = spark.createDataFrame(
        [
            ("http://a.example/secret/x", "a.example", "/secret/x"),
            ("http://a.example/open", "a.example", "/open"),
            ("http://b.example/secret/x", "b.example", "/secret/x"),
        ],
        "url_norm string, netloc string, path string",
    )
    kept = {r.url_norm for r in robots_gate(frontier, dim).collect()}
    assert kept == {
        "http://a.example/open",
        "http://b.example/secret/x",  # b has no disallow
    }


def test_parse_robots_text_utf8_bom():
    from secretscraper_spark.plans.robotstxt import parse_robots_text

    # a BOM survives errors='ignore' decoding and str.strip(); it must not
    # make the whole file's rules vanish (host crawled as fully allowed)
    rules, delay = parse_robots_text("﻿User-agent: *\nDisallow: /private")
    assert rules == ["/private"]
