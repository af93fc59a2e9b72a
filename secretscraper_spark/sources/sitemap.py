"""sitemap.xml source — seed discovery for the crawl frontier.

The reference seeds only from `-u`/`-f` URL lists (facade.py:176-192); a
web-scale crawler also ingests the sitemaps protocol (sitemaps.org):
``<urlset>`` documents list page URLs, ``<sitemapindex>`` documents list
child sitemaps. Both are parsed ENTIRELY in Catalyst — one
``regexp_extract_all`` + explode per body, XML entity unescape as chained
``replace`` — so sitemap ingestion is a plain scan stage, no Python.

- parse_sitemap_entries : (url, body) → (sitemap_url, loc, kind) with
  kind ∈ {'url', 'sitemap'} (entries of a urlset vs children of an
  index); loc is entity-unescaped and trimmed.
- expand_sitemap_indexes : driver-bounded recursion — resolve index
  children against the fetched-bodies table up to ``max_depth`` levels
  and return every page URL reachable; each level is one join + one
  parse stage (sitemap trees are shallow by spec: index → sitemap →
  urls).
- sitemap_seed_urls : convenience — pick ``sitemap.xml``-ish rows out of
  a pages table, expand, and return a one-column ``url`` frame that
  feeds ``SparkCrawler.run_from_urls`` directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_LOC_PATTERN = r"<loc>\s*([^<]*?)\s*</loc>"


def _xml_unescape(c: F.Column) -> F.Column:
    """The five predefined XML entities. ``&amp;`` is replaced LAST so
    double-escaped text (``&amp;lt;``) unescapes one level, not two."""
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def parse_sitemap_entries(
    bodies: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(sitemap_url, loc, kind): every ``<loc>`` of every sitemap body.
    kind is 'sitemap' when the body is a ``<sitemapindex>`` (children are
    sitemaps to fetch), 'url' otherwise (children are page URLs)."""
    body = F.coalesce(F.col(body_col), F.lit(""))
    locs = F.regexp_extract_all(body, F.lit(_LOC_PATTERN), F.lit(1))
    kind = F.when(
        body.contains("<sitemapindex"), F.lit("sitemap")
    ).otherwise(F.lit("url"))
    return (
        bodies.select(
            F.col(url_col).alias("sitemap_url"),
            kind.alias("kind"),
            F.explode(locs).alias("raw_loc"),
        )
        .select(
            "sitemap_url",
            _xml_unescape(F.col("raw_loc")).alias("loc"),
            "kind",
        )
        .filter(F.col("loc") != "")
    )


def expand_sitemap_indexes(
    roots: DataFrame,
    bodies: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
    max_depth: int = 3,
) -> DataFrame:
    """Resolve sitemap indexes transitively: starting from the *roots*
    bodies, follow 'sitemap' entries into *bodies* (the fetched store) up
    to ``max_depth`` levels and return the distinct page URLs found.

    The loop is driver-bounded (depth iterations, no data to the driver);
    each level is one semi-join against the bodies table + one parse
    stage. Missing children (listed but never fetched) are simply
    absent — fetch-and-rerun is the crawler loop's job."""
    all_bodies = bodies.select(
        F.col(url_col).alias("b_url"), F.col(body_col).alias("b_body")
    )
    frontier = roots.select(
        F.col(url_col).alias("url"), F.col(body_col).alias("body")
    )
    pages = None
    for _ in range(max_depth):
        entries = parse_sitemap_entries(frontier)
        level_pages = entries.filter(F.col("kind") == "url").select(
            F.col("loc").alias("url")
        )
        pages = level_pages if pages is None else pages.union(level_pages)
        children = entries.filter(F.col("kind") == "sitemap").select(
            F.col("loc").alias("url")
        ).distinct()
        # pin each level: the take(1) probe and the next level's parse
        # would otherwise RE-EXECUTE the whole accumulated join/parse
        # lineage once per level (O(depth^2) over the bodies scan)
        frontier = children.join(
            all_bodies, children["url"] == all_bodies["b_url"]
        ).select(
            F.col("b_url").alias("url"), F.col("b_body").alias("body")
        ).localCheckpoint()
        if not frontier.take(1):
            break
    # contract: page URLs only — max_depth=0 expands nothing
    return pages.distinct() if pages is not None else (
        frontier.select("url").limit(0)
    )


def seeds_from_robots_sitemaps(pages: DataFrame, max_depth: int = 3) -> DataFrame:
    """Robots-bootstrap seed discovery: ``/robots.txt`` rows → their
    ``Sitemap:`` records → those sitemap bodies (joined back from the
    pages store) → transitively expanded page URLs. This is the cold-start
    path of a production crawl (discover sitemaps from robots before any
    HTML fetch); sitemaps a robots file lists but the store has not
    fetched yet are simply absent — fetching them is the crawler loop's
    job, same contract as :func:`expand_sitemap_indexes`.

    All three stages are scan-pruned joins/parses: robots rows and
    sitemap rows are each rlike-filtered at the pages scan, and the
    Sitemap-record extraction is pure Catalyst
    (`plans.robotstxt.sitemap_urls_from_robots`)."""
    from secretscraper_spark.plans.robotstxt import sitemap_urls_from_robots

    robots = pages.filter(
        F.col("url_norm").rlike(r"^[a-z][a-z0-9+.-]*://[^/]+/robots\.txt$")
    ).select(
        F.regexp_extract("url_norm", r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
        .alias("host"),
        F.col("caption").alias("body"),
    )
    listed = sitemap_urls_from_robots(robots).select(
        F.col("sitemap_url").alias("url")
    )
    # join against the FULL pages store, not a name-filtered slice: the
    # robots listing is the authoritative signal and a sitemap may be
    # named anything ('feeds.xml', 'map.xml.gz') — same for index
    # children. The join itself prunes (semi-join on url identity).
    bodies = pages.select(
        F.col("url_norm").alias("url"), F.col("caption").alias("body")
    )
    roots = listed.join(bodies, "url")
    return expand_sitemap_indexes(roots, bodies, max_depth=max_depth)


def sitemap_seed_urls(pages: DataFrame, max_depth: int = 3) -> DataFrame:
    """Pages-table bridge: rows whose URL path ends in ``sitemap.xml`` /
    ``sitemap_index.xml`` are treated as sitemap ROOTS (caption holds
    the text); returns the distinct page URLs they reach — ready for
    ``SparkCrawler.run_from_urls``. The rlike filter prunes the ROOT
    scan only: index children resolve against the FULL pages store,
    because a child sitemap may be named anything ('feeds.xml') — the
    same contract :func:`seeds_from_robots_sitemaps` documents."""
    bodies = pages.select(
        F.col("url_norm").alias("url"), F.col("caption").alias("body")
    )
    maps = bodies.filter(F.col("url").rlike(r"/[^/]*sitemap[^/]*\.xml$"))
    return expand_sitemap_indexes(maps, bodies, max_depth=max_depth)


_URL_BLOCK = r"(?is)<url\b[^>]*>(.*?)</url>"
_LASTMOD_PATTERN = r"<lastmod>\s*([^<]*?)\s*</lastmod>"
_CHANGEFREQ_PATTERN = r"<changefreq>\s*([^<]*?)\s*</changefreq>"
_PRIORITY_PATTERN = r"<priority>\s*([^<]*?)\s*</priority>"


def parse_sitemap_urls_with_lastmod(
    bodies: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(sitemap_url, loc, lastmod, lastmod_ms, changefreq, priority) per
    ``<url>`` block of urlset bodies — the freshness/importance signals
    the sitemaps protocol carries and :func:`parse_sitemap_entries`
    drops. ``lastmod`` is NULL when the block has none; ``lastmod_ms`` is
    the epoch-millisecond parse (``try_to_timestamp`` under the engine's
    pinned UTC session tz — NULL on absent or unparseable values, never a
    task error), ready to compare against a fetch log for lastmod-driven
    recrawl. ``changefreq`` is the raw lowercased token (NULL when
    absent), ``priority`` the 0.0-1.0 double (NULL when absent or
    unparseable — try_cast). `plans/recrawl.merge_sitemap_hints` consumes
    all three against `recrawl_schedule`'s frame.

    Pure Catalyst: one pass extracts ``<url>`` blocks, a second pulls the
    fields per block — pairing is structural (same block), not
    positional, so a missing field can never shift onto a neighbour."""
    body = F.coalesce(F.col(body_col), F.lit(""))
    blocks = F.regexp_extract_all(body, F.lit(_URL_BLOCK), F.lit(1))
    out = bodies.select(
        F.col(url_col).alias("sitemap_url"),
        F.explode(blocks).alias("block"),
    ).select(
        "sitemap_url",
        _xml_unescape(
            F.regexp_extract("block", _LOC_PATTERN, 1)
        ).alias("loc"),
        F.nullif(
            F.regexp_extract("block", _LASTMOD_PATTERN, 1), F.lit("")
        ).alias("lastmod"),
        F.lower(
            F.nullif(
                F.regexp_extract("block", _CHANGEFREQ_PATTERN, 1), F.lit("")
            )
        ).alias("changefreq"),
        F.nullif(
            F.regexp_extract("block", _PRIORITY_PATTERN, 1), F.lit("")
        ).alias("__prio_raw"),
    ).filter(F.col("loc") != "")
    return out.select(
        "sitemap_url",
        "loc",
        "lastmod",
        F.unix_millis(F.expr("try_to_timestamp(lastmod)")).alias("lastmod_ms"),
        "changefreq",
        F.expr("try_cast(__prio_raw AS DOUBLE)").alias("priority"),
    )
