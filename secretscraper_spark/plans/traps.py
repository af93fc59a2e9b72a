"""Crawler-trap detection — URL-pattern explosions under a path prefix.

At a 10^10-URL frontier the classic failure is not skew but TRAPS:
calendar pages, faceted-search permutations, session-id paths — one host
prefix emitting unbounded distinct URLs whose content is near-constant.
The reference (single-host, depth-bounded BFS: crawler.py max_depth /
max_page_num) never needs this; a web-scale frontier does, or the budget
drains into one site. This module profiles the frontier/pages table per
``(host, path-prefix)`` and flags two trap signatures:

- ``dup_trap``      — many URLs, few distinct contents (session ids,
  tracking params): ``n_urls >= max_urls`` and ``dup_ratio >= min_dup``.
- ``explosion``     — raw URL-count blowout regardless of content
  (calendars generate DISTINCT pages forever): ``n_urls >= explosion_cap``.

Plan shape (100 TB): one projection (host/prefix are regexp + split +
slice over the url string — no UDF), one shuffle on ``(host, prefix)``
with two count-distincts (Spark's two-phase distinct aggregate keeps the
partials map-side). Output is prefix-cardinality-sized — a broadcastable
dim the enqueue step can LEFT ANTI against, exactly like the robots gate.

Content identity uses ``md5(content)`` so the same profile is computable
by any engine (the DuckDB oracle included); distinct-count of the digest
equals distinct-count of the content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/]+)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/]+(/.*)$"


def _prefix_expr(url: F.Column, prefix_depth: int) -> F.Column:
    """First *prefix_depth* path segments, query/fragment stripped — for
    trap purposes ``/p?page=1`` and ``/p?page=2`` are the SAME explosion,
    so the query must never split the group. Shared by profile and prune
    so both sides always bucket identically."""
    path = F.element_at(
        F.split(F.regexp_extract(url, _PATH_RE, 1), "[?#]", 2), 1
    )
    return F.array_join(F.slice(F.split(path, "/"), 2, prefix_depth), "/")


def url_prefix_profile(
    pages: DataFrame,
    prefix_depth: int = 2,
    url_col: str = "url_norm",
    content_col: str = "caption",
) -> DataFrame:
    """(host, prefix, n_urls, n_content, dup_ratio) per path prefix.

    ``prefix`` is the first *prefix_depth* path segments joined with
    ``/``, query/fragment stripped (see :func:`_prefix_expr` — pagination
    values must group together, not split the bucket). ``dup_ratio``
    = 1 - n_content/n_urls, rounded to 6 (0 when every URL is unique
    content, → 1 when one content repeats)."""
    url = F.col(url_col)
    return (
        pages.select(
            F.regexp_extract(url, _HOST_RE, 1).alias("host"),
            _prefix_expr(url, prefix_depth).alias("prefix"),
            url.alias("u"),
            F.md5(F.coalesce(F.col(content_col), F.lit(""))).alias("c"),
        )
        .groupBy("host", "prefix")
        .agg(
            F.count_distinct("u").alias("n_urls"),
            F.count_distinct("c").alias("n_content"),
        )
        .select(
            "host",
            "prefix",
            "n_urls",
            "n_content",
            F.round(
                F.lit(1.0) - F.col("n_content") / F.col("n_urls"), 6
            ).alias("dup_ratio"),
        )
    )


def prune_trapped(
    frontier: DataFrame,
    traps: DataFrame,
    prefix_depth: int = 2,
    url_col: str = "url_norm",
) -> DataFrame:
    """Drop frontier rows whose (host, prefix) is in the *traps* dim —
    the enqueue-side consumer of :func:`trap_candidates`. The trap dim is
    prefix-cardinality-sized, so the join broadcasts; the frontier (the
    big side) never shuffles. *prefix_depth* must match the one the
    profile was built with. Returns the frontier columns unchanged."""
    url = F.col(url_col)
    tagged = frontier.withColumns(
        {
            "_trap_host": F.regexp_extract(url, _HOST_RE, 1),
            "_trap_prefix": _prefix_expr(url, prefix_depth),
        }
    )
    dim = F.broadcast(
        traps.select(
            F.col("host").alias("_trap_host"),
            F.col("prefix").alias("_trap_prefix"),
        ).distinct()
    )
    return tagged.join(dim, ["_trap_host", "_trap_prefix"], "left_anti").drop(
        "_trap_host", "_trap_prefix"
    )


def trap_candidates(
    profile: DataFrame,
    max_urls: int = 1000,
    min_dup: float = 0.9,
    explosion_cap: int = 100_000,
) -> DataFrame:
    """Add the two trap flags to a :func:`url_prefix_profile` and keep
    only flagged prefixes — the dim the enqueue step anti-joins against."""
    dup_trap = (F.col("n_urls") >= max_urls) & (F.col("dup_ratio") >= min_dup)
    explosion = F.col("n_urls") >= explosion_cap
    return (
        profile.select(
            "*",
            dup_trap.alias("dup_trap"),
            explosion.alias("explosion"),
        )
        .filter(F.col("dup_trap") | F.col("explosion"))
    )


def url_explosions(
    urls: DataFrame,
    cap: int,
    prefix_depth: int = 2,
    url_col: str = "url_norm",
) -> DataFrame:
    """(host, prefix) groups holding >= *cap* distinct URLs — the
    content-free trap signal a LIVE crawl can compute from its seen set
    alone (captions never persist in the crawler's state by design, so
    the dup-content signal is offline-only; URL-count explosion is the
    in-loop gate). One count-distinct aggregate, output is the dim
    :func:`prune_trapped` consumes."""
    url = F.col(url_col)
    return (
        urls.select(
            F.regexp_extract(url, _HOST_RE, 1).alias("host"),
            _prefix_expr(url, prefix_depth).alias("prefix"),
            url.alias("u"),
        )
        .groupBy("host", "prefix")
        .agg(F.count_distinct("u").alias("n_urls"))
        .filter(F.col("n_urls") >= cap)
        .select("host", "prefix")
    )
