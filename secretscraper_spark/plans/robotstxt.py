"""robots.txt parsing — raw fetched robots bodies → the ROBOTS_SCHEMA dim
that :func:`plans.politeness.robots_gate` / ``assign_fetch_schedule``
consume.

The gate and crawl-delay override have existed since round 1, but the
robots *table* had to be hand-built; a production crawler fetches
``/robots.txt`` per host and must parse it. This module closes that loop:

- parse_robots_text : pure-python RFC 9309-lite parser for ONE body
  (group selection by longest user-agent product-token match, ``*``
  fallback; Disallow prefixes; Crawl-delay). ``Allow`` lines are out of
  scope — ROBOTS_SCHEMA's gate is prefix-Disallow-only — and are ignored,
  which errs conservative (a path both Allowed and Disallowed stays
  blocked). Validated against stdlib ``urllib.robotparser`` on
  Allow-free corpora in tests.
- robots_table      : DataFrame (host, body) → (host, disallow_prefix,
  crawl_delay) via mapInPandas. Robots bodies are one small text per
  HOST (10^6-10^7 rows for a 10^10-URL frontier — four orders below the
  page table), so the Arrow-batched python parse is far off the hot
  path; output is a broadcast-sized dim exactly like the gate expects.
- robots_from_pages : convenience filter: pick ``/robots.txt`` rows out
  of a fetched pages table and parse their captions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _agent_specificity(group_agents: list[str], user_agent: str) -> int:
    """Best match length of any agent token in the group against our
    product token: exact/prefix token match wins by token length, ``*``
    matches everything at specificity 0, no match → -1."""
    ua = user_agent.lower()
    best = -1
    for a in group_agents:
        a = a.lower()
        if a == "*":
            best = max(best, 0)
        elif ua.startswith(a):
            best = max(best, len(a))
    return best


def parse_robots_text(
    body: str, user_agent: str = "secretscraper"
) -> tuple[list[str], float | None]:
    """(disallow_prefixes, crawl_delay) for *user_agent* from one
    robots.txt body.

    RFC 9309-lite semantics: ``#`` comments stripped; consecutive
    ``User-agent`` lines open a group whose rules bind to all listed
    agents; the applicable group is the one containing the LONGEST
    matching product token (``*`` is the least-specific fallback); empty
    ``Disallow:`` means allow-all (emits nothing); ``Crawl-delay`` binds
    to its group. Unknown directives are ignored."""
    groups: list[tuple[list[str], list[str], float | None]] = []
    agents: list[str] = []
    rules: list[str] = []
    delay: float | None = None
    in_group_body = False

    def flush() -> None:
        nonlocal agents, rules, delay, in_group_body
        if agents:
            groups.append((agents, rules, delay))
        agents, rules, delay = [], [], None
        in_group_body = False

    # a UTF-8 BOM survives errors='ignore' decoding and str.strip()
    # (it's category Cf, not whitespace) — left in place it makes the
    # first 'User-agent' line unrecognizable and silently drops the
    # whole file's rules (host crawled as fully allowed)
    for raw in (body or "").lstrip("\ufeff").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                flush()
            agents.append(val)
        elif key == "disallow":
            in_group_body = True
            if val:
                rules.append(val)
        elif key == "crawl-delay":
            in_group_body = True
            try:
                delay = float(val)
            except ValueError:
                pass
        elif key == "allow":
            # out of scope for the prefix-Disallow gate; treating it as
            # opaque keeps the gate conservative
            in_group_body = True
    flush()

    best_spec = -1
    best: tuple[list[str], float | None] = ([], None)
    for g_agents, g_rules, g_delay in groups:
        spec = _agent_specificity(g_agents, user_agent)
        if spec > best_spec:
            best_spec = spec
            best = (g_rules, g_delay)
    return best if best_spec >= 0 else ([], None)


_ROBOTS_OUT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("disallow_prefix", T.StringType()),
        T.StructField("crawl_delay", T.DoubleType()),
    ]
)


def robots_table(
    bodies: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str = "secretscraper",
) -> DataFrame:
    """(host, body) → ROBOTS_SCHEMA rows. A host with no applicable
    Disallow but a Crawl-delay still emits one row (NULL prefix) so the
    delay override reaches ``assign_fetch_schedule``; fully-permissive
    hosts emit nothing — the gate's anti-join treats absence as allow."""
    src = bodies.select(
        F.col(host_col).alias("host"), F.col(body_col).alias("body")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, prefixes, delays = [], [], []
            for host, body in zip(pdf["host"], pdf["body"]):
                rules, delay = parse_robots_text(body or "", user_agent)
                for p in rules:
                    hosts.append(host)
                    prefixes.append(p)
                    delays.append(delay)
                if not rules and delay is not None:
                    hosts.append(host)
                    prefixes.append(None)
                    delays.append(delay)
            yield pd.DataFrame(
                {"host": hosts, "disallow_prefix": prefixes, "crawl_delay": delays}
            )

    return src.mapInPandas(parse, _ROBOTS_OUT)


#: RFC 9309 §2.3 "Sitemap:" non-group record. Line-anchored ((?im)),
#: explicit [ \t] whitespace class — Java's \s includes \x0B while RE2's
#: does not (the q_token_count lesson), and this pattern must mean the
#: same bytes in Spark (Java regex) and the DuckDB oracle (RE2).
_SITEMAP_LINE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^ \t\r\n]+)"


def sitemap_urls_from_robots(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, sitemap_url) for every ``Sitemap:`` record in the robots
    bodies — the bootstrap path a production crawler uses to discover a
    host's sitemaps before any page fetch (RFC 9309 §2.3 keeps these
    OUTSIDE user-agent groups, so they apply regardless of agent and can
    be extracted without group selection — pure Catalyst, no Python).
    Case-insensitive, leading-whitespace tolerant; one row per distinct
    (host, url)."""
    body = F.coalesce(F.col(body_col), F.lit(""))
    return (
        bodies.select(
            F.col(host_col).alias("host"),
            F.explode(
                F.regexp_extract_all(body, F.lit(_SITEMAP_LINE), F.lit(1))
            ).alias("sitemap_url"),
        )
        .distinct()
    )


def robots_from_pages(
    pages: DataFrame, user_agent: str = "secretscraper"
) -> DataFrame:
    """Parse the ``/robots.txt`` rows of a fetched pages table (caption
    holds the body) into the robots dim. The filter prunes at the scan;
    only robots rows ever reach python."""
    bodies = pages.filter(
        F.col("url_norm").rlike(r"^[a-z][a-z0-9+.-]*://[^/]+/robots\.txt$")
    ).select(
        F.regexp_extract("url_norm", r"^[a-z][a-z0-9+.-]*://([^/:]+)", 1)
        .alias("host"),
        F.col("caption").alias("body"),
    )
    return robots_table(bodies, user_agent=user_agent)
