"""Deterministic single-worker reference-semantics simulator.

Clean-room re-implementation of the reference crawl loop
(crawler.py:175-217 run, :268-303 process_one, :336-381
extract_links_and_extend, :384-421 fetch-as-table-lookup) used as the
golden oracle for the Spark engine's crawl ordering / URL-seen set /
edges / secrets (SURVEY.md §7 hard parts: the async reference is
intra-tier nondeterministic, so the comparable is defined as the per-tier
seen SET plus the deterministic tiebreak (depth, parent_seq, url_norm) —
this simulator realizes exactly that order with a single FIFO worker and
sorted child iteration).

Shares the purekit kernel with the Spark UDFs; the crawl LOOP bookkeeping
(visit-at-enqueue, budget-at-process, evade-before-count, record-edges-
regardless-of-enqueue) is independently re-expressed here and relationally
in plans/crawler.py — agreement between the two is what the e2e test gates.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from fnmatch import fnmatch

from .config import CrawlConfig, loaded_rules, url_finder_rules
from .functions import purekit as pk


@dataclass
class SimResult:
    # url_norm → (depth, discovery_seq): marked at ENQUEUE time (crawler.py:379)
    seen: dict[str, tuple[int, int]] = field(default_factory=dict)
    # url_norm → dict(status,title,content_length,content_type,depth)
    nodes: dict[str, dict] = field(default_factory=dict)
    edges: set[tuple[str, str, str]] = field(default_factory=set)  # parent, child, kind
    secrets: set[tuple[str, str, str]] = field(default_factory=set)  # url, rule, match
    found: set[str] = field(default_factory=set)  # found_urls (children ever extracted)
    processed: list[str] = field(default_factory=list)  # fetch order (post-evade)
    total_page: int = 0


def _accept(norm6: tuple, cfg: CrawlConfig) -> bool:
    """Filter chain F1-F3 (reference filter.py): host glob white/blacklist."""
    host, _ = pk.to_host_port(norm6[1])
    if cfg.white_list and not any(fnmatch(host, p) for p in cfg.white_list):
        return False
    if cfg.black_list and any(fnmatch(host, p) for p in cfg.black_list):
        return False
    return True


def simulate(
    site: dict[str, dict], seeds: list[str], cfg: CrawlConfig,
    robots: dict[str, list[str]] | None = None,
) -> SimResult:
    """site: url_norm → row dict with caption/status/content_type/
    content_length keys (the synthetic web). Fetch = dict lookup.
    robots: host → disallowed path prefixes (C5 north-rule gate; blocked
    URLs are dequeued but never fetched nor counted — same exclusion as
    evade, mirroring plans/crawler.py robots-then-evade order)."""
    r = SimResult()
    extractor = pk.LinkExtractor(url_finder_rules())
    secrets_rules = pk.RegexExtractor(loaded_rules(), use_groups=True)
    evade = pk.make_evade_matcher(cfg.dangerous_paths)

    queue: deque[tuple[str, tuple, int]] = deque()  # (url_norm, 6tuple, depth)
    seq = 0

    # seed enqueue (crawler.py:180-187); seed list pre-deduped (facade S1)
    for url in dict.fromkeys(seeds):
        t6 = pk.parse6(url)
        norm = pk.unparse6(t6)
        if norm in r.seen:
            continue
        if _accept(t6, cfg):
            r.seen[norm] = (0, seq)
            queue.append((norm, t6, 0))
            seq += 1

    while queue:
        if cfg.max_page_num > 0 and r.total_page >= cfg.max_page_num:
            break
        norm, t6, depth = queue.popleft()
        if cfg.max_depth > 0 and depth > cfg.max_depth:
            continue  # dequeue gate F9 (crawler.py:204)
        if robots:
            host, _ = pk.to_host_port(t6[1])
            if any(t6[2].startswith(p) for p in robots.get(host, ())):
                continue  # robots-blocked: not fetched, not counted (C5)
        if evade(t6[2]):
            continue  # evaded: not counted, not fetched (crawler.py:272-274)
        r.total_page += 1  # counted even if fetch fails (crawler.py:276-277)
        r.processed.append(norm)
        row = site.get(norm)
        if row is None:
            continue  # fetch None → no extend, status stays Unknown
        caption = row["caption"]
        r.nodes[norm] = {
            "status": str(row["status"]),
            "title": pk.extract_title(caption),
            "content_length": int(row["content_length"]),
            "content_type": row["content_type"],
            "depth": depth,
        }
        # secrets (crawler.py:305-312): set-dedup per URL
        for rule, match in set(secrets_rules.extract(caption)):
            r.secrets.add((norm, rule, match))
        # extend gate F7 (crawler.py:343-344)
        if not pk.is_extend(row["content_type"]):
            continue
        is_extending = cfg.max_depth <= 0 or depth + 1 <= cfg.max_depth
        children = extractor.extract(t6, caption)
        # deterministic tiebreak: sorted by child url_norm (SURVEY §7)
        for c6 in sorted(children, key=pk.unparse6):
            c_norm = pk.unparse6(c6)
            r.found.add(c_norm)
            kind = "js" if pk.is_js_path(c6[2]) else "url"
            r.edges.add((norm, c_norm, kind))
            # enqueue (crawler.py:378-380): seen-at-enqueue
            if c_norm not in r.seen and is_extending and _accept(c6, cfg):
                r.seen[c_norm] = (depth + 1, seq)
                queue.append((c_norm, c6, depth + 1))
                seq += 1
    return r


def site_from_pandas(pages_df) -> dict[str, dict]:
    cols = ["caption", "status", "content_type", "content_length"]
    return {
        row["url_norm"]: {c: row[c] for c in cols}
        for _, row in pages_df.iterrows()
    }
