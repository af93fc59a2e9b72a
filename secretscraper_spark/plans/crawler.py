"""Spark-native BFS crawl frontier + fetch scheduler.

Re-expresses the reference's asyncio loop (crawler.py:175-217, 268-303,
336-381) as one Spark job per depth tier:

    frontier(d) ─ evade-filter ─ sort/limit(budget) ─► fetch join(pages)
        ├─► secrets UDF  ─► secrets append
        └─► links UDF ─► explode ─► edges append
                         └─► filter chain ─► anti-join(seen) ─► frontier(d+1)

Scale design (10^10 frontier / 1000 executors):
- fetch = hash join frontier⋈pages on url_hash (xxhash64 of the canonical
  url), AQE decides shuffle-hash vs sort-merge; pages bucketed by url_hash
  in a real deployment makes it a co-located join.
- seen anti-join: exact left_anti at test scale; plans/bloom.py provides
  the partitioned-bloom prefilter path (bloom positives → exact anti-join)
  so the seen set never needs to be collected.
- discovery ordering: distributed two-phase rank (plans/ranking.py), no
  single-task window.
- budget cutoff: orderBy(seq).limit(k) = TakeOrderedAndProject (per-
  partition top-k + merge, no full sort).
- per-tier localCheckpoint truncates lineage; optional parquet snapshots
  (plans/checkpoint.py) give resume-from-round.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import CrawlConfig, loaded_rules, url_finder_rules
from ..functions import purekit as pk
from ..functions.exprs import (
    domain_blacklist,
    domain_whitelist,
    filter_chain,
    host_of,
    is_dangerous_path,
    is_extend_expr,
    is_js_expr,
)
from ..functions.extract import make_links_udf, make_secrets_udf, title_udf
from ..schemas import EDGES_SCHEMA, FRONTIER_SCHEMA, SECRETS_SCHEMA, SEEN_SCHEMA
from .ranking import assign_global_seq

_FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]


@dataclass
class CrawlResult:
    nodes: DataFrame          # crawled node state (status/title/... per url_norm)
    edges: DataFrame          # (parent_norm, child_norm, kind)
    secrets: DataFrame        # (url_norm, rule_name, match)
    seen: DataFrame           # (url_norm, depth, discovery_seq)
    found: DataFrame          # distinct children ever extracted
    total_page: int = 0
    tiers: list[dict] = field(default_factory=list)  # per-round metrics/lineage


def _accept_expr(cfg: CrawlConfig):
    host = host_of(F.col("netloc"))
    return filter_chain(
        domain_whitelist(host, cfg.white_list) if cfg.white_list else F.lit(True),
        domain_blacklist(host, cfg.black_list),
    )


def seed_frontier(spark: SparkSession, seeds: list[str], cfg: CrawlConfig) -> DataFrame:
    """S1 seed source: parse, filter, dedup (keep first), seq by insertion
    order (reference facade.py:176-192 + crawler.py:180-187)."""
    rows, seen_norm, seq = [], set(), 0
    for url in dict.fromkeys(seeds):
        t6 = pk.parse6(url)
        norm = pk.unparse6(t6)
        if norm in seen_norm:
            continue
        seen_norm.add(norm)
        rows.append((norm, *t6, 0, None, seq))
        seq += 1
    df = spark.createDataFrame(rows, FRONTIER_SCHEMA)
    return df.filter(_accept_expr(cfg))


class SparkCrawler:
    """Driver-side BFS orchestration; all data-parallel work is DataFrame ops."""

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        cfg: CrawlConfig | None = None,
        use_bloom: bool = False,
    ):
        self.spark = spark
        self.cfg = cfg or CrawlConfig()
        self.use_bloom = use_bloom
        # pre-project the fetch side once; url_hash join key for cheap shuffle
        self.pages = (
            pages.select(
                "url_norm", "status", "content_type", "content_length", "caption"
            )
            .withColumn("url_hash", F.xxhash64("url_norm"))
        )
        self._secrets_udf = make_secrets_udf(loaded_rules())
        self._links_udf = make_links_udf(url_finder_rules())

    def run(self, seeds: list[str]) -> CrawlResult:
        spark, cfg = self.spark, self.cfg
        empty = lambda s: spark.createDataFrame([], s)  # noqa: E731

        frontier = seed_frontier(spark, seeds, cfg).localCheckpoint()
        seen = frontier.select("url_norm", "depth", "discovery_seq").localCheckpoint()
        nodes_acc: list[DataFrame] = []
        edges_acc: list[DataFrame] = [empty(EDGES_SCHEMA)]
        secrets_acc: list[DataFrame] = [empty(SECRETS_SCHEMA)]
        found_acc: list[DataFrame] = []
        tiers: list[dict] = []
        total_page = 0
        next_seq = frontier.count()
        depth = 0

        while True:
            if cfg.max_depth > 0 and depth > cfg.max_depth:
                break
            if cfg.max_page_num > 0 and total_page >= cfg.max_page_num:
                break
            n_frontier = frontier.count()
            if n_frontier == 0:
                break

            # F6 evade: never processed, never counted (crawler.py:272-276)
            candidates = frontier.filter(~is_dangerous_path(F.col("path"), cfg.dangerous_paths))

            # O2 budget top-k in BFS order (crawler.py:190-191, 270-271)
            if cfg.max_page_num > 0:
                remaining = cfg.max_page_num - total_page
                to_process = candidates.orderBy("discovery_seq").limit(remaining)
            else:
                to_process = candidates
            to_process = to_process.localCheckpoint()
            n_processed = to_process.count()
            total_page += n_processed

            # S2 fetch = hash join against the pages store
            fetched = (
                to_process.withColumn("url_hash", F.xxhash64("url_norm"))
                .join(self.pages, ["url_hash", "url_norm"], "inner")
                .localCheckpoint()
            )

            # P10 metadata projection + P7 title
            nodes_acc.append(
                fetched.select(
                    "url_norm", "scheme", "netloc", "path", "params", "query",
                    "fragment", "depth",
                    F.col("status").cast("string").alias("status"),
                    title_udf("caption").alias("title"),
                    F.col("content_length").cast("long").alias("content_length"),
                    "content_type",
                )
            )

            # P3 secrets — extracted from every fetched page (crawler.py:296)
            secrets_acc.append(
                fetched.select(
                    "url_norm", F.explode(self._secrets_udf("caption")).alias("s")
                ).select("url_norm", "s.rule_name", "s.match")
            )

            # P1+P2 link extraction, gated by F7 (crawler.py:343-344)
            ext = fetched.filter(is_extend_expr(F.col("content_type")))
            children = (
                ext.select(
                    F.col("url_norm").alias("parent_norm"),
                    F.col("discovery_seq").alias("parent_seq"),
                    F.explode(self._links_udf("scheme", "netloc", "caption")).alias("c"),
                )
                .select("parent_norm", "parent_seq", "c.*")
                .localCheckpoint()
            )

            # D5 edges recorded regardless of enqueue (crawler.py:364-376)
            edges_acc.append(
                children.select(
                    "parent_norm",
                    F.col("url_norm").alias("child_norm"),
                    F.when(is_js_expr(F.col("path")), "js").otherwise("url").alias("kind"),
                ).dropDuplicates(["parent_norm", "child_norm", "kind"])
            )
            found_acc.append(children.select("url_norm"))

            # D1 enqueue: depth gate F8 + filter chain + seen anti-join
            is_extending = cfg.max_depth <= 0 or depth + 1 <= cfg.max_depth
            n_new = 0
            if is_extending:
                eligible = (
                    children.filter(_accept_expr(self.cfg))
                    .groupBy("url_norm", "scheme", "netloc", "path", "params",
                             "query", "fragment")
                    .agg(F.min("parent_seq").alias("min_parent_seq"),
                         F.min("parent_norm").alias("parent_norm"))
                )
                new_nodes = eligible.join(seen, "url_norm", "left_anti")
                new_frontier = assign_global_seq(
                    new_nodes, ["min_parent_seq", "url_norm"], start=next_seq
                ).select(
                    "url_norm", "scheme", "netloc", "path", "params", "query",
                    "fragment", F.lit(depth + 1).alias("depth"),
                    "parent_norm", "discovery_seq",
                ).localCheckpoint()
                n_new = new_frontier.count()
                next_seq += n_new
                seen = seen.unionByName(
                    new_frontier.select("url_norm", "depth", "discovery_seq")
                ).localCheckpoint()
            else:
                new_frontier = empty(FRONTIER_SCHEMA)

            tiers.append(
                {
                    "depth": depth,
                    "frontier": n_frontier,
                    "processed": n_processed,
                    "enqueued": n_new,
                    "total_page": total_page,
                }
            )
            frontier = new_frontier
            depth += 1

        nodes = nodes_acc[0] if nodes_acc else empty(
            "url_norm string, scheme string, netloc string, path string, "
            "params string, query string, fragment string, depth int, "
            "status string, title string, content_length long, content_type string"
        )
        for extra in nodes_acc[1:]:
            nodes = nodes.unionByName(extra)
        edges = edges_acc[0]
        for extra in edges_acc[1:]:
            edges = edges.unionByName(extra)
        secrets = secrets_acc[0]
        for extra in secrets_acc[1:]:
            secrets = secrets.unionByName(extra)
        secrets = secrets.dropDuplicates(["url_norm", "rule_name", "match"])
        if found_acc:
            found = found_acc[0]
            for extra in found_acc[1:]:
                found = found.unionByName(extra)
            found = found.distinct()
        else:
            found = empty("url_norm string")

        return CrawlResult(
            nodes=nodes,
            edges=edges.dropDuplicates(["parent_norm", "child_norm", "kind"]),
            secrets=secrets,
            seen=seen,
            found=found,
            total_page=total_page,
            tiers=tiers,
        )
