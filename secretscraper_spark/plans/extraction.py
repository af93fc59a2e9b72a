"""Tier-extraction plan fragments shared VERBATIM by the batch crawler
(plans/crawler.py) and the streaming bridge (streaming/crawl_bridge.py).

The crawl's per-tier extraction (F7 gate → P1+P2 links → D5 edges;
P3 secrets) is stateless per fetched page, so the identical DataFrame
fragment runs in both execution modes — the same one-operator-two-modes
pattern as S4 local scan (SURVEY §3.2). The bridge test gates
availableNow-stream ≡ batch on these outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.exprs import is_extend_expr, is_js_expr


def secrets_of(fetched: DataFrame, secrets_udf) -> DataFrame:
    """P3: every fetched page → (url_norm, rule_name, match)
    (reference crawler.py:296, 311)."""
    return fetched.select(
        "url_norm", F.explode(secrets_udf("caption")).alias("s")
    ).select("url_norm", "s.rule_name", "s.match")


def children_of(fetched: DataFrame, links_udf) -> DataFrame:
    """F7 + P1∪P2: extendable pages → exploded child rows
    (parent_norm, parent_seq, url 6-tuple + url_norm)."""
    ext = fetched.filter(is_extend_expr(F.col("content_type")))
    return (
        ext.select(
            F.col("url_norm").alias("parent_norm"),
            F.col("discovery_seq").alias("parent_seq"),
            F.explode(links_udf("scheme", "netloc", "caption")).alias("c"),
        )
        .select("parent_norm", "parent_seq", "c.*")
    )


def edges_of(children: DataFrame) -> DataFrame:
    """D5: child rows → (parent_norm, child_norm, kind) with the F11 js
    classifier (reference crawler.py:364-376)."""
    return children.select(
        "parent_norm",
        F.col("url_norm").alias("child_norm"),
        F.when(is_js_expr(F.col("path")), "js").otherwise("url").alias("kind"),
    )
