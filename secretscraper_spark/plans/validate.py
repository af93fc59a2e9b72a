"""Validate pass (D9) — re-fetch every node with unknown status and
overwrite it (reference crawler.py:219-256; regression
tests/test_crawler_regressions.py:31-65: every unknown js child updated
exactly once).

Relational form: candidates = distinct url_norms appearing in the edge
tables (parents ∪ children, both url_dict and js_dict kinds) whose current
status is non-numeric; fetch = join vs the pages store; update =
coalesce(new, old) — the MERGE INTO shape on an Iceberg deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.exprs import is_unknown_status


def node_universe(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """All URLNodes the reports see: edge parents ∪ edge children, with
    their crawled state when they were fetched (status 'Unknown' + depth of
    first sighting otherwise — children recorded but never dequeued)."""
    urls = (
        edges.select(F.col("parent_norm").alias("url_norm"))
        .union(edges.select(F.col("child_norm").alias("url_norm")))
        .distinct()
    )
    return urls.join(nodes, "url_norm", "left").select(
        "url_norm",
        F.coalesce(F.col("status"), F.lit("Unknown")).alias("status"),
        F.coalesce(F.col("title"), F.lit("")).alias("title"),
        F.coalesce(F.col("content_length"), F.lit(-1)).alias("content_length"),
        F.coalesce(F.col("content_type"), F.lit("")).alias("content_type"),
    )


def validate_pass(
    edges: DataFrame, nodes: DataFrame, pages: DataFrame
) -> DataFrame:
    """Return the node universe with unknown statuses re-resolved against
    the pages store. Each unknown url is fetched exactly once
    (distinct before the join — the dedup the regression test checks)."""
    universe = node_universe(edges, nodes)
    unknown = universe.filter(is_unknown_status(F.col("status"))).select("url_norm")
    refetched = unknown.join(
        pages.select("url_norm", F.col("status").alias("new_status")),
        "url_norm",
        "inner",
    )
    return (
        universe.join(refetched, "url_norm", "left")
        .select(
            "url_norm",
            F.coalesce(F.col("new_status"), F.col("status")).alias("status"),
            "title", "content_length", "content_type",
        )
    )


def validate_pass_live(
    edges: DataFrame, nodes: DataFrame, page_fetch_fn
) -> DataFrame:
    """`validate_pass` for the real-HTTP mode (no pages store to join):
    unknown-status URLs are RE-FETCHED through *page_fetch_fn* — the
    reference's ``start_validate`` semantics (facade.py:95, a real
    second request per unknown URL; a fetch that fails again keeps
    'Unknown'). Arrow-batched mapInPandas, one fetch per DISTINCT
    unknown URL; unknown sets are report-sized, so this is off the hot
    path — politeness for the validation burst is the fetch fn's
    opener/timeout, as in the reference."""
    import pandas as pd

    universe = node_universe(edges, nodes)
    unknown = (
        universe.filter(is_unknown_status(F.col("status")))
        .select("url_norm")
        .distinct()
    )

    def refetch(batches):
        for pdf in batches:
            statuses = []
            for u in pdf["url_norm"]:
                page = page_fetch_fn(u)
                statuses.append(
                    None if page is None else str(page["status"])
                )
            yield pd.DataFrame(
                {"url_norm": pdf["url_norm"], "new_status": statuses}
            )

    refetched = unknown.mapInPandas(
        refetch, "url_norm string, new_status string"
    ).filter(F.col("new_status").isNotNull())
    return (
        universe.join(refetched, "url_norm", "left")
        .select(
            "url_norm",
            F.coalesce(F.col("new_status"), F.col("status")).alias("status"),
            "title", "content_length", "content_type",
        )
    )
