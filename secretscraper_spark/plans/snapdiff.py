"""Crawl-snapshot diff — what changed between two crawls of the same
scope.

The reference is one-shot (crawler.py's url_dict dies with the process);
a standing deployment re-crawls on a schedule and needs the delta:
which URLs appeared, vanished, changed status, or changed content. One
full-outer join on the URL key, classification as a pure Column
expression — no UDF, one shuffle (or zero if both snapshots are
bucketed/partitioned on the key, which a production store should be).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CHANGES = ("added", "removed", "status_changed", "content_changed", "unchanged")


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url_norm",
    status_col: str = "status",
    fingerprint_col: str | None = "content_length",
) -> DataFrame:
    """(url_norm, change, old_status, new_status) for every URL in either
    snapshot. ``change`` precedence: added/removed (presence), then
    status_changed, then content_changed (*fingerprint_col* inequality —
    pass a content hash column for a real deployment; NULL-safe), else
    unchanged. ``fingerprint_col=None`` skips content comparison."""
    o = old.select(
        F.col(key_col).alias("k"),
        F.lit(True).alias("in_old"),
        F.col(status_col).alias("old_status"),
        *([F.col(fingerprint_col).alias("old_fp")] if fingerprint_col else []),
    )
    n = new.select(
        F.col(key_col).alias("k"),
        F.lit(True).alias("in_new"),
        F.col(status_col).alias("new_status"),
        *([F.col(fingerprint_col).alias("new_fp")] if fingerprint_col else []),
    )
    j = o.join(n, "k", "full_outer")
    # presence flags, not status IS NULL — a crawled row may legitimately
    # carry a NULL status (fetch error) and must not read as added/removed
    change = (
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_status").eqNullSafe(F.col("new_status")),
            F.lit("status_changed"),
        )
    )
    if fingerprint_col:
        change = change.when(
            ~F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("content_changed")
        )
    change = change.otherwise(F.lit("unchanged"))
    return j.select(
        F.col("k").alias(key_col),
        change.alias("change"),
        "old_status",
        "new_status",
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """(change, n) rollup of a :func:`crawl_diff` — the re-crawl
    scheduler's churn signal (one partial-agg groupBy)."""
    return diff.groupBy("change").agg(F.count(F.lit(1)).alias("n"))
