"""Freshness-aware recrawl scheduling from observed fetch history.

The reference crawls once and exits (``crawler.py``'s url_dict dies with
the process); a standing deployment re-visits URLs, and visiting
everything at the same cadence wastes the fetch budget on pages that
never change while missing fast-moving ones. This plan estimates each
URL's change rate from its own fetch history (the Cho & Garcia-Molina
incremental-crawler model: page changes as a Poisson process, rate
estimated from observed change/no-change samples) and turns it into a
next-due time + overdue priority the frontier can sort on — composing
with `plans/fetch_cache.py` (TTL within a round) and
`plans/snapdiff.py` (which supplies the per-round change observations).

Determinism contract: timestamps arrive as an integer milliseconds
column (for TIMESTAMP_NTZ data derive it timezone-free with
``timestampdiff(MILLISECOND, <anchor>, ts)`` — session-timezone casts
would shift instants and DST would bend spans), the due-gap is integer
division, and the only float columns (rate estimates) are per-row
arithmetic rounded to 6dp — no data-ordered float reductions anywhere,
so the DuckDB oracle reproduces every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MS_PER_DAY = 86_400_000


def change_stats(
    history: DataFrame,
    url_col: str = "url_norm",
    ms_col: str = "fetched_ms",
    fp_col: str = "fingerprint",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-URL change statistics from a fetch-history table: ``n_fetches``,
    ``n_changes`` (consecutive-fetch fingerprint flips, NULL-safe),
    ``first_ms``/``last_ms`` (observation span), plus two rate estimates in
    changes/day — ``rate_naive`` (X / span) and ``rate_cgm`` (the Cho &
    Garcia-Molina bias-corrected ``-ln((n - X + 0.5)/(n + 0.5))`` per mean
    sampling interval, which stays finite when every sample changed).

    Plan shape: one window (lag over ts within url) + one hash-agg — both
    keyed on the URL, so at scale this is a single hash partitioning
    reused by both stages over a history table that is naturally stored
    partitioned by url-hash. *ms_col* is an integer milliseconds column
    (epoch or anchor-relative — only differences matter). Pass
    *tiebreak_col* if (url, ms) pairs can collide (it breaks the lag
    order deterministically)."""
    # Rename BEFORE the window so the window spec and the aggregate key on
    # the same attribute — otherwise the post-window project drops the
    # original partitioning column and Spark inserts a second shuffle.
    base = history.select(
        F.col(url_col).alias("url"),
        F.col(ms_col).cast("long").alias("ms"),
        F.col(fp_col).alias("fp"),
        *([F.col(tiebreak_col).alias("tb")] if tiebreak_col else []),
    )
    order = [F.col("ms").asc()] + (
        [F.col("tb").asc()] if tiebreak_col else []
    )
    w = Window.partitionBy("url").orderBy(*order)
    prev_fp = F.lag("fp").over(w)
    flip = F.when(
        prev_fp.isNotNull() & (F.col("fp") != prev_fp), F.lit(1)
    ).otherwise(F.lit(0))
    per_fetch = base.select("url", "ms", flip.alias("flip"))
    agg = per_fetch.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches"),
        F.sum("flip").cast("long").alias("n_changes"),
        F.min("ms").alias("first_ms"),
        F.max("ms").alias("last_ms"),
    )
    span = (F.col("last_ms") - F.col("first_ms")).cast("double")
    n_samples = (F.col("n_fetches") - F.lit(1)).cast("double")
    x = F.col("n_changes").cast("double")
    rate_naive = F.when(
        span > 0, F.round(x / span * F.lit(float(MS_PER_DAY)), 6)
    ).otherwise(F.lit(None).cast("double"))
    # mean sampling interval in days; CGM: r = -ln((n - X + 0.5)/(n + 0.5)) / I
    interval_days = span / n_samples / F.lit(float(MS_PER_DAY))
    rate_cgm = F.when(
        (span > 0) & (n_samples > 0),
        F.round(
            -F.log(
                (n_samples - x + F.lit(0.5)) / (n_samples + F.lit(0.5))
            )
            / interval_days,
            6,
        ),
    ).otherwise(F.lit(None).cast("double"))
    return agg.select(
        "url",
        "n_fetches",
        "n_changes",
        "first_ms",
        "last_ms",
        rate_naive.alias("rate_naive"),
        rate_cgm.alias("rate_cgm"),
    )


def recrawl_schedule(
    stats: DataFrame,
    now_ms: int,
    min_interval_ms: int = 3_600_000,
    max_interval_ms: int = 30 * MS_PER_DAY,
) -> DataFrame:
    """Turn change stats into a fetch schedule: ``gap_ms`` (expected ms
    between changes — integer division of the observed span by the change
    count; URLs never seen changing get *max_interval_ms*), clamped to
    [min, max]; ``next_due_ms = last_ms + gap_ms``; ``overdue_ms = now -
    next_due`` (positive ⇒ fetch now). Sorting the frontier by
    ``overdue_ms`` desc is the freshness-priority dequeue — feed it to
    `graph.prioritize_frontier`'s salted sort at scale. Pure integer
    Column arithmetic on a URL-sized aggregate: map-only, no shuffle."""
    raw_gap = F.when(
        F.col("n_changes") > 0,
        F.floor(
            (F.col("last_ms") - F.col("first_ms")) / F.col("n_changes")
        ).cast("long"),
    ).otherwise(F.lit(int(max_interval_ms)))
    gap = F.least(
        F.greatest(raw_gap, F.lit(int(min_interval_ms))),
        F.lit(int(max_interval_ms)),
    )
    return stats.withColumns(
        {
            "gap_ms": gap,
            "next_due_ms": (F.col("last_ms") + gap).alias("next_due_ms"),
            "overdue_ms": (F.lit(int(now_ms)) - (F.col("last_ms") + gap)),
        }
    )
