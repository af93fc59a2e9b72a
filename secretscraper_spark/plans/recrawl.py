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


#: sitemaps-protocol <changefreq> tokens → expected ms between changes.
#: 'always' maps to 0 (clamped up to min_interval by the merge); 'never'
#: maps to NULL → the observed gap stands alone.
CHANGEFREQ_MS: dict[str, int] = {
    "always": 0,
    "hourly": 3_600_000,
    "daily": MS_PER_DAY,
    "weekly": 7 * MS_PER_DAY,
    "monthly": 30 * MS_PER_DAY,
    "yearly": 365 * MS_PER_DAY,
}


def merge_sitemap_hints(
    schedule: DataFrame,
    hints: DataFrame,
    now_ms: int,
    min_interval_ms: int = 3_600_000,
    max_interval_ms: int = 30 * MS_PER_DAY,
) -> DataFrame:
    """Fold sitemap ``<changefreq>/<priority>/<lastmod>`` hints into a
    :func:`recrawl_schedule` frame → the schedule columns recomputed plus
    ``known_changed`` and ``hint_priority``.

    - ``changefreq`` maps through :data:`CHANGEFREQ_MS`, clamps to
      [min, max], and the EFFECTIVE gap is ``least(observed, hinted)`` —
      the site's own hint can tighten the revisit but never lets a
      fast-changing page (observed) coast on a lazy 'monthly' claim;
      unknown tokens and 'never' leave the observed gap alone.
    - ``known_changed`` = the sitemap's lastmod postdates our last fetch:
      the page is KNOWN stale regardless of schedule — the
      freshness-priority dequeue sorts it first.
    - ``hint_priority`` = the protocol's 0.0-1.0 weight (default 0.5 per
      the spec) — the tiebreak within equal overdue.

    Duplicate locs (a URL listed in several sitemaps) pre-aggregate to
    the freshest lastmod / tightest changefreq / highest priority, so the
    left join stays 1:1 against the URL-sized schedule. Pure Column
    arithmetic + one host-free hash join — no new shuffle shape beyond
    the join itself; sort consumers feed `graph.prioritize_frontier`."""
    freq_ms = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in CHANGEFREQ_MS.items() for x in kv]
        ),
        F.col("changefreq"),
    ).cast("long")
    h = (
        hints.select(
            F.col("loc").alias("url"),
            "lastmod_ms",
            freq_ms.alias("__freq_ms"),
            F.col("priority").alias("__prio"),
        )
        .groupBy("url")
        .agg(
            F.max("lastmod_ms").alias("hint_lastmod_ms"),
            F.min("__freq_ms").alias("hint_freq_ms"),
            F.max("__prio").alias("hint_priority"),
        )
    )
    m = schedule.join(h, "url", "left")
    hinted = F.when(
        F.col("hint_freq_ms").isNotNull(),
        F.least(
            F.greatest(F.col("hint_freq_ms"), F.lit(int(min_interval_ms))),
            F.lit(int(max_interval_ms)),
        ),
    )
    eff_gap = F.least(F.col("gap_ms"), F.coalesce(hinted, F.col("gap_ms")))
    next_due = F.col("last_ms") + eff_gap
    return m.select(
        *[c for c in schedule.columns if c not in ("gap_ms", "next_due_ms", "overdue_ms")],
        eff_gap.alias("gap_ms"),
        next_due.alias("next_due_ms"),
        (F.lit(int(now_ms)) - next_due).alias("overdue_ms"),
        F.coalesce(
            F.col("hint_lastmod_ms") > F.col("last_ms"), F.lit(False)
        ).alias("known_changed"),
        F.coalesce("hint_priority", F.lit(0.5)).alias("hint_priority"),
    )


def _consec_fail_rollup(
    attempts: DataFrame,
    key: F.Column,
    key_name: str,
    ts_col: str,
    ok_col: str,
) -> DataFrame:
    """Shared kernel of :func:`retry_backoff` and :func:`host_quarantine`:
    per *key*, the consecutive-failure run since the last success plus
    last-attempt/last-success times — ``(key_name, last_attempt_ms,
    last_ok_ms, n_consec_fails)``.

    Descending scan: rows before the first success (newest-first) have
    ``seen_ok = 0`` — exactly the run we want to count. ``ok`` desc as
    tiebreak: a success and a failure at the SAME timestamp order
    success-first, so the tied failure counts as before-the-success (the
    run resets) — without it the ROWS frame's tie order is
    partition-dependent, violating the module's determinism contract
    (the oracles carry the same tiebreak). The window and the groupBy
    share the key's hash partitioning — ONE shuffle of the attempt
    log."""
    ts = F.col(ts_col)
    ok = F.col(ok_col).cast("int")
    base = attempts.select(
        key.alias(key_name), ts.alias("ts_ms"), ok.alias("ok_i")
    )
    w = (
        Window.partitionBy(key_name)
        .orderBy(F.desc("ts_ms"), F.desc("ok_i"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = base.withColumn("seen_ok", F.max("ok_i").over(w))
    return marked.groupBy(key_name).agg(
        F.max("ts_ms").alias("last_attempt_ms"),
        F.max(F.when(F.col("ok_i") == 1, F.col("ts_ms"))).alias("last_ok_ms"),
        F.sum(
            F.when((F.col("seen_ok") == 0) & (F.col("ok_i") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_consec_fails"),
    )


def retry_backoff(
    attempts: DataFrame,
    base_ms: int = 60_000,
    max_exp: int = 10,
    max_retries: int = 8,
    url_col: str = "url_norm",
    ts_col: str = "ts_ms",
    ok_col: str = "ok",
) -> DataFrame:
    """Exponential-backoff retry schedule from a fetch-attempt log — the
    failure-side twin of :func:`recrawl_schedule` (which handles pages
    that FETCH fine but change; this handles pages that DON'T fetch:
    timeouts, 5xx, connection resets — the reference maps all of these to
    status 'Unknown' via its exception arms, `crawler.py:384-421`, and
    simply never retries because it crawls once and exits).

    Per URL: ``n_fails`` = consecutive failures since the last success
    (successes reset the clock), ``next_due_ms`` = last attempt +
    ``base_ms << min(n_fails-1, max_exp)`` (integer shift, no float
    POWER — the module's determinism contract), ``dead`` once
    ``n_fails >= max_retries`` (next_due_ms NULL: route to a dead-letter
    table, stop burning budget). URLs whose latest attempt succeeded get
    ``n_fails = 0`` and no due time (the freshness scheduler owns them).

    Plan shape: one window over (url, ts desc) marks the
    failures-after-last-success run; the groupBy that follows reuses the
    window's hash partitioning, so the whole op is ONE shuffle of the
    attempt log. Attempt logs are append-only and time-partitioned in
    storage — at 10^10 scale prune the scan to the retention horizon
    before calling this."""
    per_url = _consec_fail_rollup(
        attempts, F.col(url_col), "url_norm", ts_col, ok_col
    ).withColumnRenamed("n_consec_fails", "n_fails")
    # SQL form: the DataFrame shiftleft() only takes a literal bit count
    backoff = F.expr(
        f"shiftleft(CAST({int(base_ms)} AS BIGINT), "
        f"CAST(least(n_fails - 1, {int(max_exp)}) AS INT))"
    )
    dead = F.col("n_fails") >= max_retries
    return per_url.withColumns(
        {
            "dead": dead,
            "next_due_ms": F.when(
                (F.col("n_fails") > 0) & ~dead,
                F.col("last_attempt_ms") + backoff,
            ),
        }
    )


def host_quarantine(
    attempts: DataFrame,
    fail_threshold: int = 5,
    cooldown_ms: int = 600_000,
    url_col: str = "url_norm",
    ts_col: str = "ts_ms",
    ok_col: str = "ok",
) -> DataFrame:
    """Host-level circuit breaker over the same attempt log
    :func:`retry_backoff` consumes — the missing third tier: per-URL
    retry handles one flaky page, but when a whole HOST is down (DNS
    dead, origin 503ing, our IP blocked) every URL on it fails
    independently and the per-URL backoffs still let the frontier keep
    hammering it. The reference never needs this (one host, crawl-once,
    its exception arms just mark pages 'Unknown' — `crawler.py:384-421`);
    a polite web-scale crawler must stop scheduling a failing host
    entirely and probe it again only after a cooldown.

    Per host (parsed from the URL): ``n_consec_fails`` = failures since
    the host's last success ANYWHERE on it (ordered by attempt time;
    same desc-scan trick and same success-first tie rule as
    :func:`retry_backoff`), ``quarantined`` once the run reaches
    *fail_threshold*, and ``release_ms = last_attempt + cooldown`` (when
    quarantined — after it, the scheduler readmits the host with a probe
    budget of 1). Output is host-cardinality — a broadcastable dim the
    enqueue step LEFT ANTIs against, exactly like the robots and trap
    gates.

    Plan shape: the host projection is map-only; the rollup is the same
    single-shuffle kernel as :func:`retry_backoff`
    (:func:`_consec_fail_rollup`). The host key matches what the
    crawler's gates anti-join on — authority (one shared decomposition,
    `operators/urlnorm.URL_PARTS_PATTERN`) with userinfo stripped and
    the port split off via the reference's `host_of` rule — so
    ``http://h/…``, ``http://h:80/…`` and ``http://u@h/…`` all charge
    the SAME breaker and the dim actually matches at the gate."""
    from ..functions.exprs import host_of
    from ..operators.urlnorm import URL_PARTS_PATTERN

    auth = F.regexp_replace(
        F.regexp_extract(F.col(url_col), URL_PARTS_PATTERN, 2),
        r"^[^/@]*@",
        "",
    )
    per_host = _consec_fail_rollup(
        attempts, host_of(auth), "host", ts_col, ok_col
    )
    quarantined = F.col("n_consec_fails") >= int(fail_threshold)
    return per_host.withColumns(
        {
            "quarantined": quarantined,
            "release_ms": F.when(
                quarantined, F.col("last_attempt_ms") + int(cooldown_ms)
            ),
        }
    )
