"""Freshness-aware recrawl scheduling tests (plans/recrawl.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from secretscraper_spark.plans.recrawl import (
    MS_PER_DAY,
    change_stats,
    recrawl_schedule,
)


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "url_norm string, fetched_ms long, fingerprint string"
    )


def test_change_stats_counts_flips(spark):
    # u1: a a b b a -> flips at idx2 (a->b) and idx4 (b->a) = 2 changes
    # u2: single fetch -> no span, NULL rates
    rows = [
        ("u1", 0, "a"),
        ("u1", MS_PER_DAY, "a"),
        ("u1", 2 * MS_PER_DAY, "b"),
        ("u1", 3 * MS_PER_DAY, "b"),
        ("u1", 4 * MS_PER_DAY, "a"),
        ("u2", 7 * MS_PER_DAY, "z"),
    ]
    out = {r.url: r for r in change_stats(_hist(spark, rows)).collect()}
    u1, u2 = out["u1"], out["u2"]
    assert (u1.n_fetches, u1.n_changes) == (5, 2)
    assert (u1.first_ms, u1.last_ms) == (0, 4 * MS_PER_DAY)
    # naive: 2 changes over 4 days = 0.5/day
    assert u1.rate_naive == 0.5
    # CGM with n=4 samples, X=2: -ln(2.5/4.5) per 1-day interval
    assert u1.rate_cgm == round(-math.log(2.5 / 4.5), 6)
    assert (u2.n_fetches, u2.n_changes) == (1, 0)
    assert u2.rate_naive is None and u2.rate_cgm is None


def test_change_stats_null_fingerprint_is_no_change(spark):
    # NULL fp: comparison with NULL is not a flip on either side
    rows = [("u", 0, "a"), ("u", 1, None), ("u", 2, "a"), ("u", 3, "b")]
    r = change_stats(_hist(spark, rows)).collect()[0]
    assert r.n_changes == 1  # only a->b at the end


def test_change_stats_cgm_finite_when_all_change(spark):
    # every sample changed: naive estimator would be biased; CGM's +0.5
    # smoothing keeps it finite
    rows = [("u", i * MS_PER_DAY, str(i)) for i in range(4)]
    r = change_stats(_hist(spark, rows)).collect()[0]
    assert r.n_changes == 3
    assert r.rate_cgm is not None and math.isfinite(r.rate_cgm)
    assert r.rate_cgm == round(-math.log(0.5 / 3.5), 6)


def test_change_stats_tiebreak_column(spark):
    # (url, ms) collision: tiebreak orders b-then-c deterministically by seq
    df = spark.createDataFrame(
        [("u", 0, "a", 0), ("u", 5, "b", 1), ("u", 5, "c", 2)],
        "url_norm string, fetched_ms long, fingerprint string, seq int",
    )
    r = change_stats(df, tiebreak_col="seq").collect()[0]
    assert r.n_changes == 2  # a->b, b->c


def test_recrawl_schedule_clamps_and_prioritizes(spark):
    rows = (
        # fast: changes every hour-ish -> gap clamps UP to min_interval
        [("fast", i * 60_000, str(i)) for i in range(10)]
        # slow: never changed -> gap = max_interval
        + [("slow", i * MS_PER_DAY, "x") for i in range(3)]
        # mid: one change over 10 days -> gap = 10 days
        + [("mid", 0, "a"), ("mid", 10 * MS_PER_DAY, "b")]
    )
    stats = change_stats(_hist(spark, rows))
    now = 40 * MS_PER_DAY
    sched = {r.url: r for r in recrawl_schedule(stats, now_ms=now).collect()}
    assert sched["fast"].gap_ms == 3_600_000  # clamped to min
    assert sched["slow"].gap_ms == 30 * MS_PER_DAY  # never-changed default
    assert sched["mid"].gap_ms == 10 * MS_PER_DAY
    for r in sched.values():
        assert r.next_due_ms == r.last_ms + r.gap_ms
        assert r.overdue_ms == now - r.next_due_ms
    # overdue ordering: fast (due ~day 0) most overdue, then mid (due day
    # 20), then slow (due day 32)
    order = sorted(sched.values(), key=lambda r: -r.overdue_ms)
    assert [r.url for r in order] == ["fast", "mid", "slow"]


def test_schedule_is_map_only(spark):
    # the schedule adds pure Column arithmetic — no exchange beyond the
    # stats agg itself
    stats = change_stats(
        _hist(spark, [("u", 0, "a"), ("u", MS_PER_DAY, "b")])
    )
    plan = (
        recrawl_schedule(stats, now_ms=10 * MS_PER_DAY)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == stats._jdf.queryExecution().executedPlan().toString().count("Exchange")


def test_retry_backoff_semantics(spark):
    """Consecutive-failure counting resets at success; backoff doubles
    with the run length (integer shift); dead URLs lose their due time;
    latest-success URLs have no due time."""
    from secretscraper_spark.plans.recrawl import retry_backoff

    rows = [
        # u1: ok, fail, fail -> 2 fails since ok, due = 3000 + 60000<<1
        ("u1", 1000, True), ("u1", 2000, False), ("u1", 3000, False),
        # u2: fail, ok -> latest ok resets: 0 fails, no due
        ("u2", 1000, False), ("u2", 2000, True),
        # u3: never ok, 3 fails -> dead at max_retries=3, due NULL
        ("u3", 1000, False), ("u3", 2000, False), ("u3", 3000, False),
        # u4: single fail -> 1 fail, due = 1000 + 60000
        ("u4", 1000, False),
        # u5: success and failure at the SAME ts -> tiebreak orders the
        # success later (run resets): 0 fails, no due
        ("u5", 1000, False), ("u5", 2000, True), ("u5", 2000, False),
    ]
    df = spark.createDataFrame(rows, "url_norm string, ts_ms long, ok boolean")
    got = {
        r.url_norm: (r.n_fails, r.last_ok_ms, r.dead, r.next_due_ms)
        for r in retry_backoff(df, base_ms=60_000, max_retries=3).collect()
    }
    assert got == {
        "u1": (2, 1000, False, 3000 + (60_000 << 1)),
        "u2": (0, 2000, False, None),
        "u3": (3, None, True, None),
        "u4": (1, None, False, 1000 + 60_000),
        "u5": (0, 2000, False, None),
    }


def test_retry_backoff_one_shuffle(spark):
    """The groupBy reuses the window's hash partitioning: exactly one
    Exchange in the whole plan."""
    from secretscraper_spark.plans.recrawl import retry_backoff

    df = spark.createDataFrame(
        [("u", 1, True)], "url_norm string, ts_ms long, ok boolean"
    )
    plan = retry_backoff(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def _attempts(spark, rows):
    return spark.createDataFrame(rows, "url_norm string, ts_ms long, ok boolean")


def test_host_quarantine_counts_and_gates(spark):
    from secretscraper_spark.plans.recrawl import host_quarantine

    rows = [
        # down.example: success then 3 straight failures across TWO urls
        ("http://down.example/a", 100, True),
        ("http://down.example/a", 200, False),
        ("http://down.example/b", 300, False),
        ("http://down.example/a", 400, False),
        # up.example: failures then a success -> run resets to 0
        ("http://up.example/x", 100, False),
        ("http://up.example/x", 200, False),
        ("http://up.example/y", 300, True),
        # never.example: never succeeded, 2 failures
        ("http://never.example/z", 50, False),
        ("http://never.example/z", 60, False),
    ]
    out = {
        r.host: r
        for r in host_quarantine(
            _attempts(spark, rows), fail_threshold=3, cooldown_ms=1000
        ).collect()
    }
    down = out["down.example"]
    assert (down.n_consec_fails, down.quarantined) == (3, True)
    assert (down.last_attempt_ms, down.last_ok_ms) == (400, 100)
    assert down.release_ms == 1400
    up = out["up.example"]
    assert (up.n_consec_fails, up.quarantined, up.release_ms) == (0, False, None)
    never = out["never.example"]
    assert (never.n_consec_fails, never.quarantined) == (2, False)
    assert never.last_ok_ms is None


def test_host_quarantine_same_ts_success_wins(spark):
    from secretscraper_spark.plans.recrawl import host_quarantine

    # a success and a failure at the SAME timestamp: the success orders
    # first in the desc scan, so the tied failure counts as before it —
    # same determinism tiebreak as retry_backoff
    rows = [
        ("http://t.example/a", 100, False),
        ("http://t.example/b", 100, True),
    ]
    r = host_quarantine(_attempts(spark, rows), fail_threshold=1).collect()[0]
    assert (r.n_consec_fails, r.quarantined) == (0, False)
