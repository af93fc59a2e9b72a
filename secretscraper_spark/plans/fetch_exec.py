"""Per-host paced fetch executor — the physical realization of C1/C2.

The reference paces with an asyncio semaphore (≤5 concurrent per domain,
rate_limiter.py:55-64) and a per-domain min interval (rate_limiter.py:74-80).
Here the frontier is grouped by host (`applyInPandas`, one group per host —
the shuffle co-locates a host's URLs on one executor) and each group is
issued in slot order from the deterministic schedule
(plans/politeness.py:assign_fetch_schedule):

    slot k  = rows k*C .. k*C+C-1 of the host in BFS order
    t(k)    = k × effective_interval(host)

``virtual=True`` (sandbox/tests/bench) never sleeps — the output just
records when each fetch *would* be issued, so tests are deterministic and
makespan math is exact. ``virtual=False`` sleeps each slot into place and
calls ``fetch_fn(url) -> (status, body)`` for real I/O — the only mode
difference is the clock; ordering and grouping are identical.

Skew note: a host's schedule is inherently serial (the rate budget IS the
floor, SURVEY §4), so one pathological host bounds tier makespan no matter
how many executors exist; the salted sort (politeness.salted_priority_sort)
spreads the *shuffle*, never the budget.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..config import CrawlConfig
from .politeness import assign_fetch_schedule


def _issue_host(
    pdf: pd.DataFrame, virtual: bool, n_workers: int, call: Callable
) -> list[tuple]:
    """Issue one host's rows in slot-major BFS order.

    virtual=True: no clock, strictly serial — deterministic for tests.
    virtual=False: sleep each row to its scheduled ``virtual_start`` then
    issue through a ``n_workers``-wide thread pool, so the
    max_concurrent_per_domain-way concurrency the schedule budgets for is
    actually used (the reference's asyncio semaphore model,
    rate_limiter.py:55-64) instead of over-enforcing serially. ``call(row)``
    returns the result tuple-tail; issue_order is the submission order."""
    pdf = pdf.sort_values(["slot", "discovery_seq"], kind="mergesort")
    rows_iter = list(pdf.itertuples(index=False))
    if virtual:
        return [
            (r.url_norm, r.host, int(r.slot), float(r.virtual_start), order)
            + call(r)
            for order, r in enumerate(rows_iter)
        ]
    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=max(n_workers, 1)) as pool:
        futures = []
        for order, r in enumerate(rows_iter):
            delay = r.virtual_start - (time.monotonic() - t0)
            if delay > 0:
                time.sleep(delay)
            futures.append(
                (order, r, pool.submit(call, r))
            )
        return [
            (r.url_norm, r.host, int(r.slot), float(r.virtual_start), order)
            + fut.result()
            for order, r, fut in futures
        ]

FETCH_RESULT_FIELDS = [
    T.StructField("url_norm", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("slot", T.LongType()),
    T.StructField("virtual_start", T.DoubleType()),
    T.StructField("issue_order", T.IntegerType()),
    T.StructField("status", T.StringType()),
]

# full-page variant: the fetch function returns the page body too (HTTP GET
# in a live deployment; a store lookup in the sandbox). latency_ms is the
# wall-clock duration of the fetch call itself — the observed-latency
# input of AIMD politeness adaptation (politeness.adapt_crawl_delay); a
# sandbox store lookup measures ~0, far under any backoff cap, so it
# never perturbs deterministic tests.
PAGE_FETCH_FIELDS = FETCH_RESULT_FIELDS + [
    T.StructField("content_type", T.StringType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("caption", T.StringType()),
    T.StructField("fetched", T.BooleanType()),
    T.StructField("latency_ms", T.DoubleType()),
]


def paced_fetch(
    frontier: DataFrame,
    cfg: CrawlConfig,
    robots: DataFrame | None = None,
    fetch_fn: Callable[[str], str] | None = None,
    virtual: bool = True,
) -> DataFrame:
    """Issue one tier's fetches host-by-host under the politeness budget.

    Returns (url_norm, host, slot, virtual_start, issue_order, status):
    ``issue_order`` is the 0-based position the URL was issued at within its
    host — always slot-major BFS order, in both clock modes.
    """
    scheduled = assign_fetch_schedule(frontier, cfg, robots)
    out_schema = T.StructType(FETCH_RESULT_FIELDS)

    def call(r) -> tuple:
        return (fetch_fn(r.url_norm) if fetch_fn else "Unknown",)

    def run_host(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = _issue_host(pdf, virtual, cfg.max_concurrent_per_domain, call)
        return pd.DataFrame(rows, columns=[f.name for f in FETCH_RESULT_FIELDS])

    return scheduled.groupBy("host").applyInPandas(run_host, out_schema)


def paced_fetch_pages(
    frontier: DataFrame,
    cfg: CrawlConfig,
    page_fetch_fn: Callable[[str], dict | None],
    robots: DataFrame | None = None,
    virtual: bool = True,
) -> DataFrame:
    """Like paced_fetch, but the fetch function returns the page itself:
    ``page_fetch_fn(url) -> {status, content_type, content_length, caption}
    | None`` (None = fetch failure → fetched=False, status stays Unknown,
    reference crawler.py:277 semantics). This is the real-network fetch
    vehicle — HTTP GET per URL, paced per host; the sandbox backs it with
    a page-store lookup (SparkCrawler fetch_mode='paced')."""
    scheduled = assign_fetch_schedule(frontier, cfg, robots)
    out_schema = T.StructType(PAGE_FETCH_FIELDS)

    def call(r) -> tuple:
        t0 = time.perf_counter()
        page = page_fetch_fn(r.url_norm)
        ms = round((time.perf_counter() - t0) * 1000.0, 3)
        if page is None:
            return ("Unknown", None, None, None, False, ms)
        return (str(page["status"]), page["content_type"],
                int(page["content_length"]), page["caption"], True, ms)

    def run_host(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = _issue_host(pdf, virtual, cfg.max_concurrent_per_domain, call)
        return pd.DataFrame(rows, columns=[f.name for f in PAGE_FETCH_FIELDS])

    return scheduled.groupBy("host").applyInPandas(run_host, out_schema)
