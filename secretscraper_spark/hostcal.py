"""Host-capacity calibration probe shared by bench.py and the scale-leg
jobs (submit/crawl_job.py).

This shared VM degrades 3-10x in multi-minute windows (BASELINE.md
variance disclosure), and regex work is additionally memory-bandwidth-
sensitive, so a flat spin loop would under-report the contention. The
probe runs the ACTUAL pure-Python extraction kernel in n concurrent
plain processes (no Spark, no JVM) and reports per-process MB/s — the
reader separates host from engine by comparing a run's throughput with
the host capacity measured seconds before/after it, with no massaging of
the measured numbers. Recorded next to every scaling leg and (round 5,
verdict item 6) next to the decade legs, so variance classes like the
104 s vs 233 s enqueue_rank swing on identical code+digests are
attributable from the artifact alone.
"""

from __future__ import annotations

import time


def _kernel_probe(_):
    """1.5 s of the pure-Python extraction kernel (links + secrets over a
    fixed synthetic caption)."""
    from secretscraper_spark.config import loaded_rules, url_finder_rules
    from secretscraper_spark.functions.purekit import LinkExtractor, get_extractor

    text = (
        "See http://h3.test/path/a.js and <a href='/rel/x'>x</a> "
        "token=abcd1234efgh5678 mail me@example.test lorem ipsum dolor "
    ) * 120  # ~14 KB
    links = LinkExtractor(url_finder_rules())
    secrets = get_extractor(loaded_rules())
    base6 = ("http", "h0.test", "/", "", "", "")
    t0 = time.perf_counter()
    done = 0
    while time.perf_counter() - t0 < 1.5:
        links.extract(base6, text)
        secrets.extract(text)
        done += len(text)
    return done / (time.perf_counter() - t0)


def host_calibration(n_procs: int) -> float:
    """Per-process MB/s the host delivers to n concurrent kernel
    processes right now."""
    import multiprocessing as mp

    with mp.Pool(n_procs) as p:
        res = p.map(_kernel_probe, range(n_procs))
    return round(sum(res) / n_procs / 1e6, 2)
