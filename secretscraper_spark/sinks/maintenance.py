"""Storage maintenance: small-file compaction for landed tables.

A crawl that lands payloads every round (``sinks/payloads.py``) and a
streaming sink that appends per micro-batch (``streaming/crawl_bridge``)
both accrete files far smaller than a scan-efficient target — the
classic small-files problem: at 100 TB a table fragmented into 10^7
sub-MB files pays file-open/footer overhead per file and floods the
driver's split planner. Iceberg ships this as the
``rewrite_data_files`` maintenance action; this module realizes the
same contract over plain parquet directories.

Driver-side work is TABLE-METADATA-sized (one file listing — exactly
what Iceberg's planner reads), never data-sized. The data itself moves
through executors once, scan → write.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Observation, SparkSession, functions as F


def _parquet_files(path: str) -> list[tuple[str, int]]:
    out = []
    for root, _, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                out.append((p, os.path.getsize(p)))
    return out


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 << 20,
    shuffle: bool = False,
) -> dict:
    """Rewrite the parquet table at *src_dir* into ``ceil(total_bytes /
    target_file_bytes)`` files at *dst_dir* and return a stats dict
    (``n_files_before/after``, ``bytes_before``, ``n_rows``).

    ``shuffle=False`` (default) compacts with ``coalesce`` — a map-only
    stitch of input splits into fewer tasks, no shuffle, the cheap path
    when input files are uniformly small (the append-sink case).
    ``shuffle=True`` round-robin ``repartition``s instead — one full
    shuffle buying bin-packed uniform outputs when input sizes are
    skewed (Iceberg's bin-pack strategy).

    The rewrite is offline-idempotent: *dst_dir* is written in one job
    (re-running overwrites whole); swap-into-place is the caller's
    rename, mirroring Iceberg's atomic snapshot commit."""
    files = _parquet_files(src_dir)
    if not files:
        raise ValueError(f"no parquet files under {src_dir!r}")
    total = sum(sz for _, sz in files)
    n_out = max(1, math.ceil(total / max(target_file_bytes, 1)))
    df = spark.read.parquet(src_dir)
    out = df.repartition(n_out) if shuffle else df.coalesce(n_out)
    # Row count observed DURING the write — a separate count() would
    # re-scan the whole compacted table, doubling the job's read volume.
    obs = Observation("compact_rows")
    out.observe(obs, F.count(F.lit(1)).alias("n_rows")).write.mode(
        "overwrite"
    ).parquet(dst_dir)
    return {
        "n_files_before": len(files),
        "n_files_after": len(_parquet_files(dst_dir)),
        "bytes_before": total,
        "n_rows": int(obs.get["n_rows"]),
    }
