"""Snapshot / resume / lineage (north rule: resumable from checkpoint with
per-partition lineage + metrics).

Each crawl round appends parquet snapshots under
    <dir>/round=<d>/{frontier,seen,nodes,edges,secrets}/
plus a manifest.json holding the driver-side loop state (depth, totals,
next_seq, per-round metrics incl. per-partition row counts).

Resume-from-round-k deterministically REWRITES rounds k+1.. (the engine is
replay-deterministic); DataFrame handles from a previous run that point at
those rounds become stale — materialize results before resuming, exactly
as an Iceberg deployment would pin the prior snapshot id. On an Iceberg
deployment these directories are table snapshots and the manifest is the
snapshot-id ↔ round mapping (SURVEY §4 custom #5); plain parquet + JSON
realizes the same contract in this sandbox.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST = "manifest.json"
TABLES = (
    "frontier", "seen", "nodes", "edges", "secrets", "host_fails",
    "host_delays",
)


@dataclass
class CrawlState:
    depth: int
    total_page: int
    next_seq: int
    finished: bool = False
    tiers: list[dict] = field(default_factory=list)


def _round_dir(base: str, depth: int) -> str:
    return os.path.join(base, f"round={depth}")


def partition_lineage(df: DataFrame) -> list[dict]:
    """Per-partition row counts — the lineage record for one snapshot."""
    rows = (
        df.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().orderBy("pid").collect()
    )
    return [{"pid": int(r["pid"]), "rows": int(r["count"])} for r in rows]


def write_round(
    base: str, state: CrawlState, tables: dict[str, DataFrame]
) -> dict[str, list[dict]]:
    """Snapshot one round; returns per-table partition lineage."""
    lineage: dict[str, list[dict]] = {}
    rd = _round_dir(base, state.depth)
    for name, df in tables.items():
        path = os.path.join(rd, name)
        df.write.mode("overwrite").parquet(path)
        lineage[name] = partition_lineage(df.sparkSession.read.parquet(path))
    manifest = {"state": asdict(state), "lineage": lineage}
    tmp = os.path.join(rd, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(rd, MANIFEST))  # atomic commit of the round
    # top-level pointer: last fully-committed round
    with open(os.path.join(base, MANIFEST + ".tmp"), "w") as f:
        json.dump({"last_round": state.depth}, f)
    os.replace(os.path.join(base, MANIFEST + ".tmp"), os.path.join(base, MANIFEST))
    return lineage


def latest_round(base: str) -> int | None:
    p = os.path.join(base, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["last_round"])


def read_round(
    spark: SparkSession, base: str, depth: int
) -> tuple[CrawlState, dict[str, DataFrame]]:
    rd = _round_dir(base, depth)
    with open(os.path.join(rd, MANIFEST)) as f:
        manifest = json.load(f)
    state = CrawlState(**manifest["state"])
    tables = {
        name: spark.read.parquet(os.path.join(rd, name))
        for name in TABLES
        if os.path.exists(os.path.join(rd, name))
    }
    return state, tables
