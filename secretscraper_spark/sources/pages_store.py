"""Bucketed pages store — the shuffle-free fetch join at 100 TB scale.

The crawler's S2 fetch in join mode is ``frontier JOIN pages ON
(url_hash, url_norm)``. While a tier fits the broadcast budget
(``CrawlConfig.broadcast_frontier_rows``) the pages side streams in
place and never shuffles. Beyond it — tiers of 10^7-10^8 rows, exactly
the regime the 10^10 north rule describes — the plain hash join
re-shuffles BOTH sides, and the pages table is the 100 TB side.

Storage-level bucketing removes that shuffle structurally, the same
trade `plans/bucketed_seen.py` makes for the seen table: persist the
pages store bucketed by a STORED ``url_hash = xxhash64(url_norm)``
column (one file per ``pmod(hash(url_hash), n)`` bucket, per-file
sorted by the join key). ``SparkCrawler`` detects a stored ``url_hash``
column and keeps it instead of recomputing, so the scan's
``HashPartitioning(url_hash)`` — a subset of the join keys — satisfies
the join's required distribution: the physical plan shows no Exchange
above the pages scan; only the (much smaller) frontier tier shuffles,
to the bucket layout. This is what an Iceberg deployment gets from a
``bucket(N, url_hash)`` partition transform + storage-partitioned join;
the builtin bucketed table is the sandbox's catalog-native equivalent.

Sizing: buckets ≈ pages_rows × row_bytes / 128 MB — ~800k buckets for
100 TB, ~256 for the sandbox's 10^8-row leg.

Catalog note: Spark reads bucket metadata from the CATALOG, not from
the files — ``spark.read.parquet(path)`` on a bucketed directory
degrades to a plain scan. A fresh session (each spark-submit leg) must
re-register the table with `register_pages_table` before reading; the
bucket file naming written by ``bucketBy`` maps file → bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the projection SparkCrawler actually joins/extracts on — the store
#: persists only these (+ url_hash); a 100 TB deployment keeps payload
#: bytes in a separate table keyed by url_hash (column pruning would
#: skip them anyway, but the store's files stay fetch-join-sized).
FETCH_COLS = ["url_norm", "status", "content_type", "content_length", "caption"]


def write_pages_bucketed(
    pages: DataFrame,
    table: str,
    path: str,
    buckets: int = 256,
    mode: str = "overwrite",
) -> None:
    """Persist the pages store bucketed + sorted by the fetch-join key.

    Adds the stored ``url_hash`` column if absent. The pre-write
    ``repartition(buckets, url_hash)`` uses the same hash family as the
    bucket spec, so each writing task holds exactly one bucket's rows →
    one file per bucket → the per-bucket ``sortBy`` order is usable by
    a sort-merge join without a task-side sort."""
    if "url_hash" not in pages.columns:
        pages = pages.withColumn("url_hash", F.xxhash64("url_norm"))
    (
        pages.repartition(buckets, F.col("url_hash"))
        .write.bucketBy(buckets, "url_hash")
        .sortBy("url_hash", "url_norm")
        .option("path", path)
        .mode(mode)
        .format("parquet")
        .saveAsTable(table)
    )


def register_pages_table(
    spark: SparkSession, table: str, path: str, buckets: int
) -> None:
    """(Re-)register an existing bucketed pages directory in this
    session's catalog. Needed because bucket metadata lives in the
    catalog: a new session (each spark-submit leg) reading the same
    files must declare the same CLUSTERED BY spec the writer used."""
    schema = spark.read.parquet(path).schema
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING PARQUET "
        f"CLUSTERED BY (url_hash) SORTED BY (url_hash, url_norm) "
        f"INTO {buckets} BUCKETS LOCATION '{path}'"
    )


def assert_no_pages_exchange(plan_df: DataFrame) -> None:
    """Raise unless *plan_df*'s physical plan (a) reads the pages side
    as a bucketed scan (``SelectedBucketsCount`` in the scan metadata)
    and (b) contains at most ONE Exchange — the frontier side's shuffle
    to the bucket layout. A second Exchange means the bucketed side was
    re-shuffled and the storage layout bought nothing."""
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    if "SelectedBucketsCount" not in plan:
        raise AssertionError(f"pages scan is not bucketed:\n{plan}")
    n_exchanges = plan.count("Exchange hashpartitioning")
    if n_exchanges > 1:
        raise AssertionError(
            f"expected <=1 Exchange (frontier side only), got {n_exchanges}:\n{plan}"
        )
