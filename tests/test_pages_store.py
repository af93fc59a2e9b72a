"""Bucketed pages store (sources/pages_store.py): fetch-join parity
with the plain path, exchange-free bucketed scan past the broadcast
regime, catalog re-registration, and the crawler keeping a stored
url_hash instead of recomputing it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from secretscraper_spark.config import CrawlConfig
from secretscraper_spark.plans.crawler import SparkCrawler
from secretscraper_spark.sources.pages_store import (
    FETCH_COLS,
    assert_no_pages_exchange,
    register_pages_table,
    write_pages_bucketed,
)
from secretscraper_spark.sources.sitegen import generate_pages_pandas, seeds_for


@pytest.fixture()
def no_broadcast(spark):
    # a 100 TB pages side is never broadcastable and a 10^8-row tier
    # exceeds the frontier broadcast budget; match that regime so the
    # join exercises the bucketed non-broadcast path
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _site(spark, n=400):
    return spark.createDataFrame(generate_pages_pandas(n, n_hosts=4))


def _crawl_outputs(res):
    seen = sorted(
        (r.url_norm, r.depth, r.discovery_seq) for r in res.seen.collect()
    )
    edges = sorted(
        (r.parent_norm, r.child_norm, r.kind) for r in res.edges.collect()
    )
    secrets = sorted(
        (r.url_norm, r.rule_name, r.match) for r in res.secrets.collect()
    )
    return seen, edges, secrets, res.total_page


def test_bucketed_store_crawl_matches_plain(spark, tmp_path):
    """Full BFS crawl over the bucketed store ≡ over the raw pages table,
    bit for bit (seen incl. order, edges, secrets, total_page)."""
    pages = _site(spark)
    write_pages_bucketed(
        pages.select(*FETCH_COLS), "pages_b1", str(tmp_path / "p1"), buckets=8
    )
    cfg = CrawlConfig(max_depth=2)
    want = _crawl_outputs(SparkCrawler(spark, pages, cfg).run(seeds_for(4)))
    got = _crawl_outputs(
        SparkCrawler(spark, spark.table("pages_b1"), cfg).run(seeds_for(4))
    )
    assert got == want
    assert want[3] > 0  # the comparison is not vacuous


def test_fetch_join_no_pages_exchange(spark, tmp_path, no_broadcast):
    """Past the broadcast-frontier regime the fetch join must scan the
    bucketed pages side IN PLACE: SelectedBucketsCount in the scan,
    at most one Exchange (the frontier side's shuffle)."""
    pages = _site(spark)
    write_pages_bucketed(
        pages.select(*FETCH_COLS), "pages_b2", str(tmp_path / "p2"), buckets=8
    )
    cfg = CrawlConfig(max_depth=2, broadcast_frontier_rows=0)
    crawler = SparkCrawler(spark, spark.table("pages_b2"), cfg)
    to_process = pages.select("url_norm").limit(50).withColumn(
        "depth", F.lit(0)
    )
    joined = crawler._do_fetch(to_process, tier_rows=10**9)
    assert_no_pages_exchange(joined)
    # and the join actually matches rows
    assert joined.count() == 50


def test_plain_path_still_recomputes_hash(spark):
    """A pages table WITHOUT a stored url_hash keeps the old behavior:
    the crawler derives url_hash = xxhash64(url_norm) itself."""
    pages = _site(spark, n=50)
    crawler = SparkCrawler(spark, pages, CrawlConfig(max_depth=1))
    row = (
        crawler.pages.filter(F.col("url_norm").isNotNull())
        .select(
            "url_hash", F.xxhash64("url_norm").alias("expect")
        )
        .first()
    )
    assert row.url_hash == row.expect


def test_register_pages_table_fresh_catalog(spark, tmp_path):
    """register_pages_table re-creates the catalog entry over existing
    bucket files (what each spark-submit leg does) and the re-registered
    table still joins exchange-free."""
    pages = _site(spark)
    path = str(tmp_path / "p3")
    write_pages_bucketed(
        pages.select(*FETCH_COLS), "pages_b3", path, buckets=8
    )
    spark.sql("DROP TABLE pages_b3")  # simulate a fresh session's catalog
    register_pages_table(spark, "pages_b3", path, buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cfg = CrawlConfig(max_depth=1, broadcast_frontier_rows=0)
        crawler = SparkCrawler(spark, spark.table("pages_b3"), cfg)
        to_process = pages.select("url_norm").limit(20)
        joined = crawler._do_fetch(to_process, tier_rows=10**9)
        assert_no_pages_exchange(joined)
        assert joined.count() == 20
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
