"""North-rule landing gate: fetched payloads land in the image+caption
table (input_hint shape) and EVERY landed row passes caption equality +
decoded-pixel PSNR≥40 + phash recompute against ground truth."""

from __future__ import annotations

import pytest

from secretscraper_spark.config import CrawlConfig
from secretscraper_spark.plans.crawler import SparkCrawler
from secretscraper_spark.sinks.payloads import (
    PAYLOAD_COLS,
    land_payloads,
    landing_invariant,
)
from secretscraper_spark.sources.sitegen import (
    SEED,
    generate_pages_pandas,
    seeds_for,
)

N_PAGES, N_HOSTS = 120, 4


@pytest.fixture(scope="module")
def store(spark):
    pdf = generate_pages_pandas(N_PAGES, N_HOSTS, include_images=True)
    return spark.createDataFrame(pdf).localCheckpoint()


def test_crawl_lands_payloads(spark, store, tmp_path):
    cfg = CrawlConfig(max_depth=1, max_page_num=0)
    res = SparkCrawler(spark, store, cfg).run(seeds_for(N_HOSTS))
    out = str(tmp_path / "landing")
    landed = land_payloads(res.nodes, store, out, mode="overwrite")

    # input_hint shape, one row per fetched page (nodes = fetched set;
    # processed-but-absent urls never fetch, so nodes is the right count)
    n_fetched = res.nodes.select("url_norm").distinct().count()
    assert set(PAYLOAD_COLS) <= {f.name for f in landed.schema.fields}
    assert landed.count() == n_fetched
    assert dict(landed.dtypes)["bytes"] == "binary"
    assert dict(landed.dtypes)["phash"] == "bigint"

    # per-row acceptance: caption equality + pixel/phash invariant
    inv = landing_invariant(landed, store, seed_base=SEED)
    rows = inv.collect()
    assert len(rows) == n_fetched
    bad = [r for r in rows if not (r.caption_ok and r.pixels_ok and r.phash_ok)]
    assert bad == []


def test_landing_appends_across_rounds(spark, store, tmp_path):
    """Two crawl rounds append into the same table (the Iceberg-append
    contract) without duplicating within a round."""
    out = str(tmp_path / "landing2")
    cfg = CrawlConfig(max_depth=1, max_page_num=0)
    r1 = SparkCrawler(spark, store, cfg).run(seeds_for(N_HOSTS)[:2])
    landed1 = land_payloads(r1.nodes, store, out)
    n1 = landed1.count()
    assert n1 == r1.nodes.select("url_norm").distinct().count()
    r2 = SparkCrawler(spark, store, cfg).run(seeds_for(N_HOSTS)[2:])
    landed2 = land_payloads(r2.nodes, store, out)
    n2 = r2.nodes.select("url_norm").distinct().count()
    assert landed2.count() == n1 + n2


def test_stream_landing_matches_batch(spark, store, tmp_path):
    """foreachBatch landing over two micro-batches == the one-shot batch
    landing for the same fetched URL set (modulo the batch_id dir col)."""
    from secretscraper_spark.streaming.crawl_bridge import stream_land_payloads

    urls = sorted(r.url_norm for r in store.select("url_norm").limit(6).collect())
    fdir = tmp_path / "fetched"
    spark.createDataFrame([(u,) for u in urls[:3]], "url_norm string").coalesce(
        1
    ).write.mode("append").parquet(str(fdir))
    spark.createDataFrame([(u,) for u in urls[3:]], "url_norm string").coalesce(
        1
    ).write.mode("append").parquet(str(fdir))

    st = (
        spark.readStream.schema("url_norm string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(fdir))
    )
    q = stream_land_payloads(
        st, store, str(tmp_path / "land"), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(600), "stream landing did not finish"

    landed = spark.read.parquet(str(tmp_path / "land"))
    assert "batch_id" in landed.columns and landed.select("batch_id").distinct().count() >= 2

    batch = land_payloads(
        spark.createDataFrame([(u,) for u in urls], "url_norm string"),
        store,
        str(tmp_path / "bland"),
        mode="overwrite",
    )
    key = lambda df: {
        (r.url_norm, r.image_id, r.caption, bytes(r.bytes)) for r in df.collect()
    }
    assert key(landed) == key(batch)
