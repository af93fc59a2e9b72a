"""Fetched-payload landing — the image+caption table append.

North rule: "fetched payloads land in the image+caption Iceberg table"
with the input_hint columns ``(image_id, bytes, w, h, fmt, caption,
phash)`` and the per-row invariant "decoded-pixel allclose (PSNR≥40 for
lossy) + caption equality".

The crawl loop itself never moves image bytes: ``SparkCrawler`` projects
the pages store down to the metadata+caption columns before the fetch
join, so the wide binary column is not dragged through every tier shuffle.
Landing instead happens once per run: the fetched URL set (small — one
row per crawled page) joins back against the full store and the payload
rows stream straight into the sink — bytes move exactly once, scan →
write. On an Iceberg deployment this is an append producing one snapshot
per crawl round; plain parquet realizes the contract here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# the driver-mandated landing shape (BASELINE.json input_hint), plus the
# url key so rows remain joinable to crawl state
PAYLOAD_COLS = [
    "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "url_norm",
]


def land_payloads(
    fetched_urls: DataFrame, pages_store: DataFrame, out_dir: str,
    mode: str = "append", partitions: int | None = None,
) -> DataFrame:
    """Append the fetched pages' payload rows to the landing table at
    *out_dir* and return the landed DataFrame (re-read from storage).

    *fetched_urls*: any DataFrame with a ``url_norm`` column (e.g.
    ``CrawlResult.nodes``). The fetched set broadcasts while small; at
    10^8+ fetched rows AQE flips the join to shuffle-hash and the store
    side still moves straight into the sink without a second pass.
    """
    keys = fetched_urls.select("url_norm").distinct()
    landed = pages_store.join(keys, "url_norm", "left_semi").select(*PAYLOAD_COLS)
    if partitions:
        landed = landed.repartition(partitions, F.xxhash64("image_id"))
    landed.write.mode(mode).parquet(out_dir)
    return fetched_urls.sparkSession.read.parquet(out_dir)


def landing_invariant(
    landed: DataFrame, pages_store: DataFrame, seed_base: int,
    min_psnr_db: float = 40.0,
) -> DataFrame:
    """The per-row acceptance gate over a landed table: caption equality
    against the store plus the decoded-pixel PSNR/phash invariant
    (operators/multimodal.verify_pixels). Returns one row per landed
    image with ``caption_ok`` / ``pixels_ok`` / ``phash_ok`` — a landing
    is accepted iff every row passes."""
    from ..operators.multimodal import verify_pixels

    cap = landed.alias("l").join(
        pages_store.select(
            "image_id", F.col("caption").alias("store_caption")
        ).alias("s"),
        "image_id",
    ).select(
        "image_id",
        (F.col("caption") == F.col("store_caption")).alias("caption_ok"),
    )
    pix = verify_pixels(landed, seed_base, min_psnr_db).select(
        "image_id", "pixels_ok", "phash_ok"
    )
    return cap.join(pix, "image_id")
