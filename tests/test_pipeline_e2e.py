"""Full-pipeline integration: crawl → payload landing → image+caption
curation funnel → sequence packing, verified against an independent
pandas recomputation of every stage and for determinism under rerun and
repartition. This is the composed path a training-data release runs:
each stage is unit/oracle-gated elsewhere; here the CONTRACTS BETWEEN
stages are what's under test."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Window, functions as F

from secretscraper_spark.config import CrawlConfig
from secretscraper_spark.operators.chunking import pack_sequences
from secretscraper_spark.operators.curation import funnel_counts
from secretscraper_spark.operators.multimodal import filter_images
from secretscraper_spark.plans.crawler import SparkCrawler
from secretscraper_spark.sinks.payloads import land_payloads
from secretscraper_spark.sources.sitegen import (
    generate_pages_pandas,
    seeds_for,
)

N_PAGES, N_HOSTS = 150, 5
MIN_CAP_TOKS = 3


@pytest.fixture(scope="module")
def landed(spark, tmp_path_factory):
    store = spark.createDataFrame(
        generate_pages_pandas(N_PAGES, N_HOSTS, include_images=True)
    ).localCheckpoint()
    cfg = CrawlConfig(max_depth=2, max_page_num=0)
    res = SparkCrawler(spark, store, cfg).run(seeds_for(N_HOSTS))
    out = str(tmp_path_factory.mktemp("pipe") / "landing")
    return land_payloads(res.nodes, store, out, mode="overwrite")


def _curated(landed):
    """Gates → funnel frame: image metadata gates, caption token floor,
    phash-bucket canonical (the q_image_funnel stages over REAL landed
    payloads instead of a synthesized table)."""
    fi = filter_images(landed, min_bytes_per_pixel=0.0).select(
        "image_id", "keep"
    )
    n_toks = F.size(
        F.filter(F.split(F.col("caption"), r"[ \t\n\r\f]+"),
                 lambda x: x != "")
    )
    return (
        landed.join(fi, "image_id")
        .withColumn("n_cap_toks", n_toks)
        .withColumn(
            "first_id", F.min("image_id").over(Window.partitionBy("phash"))
        )
    )


def _stages():
    return [
        ("image_gates", F.col("keep")),
        ("caption_tokens", F.col("n_cap_toks") >= MIN_CAP_TOKS),
        ("phash_canonical", F.col("image_id") == F.col("first_id")),
    ]


def test_funnel_matches_pandas_recomputation(landed):
    j = _curated(landed)
    got = {
        r["stage"]: (r["n_in"], r["n_kept"])
        for r in funnel_counts(j, _stages()).collect()
    }

    # independent recomputation: pandas over the landed table, gates
    # re-derived from first principles (not via the operator module)
    pdf = landed.toPandas()
    w, h = pdf["w"].astype(float), pdf["h"].astype(float)
    bpp_bytes = pdf["bytes"].map(lambda b: len(b) if b is not None else 0)
    keep = (
        (w * h >= 4096)
        & ((w / h).combine((h / w), max) <= 4.0)
        & (bpp_bytes / (w * h) >= 0.0)
        & pdf["caption"].notna()
        & (pdf["caption"].str.strip().str.len() >= 5)
    )
    toks = pdf["caption"].fillna("").map(
        lambda c: len([t for t in re.split(r"[ \t\n\r\f]+", c) if t])
    )
    c1 = keep & (toks >= MIN_CAP_TOKS)
    first = pdf.groupby("phash")["image_id"].transform("min")
    c2 = c1 & (pdf["image_id"] == first)
    n = len(pdf)
    assert got["image_gates"] == (n, int(keep.sum()))
    assert got["caption_tokens"] == (int(keep.sum()), int(c1.sum()))
    assert got["phash_canonical"] == (int(c1.sum()), int(c2.sum()))
    # the funnel must do real work: no stage may be the identity
    assert n > got["image_gates"][1] >= got["caption_tokens"][1] > 0


def test_pack_over_curated_is_deterministic(landed):
    j = _curated(landed)
    kept = (
        j.filter(
            F.col("keep")
            & (F.col("n_cap_toks") >= MIN_CAP_TOKS)
            & (F.col("image_id") == F.col("first_id"))
        )
        .select(
            F.col("image_id").alias("doc_id"),
            F.col("caption").alias("text"),
            F.substring("image_id", 1, 6).alias("source"),
        )
    )
    packed = pack_sequences(kept, seq_len=64)
    rows = sorted(
        (r["group"], r["doc_id"], r["n_tokens"], r["pack_id"], r["pack_offset"])
        for r in packed.collect()
    )
    assert rows, "curated set must be non-empty"
    # every doc packed exactly once
    assert len({(g, d) for g, d, *_ in rows}) == len(rows)
    # exact prefix-sum packing law, recomputed independently per group:
    # pack_id = floor(excl_prefix / L), offset = excl_prefix % L (docs
    # straddling a boundary belong to the pack they START in)
    by_group: dict = {}
    for g, d, n, p, off in rows:
        by_group.setdefault(g, []).append((d, n, p, off))
    for docs in by_group.values():
        docs.sort()
        cum = 0
        for _, n, p, off in docs:
            assert (p, off) == (cum // 64, cum % 64)
            cum += n
    # rerun + repartition produce bit-identical packing
    again = sorted(
        (r["group"], r["doc_id"], r["n_tokens"], r["pack_id"], r["pack_offset"])
        for r in pack_sequences(kept.repartition(7), seq_len=64).collect()
    )
    assert again == rows
