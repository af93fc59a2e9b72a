"""Partitioned bloom filter for the URL-seen set (north rule).

The reference keeps `visited_urls` as an exact in-memory Python set
(crawler.py:115) — dead at ~10^8 URLs. The scale path:

  1. build: every seen partition hashes its url_hash values into a bitmap
     (numpy, vectorized); bitmaps OR-reduce to the driver and broadcast.
  2. probe: candidate children test membership vectorized; bloom-negative
     rows are DEFINITELY unseen → skip the expensive anti-join for them;
     bloom-positive rows go through the exact anti-join (no false drops).

At 10^10 the single broadcast bitmap becomes per-host-hash-bucket bitmaps
stored as a (bucket, bitmap) table co-partitioned with the frontier — same
two functions, keyed build/probe. Correctness never depends on the bloom:
it only routes rows between "skip join" and "exact join".
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _num_bits(capacity: int, fpp: float) -> int:
    # standard bloom sizing: m = -n ln(p) / (ln 2)^2, rounded to 8-bit words
    m = int(-capacity * np.log(fpp) / (np.log(2) ** 2))
    return max((m + 7) // 8 * 8, 64)


def _num_hashes(bits: int, capacity: int) -> int:
    return max(int(round(bits / max(capacity, 1) * np.log(2))), 1)


def _positions(hashes: np.ndarray, k: int, bits: int) -> Iterator[np.ndarray]:
    """k indexes per value via double hashing h1 + i*h2 (Kirsch-Mitzenmacher)."""
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(bits)
    h2 = (h >> np.uint64(17) | np.uint64(1)) % np.uint64(bits)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(bits)).astype(np.int64)


def build_bloom(
    seen: DataFrame, key_col: str = "url_norm",
    capacity: int = 1 << 20, fpp: float = 0.01,
) -> tuple[bytes, int, int]:
    """Distributed build: per-partition bitmaps, OR-reduced. Returns
    (bitmap bytes, bits, k)."""
    bits = _num_bits(capacity, fpp)
    k = _num_hashes(bits, capacity)
    hashed = seen.select(F.xxhash64(key_col).alias("h"))

    def to_bitmap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(bits // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            hs = pdf["h"].to_numpy(dtype=np.int64)
            for pos in _positions(hs, k, bits):
                np.bitwise_or.at(bm, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    parts = hashed.mapInPandas(to_bitmap, "bitmap binary").collect()
    out = np.zeros(bits // 8, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return out.tobytes(), bits, k


def bloom_partition(
    candidates: DataFrame, bloom: tuple[bytes, int, int],
    key_col: str = "url_norm",
) -> DataFrame:
    """Add ``bloom_positive`` column: False ⇒ definitely unseen (skip the
    anti-join), True ⇒ maybe seen (route to exact anti-join)."""
    bitmap_bytes, bits, k = bloom
    spark = candidates.sparkSession
    b = spark.sparkContext.broadcast(bitmap_bytes)

    @F.pandas_udf("boolean")
    def probe(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        bm = np.frombuffer(b.value, dtype=np.uint8)
        for hs in it:
            vals = hs.to_numpy(dtype=np.int64)
            hit = np.ones(len(vals), dtype=bool)
            for pos in _positions(vals, k, bits):
                hit &= (bm[pos // 8] & (1 << (pos % 8)).astype(np.uint8)) != 0
            yield pd.Series(hit)

    return candidates.withColumn(
        "bloom_positive", probe(F.xxhash64(key_col))
    )


def bloom_anti_join(
    candidates: DataFrame, seen: DataFrame, bloom: tuple[bytes, int, int],
    key_col: str = "url_norm",
) -> DataFrame:
    """Exact `candidates ∖ seen`, bloom-accelerated: only bloom-positive
    rows pay the join shuffle; negatives pass straight through."""
    tagged = bloom_partition(candidates, bloom, key_col)
    negatives = tagged.filter(~F.col("bloom_positive")).drop("bloom_positive")
    positives = (
        tagged.filter(F.col("bloom_positive"))
        .drop("bloom_positive")
        .join(seen.select(key_col), key_col, "left_anti")
    )
    return negatives.unionByName(positives)
