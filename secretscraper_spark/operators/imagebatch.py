"""Aspect-ratio bucketing + deterministic training-batch packing.

Multimodal training (SDXL-style) groups images into aspect-ratio buckets
and builds fixed-size batches WITHIN a bucket so every batch can be
resized to one shape without distortion. Over the image+caption input
table (``w``/``h`` int columns — see `schemas.py`) this needs two
operators the reference never had (it crawls, this trains):

* `assign_ar_buckets` — nearest bucket in log-aspect-ratio space.
  Instead of computing ``ln(w/h)`` per row and arg-minning over the
  bucket list (9 transcendental calls per row, and cross-engine libm
  drift in the oracle), the bucket boundaries are precomputed once in
  Python as the GEOMETRIC MEANS of adjacent bucket ratios — nearest in
  log space ⇔ first threshold exceeding ``w/h`` — so the row-side work
  is one IEEE division plus a literal-threshold CASE chain:
  whole-stage-codegen, bit-deterministic across engines, map-only.

* `pack_batches` — within each bucket, rows in deterministic
  ``order_cols`` order fill ``batch_size``-image batches. A window
  partitioned by bucket would collapse to #buckets tasks (≈9) at any
  scale; instead this composes `plans/ranking.assign_global_seq`
  (two-phase distributed rank over ``(bucket, *order_cols)``) with a
  buckets-sized broadcast dim of per-bucket start offsets — each
  bucket's rows are contiguous in the global sequence, so the local
  index is one subtraction. Fully parallel at 10^10 rows.

Determinism contract: bucket choice is threshold-vs-literal double
comparison (ties at a boundary go to the smaller-ratio bucket);
packing is pure integer arithmetic on the rank — the DuckDB oracle
reproduces every value bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

# (bucket_id, width_ratio, height_ratio) — SD-style bucket family
DEFAULT_BUCKETS: list[tuple[int, int, int]] = [
    (0, 1, 1),
    (1, 4, 3),
    (2, 3, 4),
    (3, 16, 9),
    (4, 9, 16),
    (5, 3, 2),
    (6, 2, 3),
    (7, 2, 1),
    (8, 1, 2),
]


def bucket_thresholds(
    buckets: list[tuple[int, int, int]],
) -> list[tuple[float, int]]:
    """Decision thresholds for nearest-in-log-AR assignment: buckets
    sorted by ratio, each paired with the geometric-mean boundary to its
    successor — ``w/h < sqrt(r_i * r_{i+1})`` ⇔ log-closer to ``r_i``.
    Returns ``[(threshold, bucket_id), ...]`` ascending; the last bucket
    is the CASE fallback (no upper threshold)."""
    items = sorted((bw / bh, bid) for bid, bw, bh in buckets)
    ratios = [r for r, _ in items]
    if len(set(ratios)) != len(ratios):
        raise ValueError("duplicate aspect ratios in bucket list")
    out = []
    for (r1, id1), (r2, _) in zip(items, items[1:]):
        out.append((math.sqrt(r1 * r2), id1))
    out.append((math.inf, items[-1][1]))
    return out


def ar_bucket_expr(
    buckets: list[tuple[int, int, int]] = DEFAULT_BUCKETS,
    w_col: str = "w",
    h_col: str = "h",
) -> Column:
    """Nearest-log-AR bucket id as a pure Column expression (one
    division + literal-threshold when-chain, first match wins)."""
    ar = F.col(w_col).cast("double") / F.col(h_col).cast("double")
    ths = bucket_thresholds(buckets)
    chain: Column | None = None
    for t, bid in ths[:-1]:
        cond = ar < F.lit(t)
        chain = F.when(cond, F.lit(bid)) if chain is None else chain.when(
            cond, F.lit(bid)
        )
    last = F.lit(ths[-1][1])
    return last if chain is None else chain.otherwise(last)


def assign_ar_buckets(
    images: DataFrame,
    buckets: list[tuple[int, int, int]] = DEFAULT_BUCKETS,
    w_col: str = "w",
    h_col: str = "h",
    out_col: str = "bucket_id",
) -> DataFrame:
    """Map-only bucket assignment over the image table."""
    return images.withColumn(out_col, ar_bucket_expr(buckets, w_col, h_col))


def pack_batches(
    images: DataFrame,
    batch_size: int,
    bucket_col: str = "bucket_id",
    order_cols: tuple[str, ...] = ("image_id",),
    drop_incomplete: bool = True,
    batch_col: str = "batch_id",
    slot_col: str = "slot",
) -> DataFrame:
    """Deterministic per-bucket batch packing: ``batch_col`` = the row's
    batch index within its bucket, ``slot_col`` = its position in the
    batch (0..batch_size-1), rows taken in *order_cols* order. With
    *drop_incomplete*, each bucket's trailing partial batch is dropped
    (training wants full batches; the remainder rolls into the next
    ingest). Plan: two-phase global rank over ``(bucket, *order_cols)``
    + a broadcast join against the buckets-sized offset dim — no
    bucket-keyed window, no single-task stage."""
    from secretscraper_spark.plans.ranking import assign_global_seq

    seq = assign_global_seq(
        images, [bucket_col, *order_cols], seq_col="__seq"
    )
    starts = seq.groupBy(bucket_col).agg(
        F.min("__seq").alias("__start"),
        F.count(F.lit(1)).alias("__n"),
    )
    joined = seq.join(F.broadcast(starts), bucket_col)
    local = F.col("__seq") - F.col("__start")
    out = joined.withColumn(
        batch_col, F.floor(local / F.lit(batch_size)).cast("long")
    ).withColumn(slot_col, (local % F.lit(batch_size)).cast("long"))
    if drop_incomplete:
        keep = local < (F.col("__n") - F.col("__n") % F.lit(batch_size))
        out = out.filter(keep)
    return out.drop("__seq", "__start", "__n")
