"""Aspect-ratio bucketing + batch packing tests (operators/imagebatch.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from secretscraper_spark.operators.imagebatch import (
    DEFAULT_BUCKETS,
    assign_ar_buckets,
    bucket_thresholds,
    pack_batches,
)


def _nearest_log_ar(w, h):
    """Brute-force reference: argmin |log(w/h) - log(r)|, ties to the
    smaller ratio."""
    lar = math.log(w / h)
    best = min(
        ((abs(lar - math.log(bw / bh)), bw / bh, bid) for bid, bw, bh in DEFAULT_BUCKETS),
    )
    return best[2], best[0]


def test_thresholds_are_sorted_geometric_means(spark):
    ths = bucket_thresholds(DEFAULT_BUCKETS)
    assert [t for t, _ in ths] == sorted(t for t, _ in ths)
    assert ths[-1][0] == math.inf
    # 9 buckets -> 8 finite boundaries + fallback
    assert len(ths) == len(DEFAULT_BUCKETS)


def test_bucket_assignment_matches_log_argmin(spark):
    dims = [
        (w, h)
        for w in range(64, 1025, 64)
        for h in range(64, 1025, 64)
    ]
    df = spark.createDataFrame(
        [(i, w, h) for i, (w, h) in enumerate(dims)],
        "image_id long, w int, h int",
    )
    got = {
        (r.w, r.h): r.bucket_id for r in assign_ar_buckets(df).collect()
    }
    checked = 0
    for w, h in dims:
        bid, _ = _nearest_log_ar(w, h)
        # skip dims that land numerically ON a boundary (float-order
        # ambiguity between sqrt-threshold and log-midpoint forms)
        lar = math.log(w / h)
        dists = sorted(
            abs(lar - math.log(bw / bh)) for _, bw, bh in DEFAULT_BUCKETS
        )
        if dists[1] - dists[0] < 1e-9:
            continue
        assert got[(w, h)] == bid, (w, h)
        checked += 1
    assert checked > 200


def test_pack_batches_shapes_and_order(spark):
    # bucket 0 (square): 10 rows; bucket 7 (2:1): 5 rows; batch_size 4
    rows = [(i, 100, 100) for i in range(10)] + [
        (100 + i, 200, 100) for i in range(5)
    ]
    df = assign_ar_buckets(
        spark.createDataFrame(rows, "image_id long, w int, h int")
    )
    out = pack_batches(df, batch_size=4).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket_id, []).append(r)
    # bucket 0: 10 -> 8 kept (2 full batches); bucket 7: 5 -> 4 kept
    assert len(by_bucket[0]) == 8 and len(by_bucket[7]) == 4
    for bucket, rs in by_bucket.items():
        rs.sort(key=lambda r: r.image_id)
        for i, r in enumerate(rs):
            assert r.batch_id == i // 4 and r.slot == i % 4
    # no cross-bucket batches
    assert {(r.bucket_id, r.batch_id, r.slot) for r in out} == {
        (b, r.batch_id, r.slot) for b, rs in by_bucket.items() for r in rs
    }


def test_pack_batches_keep_incomplete(spark):
    rows = [(i, 100, 100) for i in range(7)]
    df = assign_ar_buckets(
        spark.createDataFrame(rows, "image_id long, w int, h int")
    )
    out = sorted(
        pack_batches(df, batch_size=4, drop_incomplete=False).collect(),
        key=lambda r: r.image_id,
    )
    assert len(out) == 7
    assert [r.batch_id for r in out] == [0, 0, 0, 0, 1, 1, 1]
    assert [r.slot for r in out] == [0, 1, 2, 3, 0, 1, 2]


def test_pack_batches_empty(spark):
    df = assign_ar_buckets(
        spark.createDataFrame([], "image_id long, w int, h int")
    )
    assert pack_batches(df, batch_size=4).count() == 0
