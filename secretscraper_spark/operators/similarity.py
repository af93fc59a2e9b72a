"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — JVM-side dot product via
  F.aggregate/zip_with (no Python), TakeOrderedAndProject for the top-k.
- rp_lsh_buckets / rp_lsh_topk: random-hyperplane LSH — the scale path:
  sign-bit signatures from D deterministic hyperplanes, candidates =
  same-bucket rows (+ optional multi-probe), exact re-rank inside buckets.

At 100 TB the brute force is one full scan + partial top-k per partition
(no shuffle of the corpus); LSH cuts the scanned fraction to the probed
buckets. IVF would follow the same plan shape with k-means centroids.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_similarity(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # no rounding here: presentation layers round once (double rounding at a
    # .5 boundary would disagree with a single-round oracle)
    scored = df.select(
        F.col(id_col),
        cosine_similarity(F.col(vec_col), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def rp_signature_expr(vec_col, planes: np.ndarray):
    """Sign-bit signature from deterministic random hyperplanes → long."""
    bits = []
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(F.when(_dot(F.col(vec_col), p) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("long")


def make_planes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def rp_lsh_buckets(
    df: DataFrame, planes: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    return df.withColumn("bucket", rp_signature_expr(vec_col, planes))


def rp_lsh_topk(
    df: DataFrame, query_vec: list[float], planes: np.ndarray, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN: restrict to buckets within *probe_hamming* of the query bucket,
    exact cosine re-rank inside. Recall < 1 by design; bench reports it."""
    q = np.asarray(query_vec, dtype=np.float64)
    qsig = 0
    for i, plane in enumerate(planes):
        if float(plane @ q) >= 0:
            qsig |= 1 << i
    n = len(planes)
    probes = [qsig]
    if probe_hamming >= 1:
        probes += [qsig ^ (1 << i) for i in range(n)]
    bucketed = rp_lsh_buckets(df, planes, id_col, vec_col)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
