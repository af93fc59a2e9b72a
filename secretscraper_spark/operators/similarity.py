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


def cosine_neardup_pairs(
    df: DataFrame, threshold: float = 0.4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_bands: int = 8, band_bits: int = 8, seed: int = 7,
    max_bucket: int | None = 20_000, planes=None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (vec_a < vec_b, cosine ≥ t) via
    banded random-hyperplane LSH — the scale-safe DEFAULT.

    Candidates = pairs sharing a (band, band-signature) bucket in ANY of
    *n_bands* bands of *band_bits* sign bits each; candidates are
    dedup'd, then exact-cosine verified against *threshold*. The plan is
    an equi-join keyed on (band, band_sig) — shuffle O(candidates),
    NEVER a CartesianProduct (plan-asserted in tests) — so it survives a
    corpus the crossJoin variant cannot. Recall < 1 by LSH design (a
    pair found by no band is missed; miss probability per true pair is
    ∏ bands (1 − p^band_bits) with p = 1 − θ/π), rising toward 1 as
    *threshold* → 1; ``cosine_neardup_pairs_exact`` is the quadratic
    oracle-exact variant for verification scale.

    ``band_bits=0`` degenerates every row into ONE shared bucket: the
    candidate set is provably all pairs, making the output exactly the
    all-pairs answer through the SAME join machinery (used by the
    oracle-gated q_embedding_neardup entry) — still no CartesianProduct,
    but one hot bucket, so verification scale only.

    ``max_bucket`` drops hotter buckets (a near-constant embedding
    region would otherwise quadratically explode one key — same skew
    cap contract as minhash_near_dups); None disables.
    """
    if band_bits <= 0 or n_bands <= 0:
        # constant-0 signature DERIVED FROM THE ROW: a literal would be
        # constant-folded out of the join condition and Catalyst would
        # plan the degenerate mode as a CartesianProduct — pmod(hash, 1)
        # is provably 0 yet non-foldable, keeping the equi-join shape
        bands = df.select(
            F.col(id_col),
            F.lit(0).alias("band"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(1)).alias("band_sig"),
        )
    else:
        if planes is None:
            dim = df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
            planes = make_planes(int(dim), n_bands * band_bits, seed)
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                rp_signature_expr(
                    vec_col, planes[b * band_bits:(b + 1) * band_bits]
                ).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
        bands = df.select(
            F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
        ).select(id_col, F.col("bb.band").alias("band"),
                 F.col("bb.band_sig").alias("band_sig"))
    if max_bucket is not None and band_bits > 0 and n_bands > 0:
        hot = (
            bands.groupBy("band", "band_sig")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > int(max_bucket))
            .select("band", "band_sig")
        )
        bands = bands.join(
            F.broadcast(hot), ["band", "band_sig"], "left_anti"
        )
    a = bands.select(F.col(id_col).alias("vec_a"), "band", "band_sig")
    b = bands.select(F.col(id_col).alias("vec_b"), "band", "band_sig")
    cand = (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    vb = df.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def cosine_neardup_pairs_exact(
    df: DataFrame, threshold: float = 0.4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    max_rows: int = 100_000,
) -> DataFrame:
    """Exact all-pairs embedding-cosine near-dups — an explicit O(n²)
    crossJoin, guarded by *max_rows*: verification-scale ONLY (recall
    baselines, oracle cross-checks). Production corpora go through the
    banded ``cosine_neardup_pairs``; the guard turns a would-be
    cluster-killer into a loud error."""
    n = df.limit(int(max_rows) + 1).count()
    if n > max_rows:
        raise ValueError(
            f"cosine_neardup_pairs_exact is O(n^2); input exceeds "
            f"max_rows={max_rows}. Use cosine_neardup_pairs (banded LSH "
            f"candidates + exact verify) at scale."
        )
    a = df.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
        (_norm(F.col(vec_col))).alias("na"),
    )
    b = df.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
        (_norm(F.col(vec_col))).alias("nb"),
    )
    pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return pairs.select("vec_a", "vec_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


# --- IVF (inverted-file) ANN -------------------------------------------------

def ivf_centroids(
    df: DataFrame, n_centroids: int = 16, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """K-means-lite coarse quantizer: seed with the first n vectors by id
    (stable), refine with *iters* Lloyd steps — each step one assignment
    pass + one posexplode/groupBy mean, all DataFrame ops.

    Determinism caveat: the refine step's ``F.avg`` sums doubles in
    partition order, so centroid coordinates can drift by ULPs across
    layouts; the 9dp rounding below absorbs that in practice (assignment
    flips remain possible for a vector EXACTLY equidistant between two
    centroids — accept it or pre-coalesce to one partition for a
    bit-stable build). Seeds and the empty-cluster fallback are fully
    deterministic."""
    seeds = df.orderBy(id_col).limit(n_centroids).collect()
    cents = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(seeds)]
    for _ in range(iters):
        assigned = ivf_assign(df, cents, id_col=id_col, vec_col=vec_col)
        means = (
            assigned.select("centroid_id", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("centroid_id", "pos")
            .agg(F.round(F.avg("v"), 9).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
            .collect()
        )
        got = {int(r["centroid_id"]): [float(x) for x in r["centroid"]] for r in means}
        # empty clusters keep their previous centroid
        cents = [(cid, got.get(cid, vec)) for cid, vec in cents]
    return cents


def ivf_assign(
    df: DataFrame, centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment as one JVM expression: array_min over
    (squared-L2, cid) structs — no Python, no shuffle."""
    def l2sq(c):
        diff = F.zip_with(
            F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        )
        return F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v)

    best = F.array_min(
        F.array(*[
            F.struct(l2sq(vec).alias("d"), F.lit(cid).alias("cid"))
            for cid, vec in centroids
        ])
    )
    return df.withColumn("centroid_id", best["cid"])


def ivf_topk(
    df: DataFrame, query_vec: list[float],
    centroids: list[tuple[int, list[float]]], k: int = 10, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: probe the n_probe centroids nearest the query, exact cosine
    re-rank inside the probed cells. At scale the table is written
    partitioned by centroid_id, so the probe is partition pruning — the
    scan touches n_probe/n_centroids of the data."""
    q = np.asarray(query_vec, dtype=np.float64)
    order = sorted(centroids, key=lambda c: float(((np.asarray(c[1]) - q) ** 2).sum()))
    probes = [cid for cid, _ in order[:n_probe]]
    cand = ivf_assign(df, centroids, id_col, vec_col).filter(
        F.col("centroid_id").isin(probes)
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


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
    bucketed = rp_lsh_buckets(df, planes, id_col, vec_col)
    if probe_hamming >= n:
        # exhaustive probe: every bucket — provably identical to brute
        # force, used by the oracle-gated q_lsh_ann_full entry to
        # value-check the bucketing + re-rank machinery
        cand = bucketed
    else:
        # every bucket within hamming <= probe_hamming of the query
        # signature — a literal driver-side list of Σ C(n, d) ints
        # (n≲32, d≲3 in practice: a few thousand literals at most)
        from itertools import combinations

        probes = [qsig]
        for d in range(1, probe_hamming + 1):
            for bits in combinations(range(n), d):
                mask = 0
                for b in bits:
                    mask |= 1 << b
                probes.append(qsig ^ mask)
        cand = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def semantic_dedup(
    df: DataFrame, threshold: float = 0.95, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-level
    semantic dedup — k-means-partition the corpus, emit cosine-≥threshold
    pairs WITHIN each cell, connected-components the pair graph, keep one
    document per semantic cluster. Returns ``(vec_id, cluster, keep)``
    where ``cluster`` is the minimum reachable id (singletons label
    themselves) and ``keep`` marks the canonical copy.

    Scale shape: the pair join is within-cell only — shuffle keyed on
    ``centroid_id``, cost O(Σ cell²) instead of O(n²); centroids are a
    k-sized driver list (ivf_centroids). Cross-cell near-dups are missed
    by design — the SemDeDup recall tradeoff, bounded by k. With
    ``n_centroids=1`` the operator degrades to the exact all-pairs answer,
    which is what the DuckDB oracle gate checks (q_semantic_dedup); the
    partitioned path is pytest-checked against planted duplicates."""
    from .dedup import connected_components

    cents = ivf_centroids(df, n_centroids, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(df, cents, id_col=id_col, vec_col=vec_col).select(
        id_col, vec_col, "centroid_id"
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    pairs = (
        a.join(b, "centroid_id")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(cos >= F.lit(float(threshold)))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
    )
    cc = connected_components(pairs)
    return (
        df.select(id_col)
        .join(cc, F.col(id_col) == F.col("doc_id"), "left")
        .select(
            id_col,
            F.coalesce("component_id", F.col(id_col)).alias("cluster"),
        )
        .withColumn("keep", F.col("cluster") == F.col(id_col))
    )
