"""Deduplication operators for web-scale corpora.

- exact_duplicates: hash-groupBy (one shuffle, map-side partial agg)
- shingles / minhash_signatures: MinHash entirely JVM-side — shingle
  explode + 64 ``min(xxhash64(shingle, seed))`` aggregates (no Python)
- lsh_candidate_pairs: banding → bucket self-join → pair dedup; the
  classic MinHash-LSH plan where only same-bucket pairs shuffle
- ngram_jaccard_pairs: exact verification join for candidate pairs
- simhash64: vectorized pandas UDF (numpy bit-twiddling, Arrow batches)

Scale notes: the LSH self-join keys on (band, band_hash) so the shuffle
volume is O(candidate buckets), not O(n²); skewed buckets (boilerplate
docs) are capped with a per-bucket limit before pairing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical texts (md5 key), one row per group size>1."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Word k-gram shingles per doc: explode over a JVM-side transform."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(grams)).alias("shingle"),
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 64
) -> DataFrame:
    """doc_id → minhash signature columns mh0..mh{H-1}; pure JVM aggregate
    with map-side combine (one shuffle on doc_id)."""
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, num_hashes: int = 64, bands: int = 16,
    max_bucket: int = 200,
) -> DataFrame:
    """Band the signatures, self-join buckets, emit candidate (a<b) pairs
    with the fraction of agreeing minhashes as the jaccard estimate."""
    rows = num_hashes // bands
    mh_cols = [F.col(f"mh{i}") for i in range(num_hashes)]
    banded = sig.select(
        "doc_id",
        F.array(*mh_cols).alias("sig"),
        F.posexplode(
            F.array(*[
                F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)])
                for b in range(bands)
            ])
        ).alias("band", "band_hash"),
    )
    # cap pathological buckets (boilerplate skew guard)
    w_rank = F.row_number().over(
        Window.partitionBy("band", "band_hash").orderBy("doc_id")
    )
    banded = banded.withColumn("rk", w_rank).filter(F.col("rk") <= max_bucket)

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    )
    return pairs.select(
        "doc_a", "doc_b",
        F.round(agree / F.lit(float(len(mh_cols))), 6).alias("est_jaccard"),
    )


def exact_jaccard_pairs(
    sh: DataFrame, min_jaccard: float = 0.5, max_df: int | None = None
) -> DataFrame:
    """Exact shingle-set Jaccard for every pair sharing ≥1 shingle, via an
    inverted-index self-join on the shingle (shuffle is O(postings²) per
    shingle, NOT O(n²) over docs — the scalable exact-dedup plan).

    ``max_df`` optionally drops shingles occurring in more than that many
    docs (stopword-shingle skew guard) — leave None for oracle-exact runs.
    """
    if max_df is not None:
        keep = sh.groupBy("shingle").count().filter(F.col("count") <= max_df)
        sh = sh.join(keep.select("shingle"), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    # sizes is one row per doc — NOT broadcastable at 10^9 docs; let AQE
    # pick broadcast when it fits, sort-merge otherwise
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
    return out.filter(jac >= min_jaccard).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


def ngram_jaccard_pairs(
    sh: DataFrame, candidates: DataFrame
) -> DataFrame:
    """Exact shingle-set jaccard for candidate pairs (verification join)."""
    sets = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("sset"))
    out = (
        candidates.join(sets.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("sset", "set_a")
        .join(sets.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("sset", "set_b")
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size(F.array_union("set_a", "set_b"))
    return out.select(
        "doc_a", "doc_b",
        F.round(inter / F.greatest(union, F.lit(1)).cast("double"), 6).alias("jaccard"),
    )


_SIMHASH_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("simhash", T.LongType())]
)


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over whitespace tokens (vectorized numpy in an Arrow
    batch; FNV-1a token hashes for determinism across workers)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_hash = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").lower().split()
                if not toks:
                    out_ids.append(doc_id)
                    out_hash.append(0)
                    continue
                hs = np.fromiter(
                    (_fnv1a64(t) for t in toks), dtype=np.uint64, count=len(toks)
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
                v = (2 * bits - 1).sum(axis=0)
                sh = np.uint64(0)
                for i in range(64):
                    if v[i] > 0:
                        sh |= np.uint64(1) << np.uint64(i)
                out_ids.append(doc_id)
                out_hash.append(int(sh.astype(np.int64)))
            yield pd.DataFrame({"doc_id": out_ids, "simhash": out_hash})

    return df.select(F.col(id_col).cast("long").alias(id_col), text_col).mapInPandas(
        compute, _SIMHASH_SCHEMA
    )


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_near_dups(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ k via 4-block banding
    (pigeonhole: ≤3 differing bits → at least one 16-bit block equal)."""
    blocks = F.array(*[
        F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
        for i in range(4)
    ])
    banded = sim.select(
        "doc_id", "simhash", F.posexplode(blocks).alias("block", "block_val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, ["block", "block_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
