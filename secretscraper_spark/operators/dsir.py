"""DSIR-style data selection via importance resampling.

Selects raw-corpus documents whose hashed n-gram profile looks like a
target corpus (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): unigram+bigram features hashed into a fixed
bucket space, per-bucket log-probability ratio between target and raw
bag-of-ngram models (add-alpha smoothed), per-document importance
weight = sum of its grams' ratios, then Gumbel top-k for sampling
without replacement.

Spark-first shape at 100 TB:

* feature hashing is a scan-stage explode (tokens + zip_with bigrams →
  pmod(hash)) — no shuffle;
* both bag-of-ngram models are ``n_buckets``-sized aggregates (map-side
  combined), and the log-ratio dim they produce is broadcast back, so
  scoring joins nothing corpus-sized;
* the per-doc weight aggregate shuffles DOC rows, not gram rows
  (partial_sum combines inside each scan task);
* selection is a TakeOrderedAndProject top-k, never a global sort.

Determinism contract (the BM25 fixed-point idiom): log-ratios are
rounded to integer MICRO-units (×1e6) at dim-build time, so the per-doc
sum is BIGINT arithmetic — exact, order-independent, and bit-identical
under the DuckDB oracle. Gumbel noise is derived from a hash of the doc
id (``u = (h % M + 0.5)/M``, ``g = -ln(-ln u)``, micro-rounded), so the
"random" sample is reproducible run-to-run and engine-to-engine —
the same property `operators/sampling.py` keys its splits on.
``mode='portable'`` (md5-prefix hash) is the oracle-checked path;
``mode='fast'`` (xxhash64, JVM codegen) is the production default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import mode_hash64 as _hash
from .textstats import WS_SPLIT_PATTERN

MICRO = 1_000_000.0
NOISE_BUCKETS = 1 << 20


def _word_tokens(text_col: str) -> F.Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), WS_SPLIT_PATTERN),
        lambda t: t != F.lit(""),
    )


def hashed_gram_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    mode: str = "fast",
    seed: int | None = None,
) -> DataFrame:
    """One row per (doc, gram occurrence): ``doc_id``, ``bucket`` — the
    hashed unigram+bigram feature stream. Scan-stage explode, no
    shuffle; repeated grams keep their multiplicity (bag model)."""
    toks = _word_tokens(text_col)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.concat(toks, bigrams)).alias("gram"),
    )
    return grams.select(
        "doc_id",
        F.pmod(_hash(F.col("gram"), mode, seed), F.lit(n_buckets)).alias(
            "bucket"
        ),
    )


def fit_log_ratio(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    mode: str = "fast",
    seed: int | None = None,
) -> DataFrame:
    """The DSIR importance model: per-bucket ``ratio_micro`` =
    round(1e6 · [ln p_target(bucket) − ln p_raw(bucket)]) with add-alpha
    smoothing over the ``n_buckets`` feature space. Two hash-aggregates
    (each ≤ n_buckets rows) + a full-outer join of the two count dims —
    everything after the scans is bucket-dim sized and broadcastable."""

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            hashed_gram_buckets(df, text_col, id_col, n_buckets, mode, seed)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    tc = counts(target, "cnt_t")
    rc = counts(raw, "cnt_r")
    tt = tc.agg(F.sum("cnt_t").alias("tot_t"))
    rt = rc.agg(F.sum("cnt_r").alias("tot_r"))
    joined = (
        tc.join(rc, "bucket", "full_outer")
        .na.fill({"cnt_t": 0, "cnt_r": 0})
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
    )
    a = F.lit(float(alpha))
    ab = F.lit(float(alpha * n_buckets))
    log_ratio = F.log(
        (F.col("cnt_t") + a) / (F.col("tot_t") + ab)
    ) - F.log((F.col("cnt_r") + a) / (F.col("tot_r") + ab))
    return joined.select(
        "bucket",
        F.round(log_ratio * F.lit(MICRO), 0).cast("long").alias("ratio_micro"),
    )


def importance_weights(
    docs: DataFrame,
    ratio_dim: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    mode: str = "fast",
    seed: int | None = None,
) -> DataFrame:
    """Per-document ``logw_micro`` = Σ gram ratio_micro (BIGINT — exact
    under any partitioning/order). The ratio dim is broadcast onto the
    gram stream; the aggregate's shuffle carries one partial per doc per
    task, never the gram stream itself. Docs with zero tokens produce no
    row (no grams → no evidence)."""
    gb = hashed_gram_buckets(docs, text_col, id_col, n_buckets, mode, seed)
    return (
        gb.join(F.broadcast(ratio_dim), "bucket", "left")
        .na.fill({"ratio_micro": 0})
        .groupBy("doc_id")
        .agg(F.sum("ratio_micro").cast("long").alias("logw_micro"))
    )


def dsir_select(
    weights: DataFrame,
    k: int,
    seed: int = 7,
    noise_buckets: int = NOISE_BUCKETS,
    mode: str = "fast",
) -> DataFrame:
    """Gumbel top-k over ``logw_micro``: sampling k docs WITHOUT
    replacement ∝ exp(logw) ≡ taking the top k of logw + Gumbel noise
    (the Gumbel-max trick), with the noise derived from a hash of the
    doc id so the sample is deterministic. Adds ``score_micro``;
    compiles to TakeOrderedAndProject — one scan, no global sort. Ties
    break on doc_id."""
    h = F.pmod(
        _hash(F.col("doc_id"), mode, seed), F.lit(int(noise_buckets))
    )
    u = (h + F.lit(0.5)) / F.lit(float(noise_buckets))
    g = -F.log(-F.log(u))
    scored = weights.withColumn(
        "score_micro",
        (
            F.col("logw_micro")
            + F.round(g * F.lit(MICRO), 0).cast("long")
        ).cast("long"),
    )
    return scored.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(k)
