"""Embedding compression: per-dimension scalar quantization (SQ8-style).

At 10^10-row scale the fp32 embedding column dominates the ANN index's
storage and scan bytes; int8 codes cut both 4× while the asymmetric
search path (exact query × dequantized docs, then exact re-rank of the
survivors) keeps ranking loss tiny — the FAISS ScalarQuantizer recipe,
re-expressed as pure Catalyst HOFs.

Everything is deterministic integer/IEEE arithmetic with no float
reductions of data-dependent order, so codes and reconstruction errors
are bit-identical across engines and partition layouts (oracle-gated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dim_stats(df: DataFrame, vec_col: str = "embedding") -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus — the quantizer's training
    pass. One posexplode → hash-agg on the dimension index (map-side
    combined, dim-sized state per executor) and a dim-sized collect — the
    same driver cost class as IVF's centroid list."""
    rows = (
        df.select(F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    )
    by_pos = {int(r["pos"]): (float(r["mn"]), float(r["mx"])) for r in rows}
    dims = sorted(by_pos)
    return [by_pos[d][0] for d in dims], [by_pos[d][1] for d in dims]


def _steps(mins: list[float], maxs: list[float], bits: int) -> list[float]:
    levels = (1 << bits) - 1
    return [(mx - mn) / levels if mx > mn else 1.0 for mn, mx in zip(mins, maxs)]


def quantize_expr(vec_col, mins: list[float], maxs: list[float], bits: int = 8):
    """``array<int>`` codes: ``round((x - min_d) / step_d)`` clamped to
    [0, 2^bits-1]. One transform HOF with index lambda — JVM codegen,
    zero Python, zero shuffle; stats ride along as array literals."""
    levels = (1 << bits) - 1
    mn_arr = F.array(*[F.lit(float(m)) for m in mins])
    st_arr = F.array(*[F.lit(float(s)) for s in _steps(mins, maxs, bits)])
    return F.transform(
        vec_col,
        lambda x, i: F.least(
            F.greatest(
                F.round(
                    (x.cast("double") - F.element_at(mn_arr, i + 1))
                    / F.element_at(st_arr, i + 1),
                    0,
                ).cast("int"),
                F.lit(0),
            ),
            F.lit(levels),
        ),
    )


def dequantize_expr(codes_col, mins: list[float], maxs: list[float], bits: int = 8):
    """Reconstruction ``min_d + code * step_d`` as ``array<double>``."""
    mn_arr = F.array(*[F.lit(float(m)) for m in mins])
    st_arr = F.array(*[F.lit(float(s)) for s in _steps(mins, maxs, bits)])
    return F.transform(
        codes_col,
        lambda c, i: F.element_at(mn_arr, i + 1)
        + c.cast("double") * F.element_at(st_arr, i + 1),
    )


def quantize_embeddings(
    df: DataFrame,
    mins: list[float],
    maxs: list[float],
    *,
    vec_col: str = "embedding",
    bits: int = 8,
    codes_col: str = "codes",
) -> DataFrame:
    """Attach the int-code column. At deployment the codes table is what
    gets persisted/scanned (4× smaller than fp32 at bits=8); originals are
    fetched only for the re-rank candidates."""
    return df.withColumn(codes_col, quantize_expr(F.col(vec_col), mins, maxs, bits))


def quantized_cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    mins: list[float],
    maxs: list[float],
    k: int = 10,
    *,
    bits: int = 8,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric quantized ANN: score every row by exact-query ×
    dequantized-doc cosine (pure HOF fold over int codes — the cheap scan),
    keep the best ``k*refine`` (TakeOrderedAndProject: partial per-partition
    top-k, no corpus shuffle), then exact-cosine re-rank the survivors on
    the original vectors. ``refine >= n_rows/k`` degrades to exact brute
    force — the property the oracle gate uses (q_quantized_ann_full)."""
    from secretscraper_spark.operators.similarity import cosine_similarity, cosine_topk

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    codes = quantize_expr(F.col(vec_col), mins, maxs, bits)
    approx = cosine_similarity(dequantize_expr(codes, mins, maxs, bits), q)
    cand = (
        df.withColumn("approx_cosine", approx)
        .orderBy(F.desc("approx_cosine"), F.col(id_col))
        .limit(k * refine)
        .drop("approx_cosine")
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
