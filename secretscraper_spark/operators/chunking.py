"""Document chunking and sequence packing — the last mile between a
curated corpus and a training dataloader.

- chunk_documents : split each document into fixed-size token windows
  with optional overlap (the RAG/pretraining chunker). Pure Catalyst —
  one let-bound tokenize per row, a start-offset sequence, posexplode —
  zero shuffle, zero Python; composes with the scan stage.
- pack_sequences  : assign documents to fixed-capacity training
  sequences by contiguous fill in deterministic (group, doc_id) order —
  the reproducible alternative to greedy bin packing (same packing on
  every run / partition layout). One window per group; groups (the
  `source` column here) bound window width, so parallelism is
  group-count. For a single gigantic group, rank with
  plans/ranking.assign_global_seq's two-phase pass first and window over
  its partition-prefix output instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from secretscraper_spark.operators.textstats import WS_SPLIT_PATTERN


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """(doc_id, chunk_id, chunk_text, n_chunk_tokens): token windows of
    ``chunk_tokens`` whitespace tokens, consecutive windows sharing
    ``overlap`` tokens (stride = chunk_tokens - overlap). Case is
    preserved (chunking is not canonicalization); empty/whitespace-only
    docs produce no chunks; the final window may be short."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), WS_SPLIT_PATTERN), lambda x: x != "")

    def _chunks(tk):
        starts = F.sequence(
            F.lit(0), F.greatest(F.size(tk) - 1, F.lit(0)), F.lit(stride)
        )
        return F.transform(
            F.filter(starts, lambda s: s < F.size(tk)),
            lambda s: F.struct(
                F.array_join(F.slice(tk, s + 1, chunk_tokens), " ").alias("txt"),
                F.least(F.size(tk) - s, F.lit(chunk_tokens)).alias("n"),
            ),
        )

    chunks = F.element_at(F.transform(F.array(toks), _chunks), 1)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_id", "c"),
    ).select(
        "doc_id",
        "chunk_id",
        F.col("c.txt").alias("chunk_text"),
        F.col("c.n").alias("n_chunk_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    seq_len: int = 2048,
) -> DataFrame:
    """(group, doc_id, n_tokens, pack_id, pack_offset): documents fill
    fixed-capacity sequences contiguously in (group, doc_id) order —
    ``pack_id = floor(exclusive_prefix_tokens / seq_len)`` and
    ``pack_offset`` is where the doc starts inside its pack. A doc whose
    tokens straddle a boundary belongs to the pack it STARTS in (the
    loader truncates or wraps; the assignment stays deterministic).

    Determinism is the point: ``randomSplit``-style packing changes with
    partition layout, this never does. One window shuffle per group."""
    toks = F.filter(F.split(F.col(text_col), WS_SPLIT_PATTERN), lambda x: x != "")
    base = df.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    cum = base.withColumn(
        "cum_excl",
        F.sum("n_tokens").over(
            Window.partitionBy("group").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - F.col("n_tokens"),
    )
    return cum.select(
        "group",
        "doc_id",
        "n_tokens",
        F.floor(F.col("cum_excl") / seq_len).cast("long").alias("pack_id"),
        (F.col("cum_excl") % seq_len).cast("long").alias("pack_offset"),
    )
