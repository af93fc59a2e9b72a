"""Streaming corpus curation: funnel accounting over a document stream.

A crawl fleet's continuous ingest needs the same per-stage attrition
accounting the batch funnel produces (`operators/curation.funnel_counts`)
— and because every funnel stage used here is PER-DOCUMENT independent
(quality gates, language vote, entropy band; no cross-doc dedup), the
counts are additive across micro-batches: summing the per-batch funnel
rows equals the one-shot batch funnel over the union of the batches
(parity-tested with an availableNow stream in tests/test_streaming.py).

Idempotence follows the landing sink's pattern: each micro-batch
overwrites its OWN ``batch_id=N`` partition directory, so crash-replayed
batches cannot double-count. Read the accumulated funnel with
``spark.read.parquet(out_dir)`` and roll up per stage.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F

from ..operators.curation import funnel_counts


def stream_curation_funnel(
    docs: DataFrame,
    prepare: Callable[[DataFrame], DataFrame],
    stages: Callable[[], list[tuple[str, Column]]],
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the curation funnel per micro-batch over a streaming documents
    frame. *prepare* turns a batch into the joined signal frame (may use
    any BATCH DataFrame op — it runs inside foreachBatch); *stages* builds
    the ordered null-safe predicates (a callable so Column objects are
    constructed per batch). Stages MUST be per-document independent —
    cross-doc stages (dedup canonical) would make per-batch counts
    non-additive; use the batch funnel for those. Returns the
    StreamingQuery; caller awaits/stops."""

    def run(batch_df: DataFrame, batch_id: int) -> None:
        counts = funnel_counts(prepare(batch_df), stages())
        (
            counts.withColumn("batch_id", F.lit(batch_id))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    writer = (
        docs.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rollup_funnel(spark, out_dir: str) -> DataFrame:
    """Sum the per-batch funnel rows into the corpus-level funnel —
    valid because the streamed stages are per-doc independent."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("stage_idx", "stage")
        .agg(
            F.sum("n_in").cast("long").alias("n_in"),
            F.sum("n_kept").cast("long").alias("n_kept"),
        )
        .orderBy("stage_idx")
    )
