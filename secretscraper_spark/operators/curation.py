"""Curation-funnel accounting: cumulative attrition across gate stages.

Every production corpus pipeline is a funnel (quality gate → language →
script/entropy → dedup → ...), and the numbers that matter operationally
are the per-stage attrition counts — they are how you notice a gate
suddenly eating 40% of a crawl. This operator turns an ordered list of
per-document predicates into that table in ONE aggregation pass.

Scale shape: the predicates are evaluated in a single projection over the
already-joined signal frame, the cumulative keeps are conditional sums in
ONE hash aggregate (map-side combined, output is one row), and the
per-stage rows are exploded from that row — no per-stage scan, no
self-join, corpus touched once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def funnel_counts(df: DataFrame, stages: list[tuple[str, Column]]) -> DataFrame:
    """(stage_idx, stage, n_in, n_kept) for each stage, where a document
    is kept at stage i iff it passed stages 0..i (cumulative AND), so
    ``n_in`` of stage i equals ``n_kept`` of stage i−1 (stage 0's n_in is
    the corpus size). Predicates must be null-safe (coalesce NULL-able
    signals to False at the call site) — a NULL would silently fall out
    of the conditional sum and break the n_in/n_kept chaining invariant."""
    cum = F.lit(True)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_total")]
    for i, (_, pred) in enumerate(stages):
        cum = cum & pred
        # coalesce: F.sum over ZERO rows is NULL — an empty corpus must
        # report 0-everywhere, not break the n_in/n_kept chain with NULLs
        aggs.append(
            F.coalesce(F.sum(cum.cast("long")), F.lit(0))
            .cast("long").alias(f"k{i}")
        )
    row = df.agg(*aggs)
    entries = []
    prev: Column = F.col("n_total")
    for i, (name, _) in enumerate(stages):
        entries.append(
            F.struct(
                F.lit(i).cast("long").alias("stage_idx"),
                F.lit(name).alias("stage"),
                prev.alias("n_in"),
                F.col(f"k{i}").alias("n_kept"),
            )
        )
        prev = F.col(f"k{i}")
    return row.select(F.explode(F.array(*entries)).alias("e")).select("e.*")
