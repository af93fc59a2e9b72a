"""Exact distribution profiling for corpus curation.

Curation thresholds (length cutoffs, quality floors, per-source budgets)
come from the DATA's distribution, and `approxQuantile`/percentile
sketches are neither deterministic across runs nor reproducible in an
independent engine. `grouped_quantiles` computes EXACT type-1 (lower)
quantiles per group: the element at rank ``floor(q·(n−1))`` of the
group's ascending values — one window pass, no sketch, bit-identical
everywhere.

Scale shape: the only shuffle is the group-keyed window sort, and groups
(sources, domains, languages, shards) are plentiful — this parallelizes
to the group count with no single-task stage and no driver state. For a
GLOBAL quantile (one group) use `plans/ranking.assign_global_seq` over
the value instead: a one-group window would collapse to one task.

Determinism contract: the selected value at a target rank is unique
regardless of how ties order (ties share the value), targets are
``floor(q·(n−1))`` computed in identical IEEE doubles, and the output is
(group, q literal, value) — no float aggregation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    group_out: str = "group",
    value_out: str = "value",
) -> DataFrame:
    """One row per (group, q): the exact q-quantile of *value_col*
    within *group_col* (lower/type-1: element at rank floor(q·(n−1))).
    Single window pass; each row checks the q-target array and explodes
    only its hits, so the output is |groups|·|qs| rows with no second
    scan or join."""
    if not qs:
        raise ValueError("qs must be non-empty")
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    wn = Window.partitionBy(group_col)
    ranked = df.select(group_col, value_col).withColumns(
        {
            "__rk": (F.row_number().over(w) - 1).cast("long"),
            "__n": F.count(F.lit(1)).over(wn),
        }
    )
    targets = F.array(
        *[
            F.struct(
                F.lit(float(q)).alias("q"),
                F.floor(F.lit(float(q)) * (F.col("__n") - 1))
                .cast("long")
                .alias("t"),
            )
            for q in qs
        ]
    )
    hits = F.filter(targets, lambda s: s["t"] == F.col("__rk"))
    return (
        ranked.select(
            F.col(group_col).alias(group_out),
            F.col(value_col).alias(value_out),
            F.explode(hits).alias("__hit"),
        )
        .select(group_out, F.col("__hit.q").alias("q"), value_out)
    )
