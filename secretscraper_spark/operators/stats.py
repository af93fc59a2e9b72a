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


def heavy_hitters(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Exact heavy-hitter audit over a key — the skew diagnosis that
    decides when a join/groupBy on that key needs salting (SURVEY §4's
    salted politeness sort, AQE skew-join thresholds, per-host frontier
    caps). At 100 TB the hot keys ARE the plan risk: one mega-host in a
    host-keyed shuffle is a straggler task, and this op names it before
    the stage does.

    Returns the ``top_n`` keys by row count with fixed-point
    ``share_micro`` (rows·1e6 DIV total — integer DIV so independent
    engines agree bit-for-bit); ties order by key so the cut is
    deterministic.

    Plan: one map-side-combined groupBy(key) count, a single-row total
    broadcast back over it, and a TakeOrderedAndProject for the top-N —
    no corpus-sized sort, no second scan."""
    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col("__k").alias(key_col),
            "n_rows",
            F.expr("CASE WHEN __total > 0 THEN n_rows * 1000000 DIV __total "
                   "ELSE 0 END").cast("long").alias("share_micro"),
        )
        .orderBy(F.desc("n_rows"), key_col)
        .limit(top_n)
    )
