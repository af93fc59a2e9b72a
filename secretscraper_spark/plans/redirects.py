"""Redirect-chain resolution — pointer doubling over the redirect map.

The reference follows redirects inline per fetch (its httpx client,
``crawler.py`` fetch path); a batch crawler records one ``src → dst`` row
per 3xx response and resolves chains OFFLINE so frontier identity,
dedup, and reporting all use the terminal URL. Following chains one hop
per round costs max-chain-length shuffles; this module uses pointer
doubling (``f_{2k}(u) = f_k(f_k(u))``, the classic parallel
list-ranking/functional-graph trick): ``ceil(log2(max_hops))``
self-joins resolve every chain up to ``max_hops`` — 5 rounds for 32
hops, 20 for a million.

Each round is ONE shuffle self-join of the (url → current-target, steps)
map with itself, localCheckpointed so lineage stays flat. Cycles and
over-cap chains cannot terminate; they are flagged ``unresolved`` (their
``final_url``/``n_hops`` are sentinels '-'/-1 — a cycle has no terminal,
and any reported hop count would be an artifact of the doubling cap).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def resolve_redirects(
    redirects: DataFrame,
    max_hops: int = 32,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(url, final_url, n_hops, unresolved) for every redirecting URL.

    *redirects* holds one row per redirecting URL (terminal URLs are the
    ones ABSENT from the src column). ``unresolved`` marks URLs whose
    chain has not reached a terminal within *max_hops* — a cycle or an
    over-long chain; those rows carry ``final_url='-'``/``n_hops=-1``.
    src values must be unique (one Location per response)."""
    m = redirects.select(
        F.col(src_col).alias("u"),
        F.col(dst_col).alias("v"),
        F.lit(1).cast("long").alias("steps"),
    ).localCheckpoint()
    srcs = m.select("u").distinct()
    srcs_as_v = srcs.select(F.col("u").alias("v"))
    cur = m
    for _ in range(max(1, math.ceil(math.log2(max(max_hops, 2))))):
        # fixpoint probe: once no chain still points at a redirecting
        # URL, further doubling rounds are no-ops — same cheap
        # convergence check as connected_components
        if not cur.join(srcs_as_v, "v", "left_semi").take(1):
            break
        a, b = cur.alias("a"), cur.alias("b")
        cur = (
            a.join(b, F.col("a.v") == F.col("b.u"), "left")
            .select(
                F.col("a.u").alias("u"),
                # terminal targets have no b-row: the chain stays put
                F.coalesce(F.col("b.v"), F.col("a.v")).alias("v"),
                (F.col("a.steps") + F.coalesce(F.col("b.steps"), F.lit(0)))
                .alias("steps"),
            )
            .localCheckpoint()
        )
    flagged = cur.join(
        srcs.select(F.col("u").alias("v"), F.lit(True).alias("_redir")),
        "v",
        "left",
    )
    # doubling rounds cover 2^ceil(log2(max_hops)) hops, which overshoots
    # a non-power-of-two cap: a chain that terminated but needed more
    # than max_hops hops is still over the contract's cap — flag it
    unresolved = F.col("_redir").isNotNull() | (F.col("steps") > max_hops)
    return flagged.select(
        F.col("u").alias("url"),
        F.when(unresolved, F.lit("-")).otherwise(F.col("v")).alias("final_url"),
        F.when(unresolved, F.lit(-1)).otherwise(F.col("steps"))
        .cast("long")
        .alias("n_hops"),
        unresolved.alias("unresolved"),
    )
