"""Link-graph analytics over the crawl edge table.

The crawler's K2 hierarchy report materializes the (url_from, url_to)
edge list; a production frontier wants more than grouping — link-based
prioritization (crawl the high-centrality hosts first) is the classic
frontier-scheduling signal (Cho/Garcia-Molina/Page, "Efficient Crawling
Through URL Ordering"). This module gives the engine that signal as a
first-class iterative DataFrame computation:

- out_degrees : per-source fan-out (one partial-agg groupBy)
- pagerank    : damped power iteration — per round ONE shuffle join
                (edges x ranks on src, edges pre-partitioned once and
                reused) + ONE partial-agg groupBy(dst), lineage cut with
                localCheckpoint per round; driver-side work is O(1)

Semantics follow the classic formulation used by the Spark examples
(`examples/src/main/python/pagerank.py` in apache/spark): ranks start at
1.0, each round ``rank(v) = (1-d) + d * sum(rank(u)/deg(u))`` over
in-edges; dangling nodes keep contributing nothing (their mass is not
redistributed), so ranks are un-normalized popularity scores — exactly
what frontier ordering needs (only the ORDER matters). The fixed-
iteration form is deliberately oracle-expressible: the same computation
unrolls into chained SQL CTEs (see __spark_entry__.q_pagerank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def out_degrees(edges: DataFrame, src_col: str = "src") -> DataFrame:
    """(src, deg): fan-out per source over a deduplicated edge list."""
    return edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("deg"))


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    round_to: int | None = 6,
) -> DataFrame:
    """Damped PageRank over *edges* → (node, pagerank).

    Nodes are every distinct endpoint; duplicate edges collapse first (a
    page linking twice votes once, matching the crawler's deduplicated
    edge report). ``round_to`` rounds the final score so independent
    engines agree bit-for-bit despite float summation order (None = raw).

    Scale shape: edges and degrees join once up front into a static
    ``(src, dst, deg)`` frame that is repartitioned by src and
    localCheckpointed — each of the ``n_iter`` rounds then shuffles ONLY
    the rank frame (one row per node) to the edge partitioning, and the
    contribution groupBy(dst) is map-side combined. No driver-side data
    movement at any point; lineage is cut per round so plan depth stays
    constant. Hot destinations (every page links home) are plain groupBy
    skew — AQE's skew-join/partition-coalescing handles the join side,
    and the partial agg absorbs the combine side.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    static = (
        e.join(deg, "src")
        .repartition("src")
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    base = 1.0 - damping
    for _ in range(n_iter):
        contribs = (
            static.join(ranks, static["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("contrib", F.lit(0.0)))
                .alias("rank"),
            )
            .localCheckpoint()
        )
    out = ranks.select("node", F.col("rank").alias("pagerank"))
    if round_to is not None:
        out = out.select("node", F.round("pagerank", round_to).alias("pagerank"))
    return out


def prioritize_frontier(
    frontier: DataFrame,
    host_scores: DataFrame,
    score_col: str = "pagerank",
    default_score: float = 0.0,
) -> DataFrame:
    """Attach a per-host priority (e.g. :func:`pagerank` over the crawl
    edge graph, rolled up by host) to a frontier and return it ordered
    for budgeted fetching: highest score first, BFS ``discovery_seq`` as
    the deterministic tiebreak. Unknown hosts get *default_score*.

    This is the link-ordering frontier scheduler of Cho et al. layered on
    the engine's existing pieces: the score table is host-cardinality
    (broadcast dim), the sort is the same salted-key DataFrame sort the
    north rule names (hot hosts cannot own a reducer). BFS parity mode
    (the reference's ordering) remains the crawler default — this is the
    opt-in scheduler for budget-cut crawls, where what you fetch under a
    budget matters more than pure breadth order."""
    from ..plans.politeness import with_host

    f = with_host(frontier)
    scores = F.broadcast(
        host_scores.select(
            F.col("host").alias("p_host"), F.col(score_col).alias("priority")
        )
    )
    joined = f.join(scores, f["host"] == scores["p_host"], "left").drop("p_host")
    joined = joined.withColumn(
        "priority", F.coalesce("priority", F.lit(default_score))
    )
    salt = F.pmod(F.xxhash64("url_norm"), F.lit(16))
    return (
        joined.withColumn("salt", salt)
        .repartition(F.col("host"), F.col("salt"))
        .sortWithinPartitions(F.desc("priority"), F.asc("discovery_seq"))
        .drop("salt")
    )


def opic_rounds(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_rounds: int = 3,
    round_to: int | None = 6,
) -> DataFrame:
    """Adaptive On-line Page Importance Computation (OPIC — Abiteboul,
    Preda, Cobéna, WWW 2003) → (node, cash, history, importance).

    The crawl-native importance signal: unlike PageRank's global power
    iteration, OPIC's per-page (cash, history) state updates INCREMENTALLY
    as pages are processed, so a frontier can be re-prioritized mid-crawl
    from whatever state exists. This is the synchronous-rounds batch form
    (every node distributes once per round — the tier-engine analogue of
    "each page crawled once per round"):

      - cash starts 1/N per node, history 0
      - each round every node sends cash/outdeg along each outlink;
        DANGLING nodes (no outlinks) send their cash to the virtual root,
        which redistributes it uniformly to all N nodes (the paper's
        virtual-page trick that makes the graph strongly connected)
      - history += cash just distributed; new cash = total received
      - importance = history + cash (the paper's estimate at any instant;
        un-normalized ORDER is what frontier scheduling consumes)

    Invariant (tested): sum(cash) == 1 after every round; sum(history)
    == rounds_run.

    Scale shape mirrors :func:`pagerank`: the (src, dst, deg) frame is
    built once, repartitioned by src and checkpointed; each round is ONE
    shuffle join on src + ONE map-side-combined groupBy(dst); the dangling
    total rides a 1-row broadcast crossJoin (never a driver collect);
    lineage is cut per round. Fixed-round form is deliberately
    oracle-expressible (unrolled CTEs — __spark_entry__.q_opic)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    static = e.join(deg, "src").repartition("src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = float(nodes.count())
    state = nodes.select(
        "node",
        (F.lit(1.0) / F.lit(n)).alias("cash"),
        F.lit(0.0).alias("history"),
    ).localCheckpoint()
    has_out = deg.select(F.col("src").alias("node"))
    for _ in range(n_rounds):
        recv = (
            static.join(
                state.select(F.col("node").alias("src"), "cash"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("cash") / F.col("deg")).alias("recv"))
        )
        dang = (
            state.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("dang_total"))
        )
        state = (
            state.join(recv, state["node"] == recv["dst"], "left")
            .drop("dst")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.coalesce("recv", F.lit(0.0))
                    + F.col("dang_total") / F.lit(n)
                ).alias("cash"),
                (F.col("history") + F.col("cash")).alias("history"),
            )
            .localCheckpoint()
        )
    out = state.select(
        "node", "cash", "history",
        (F.col("cash") + F.col("history")).alias("importance"),
    )
    if round_to is not None:
        out = out.select(
            "node",
            F.round("cash", round_to).alias("cash"),
            F.round("history", round_to).alias("history"),
            F.round("importance", round_to).alias("importance"),
        )
    return out


def host_pagerank(edges: DataFrame, n_iter: int = 10) -> DataFrame:
    """Host-level pagerank of a URL edge list: collapse (parent, child)
    URLs to their hosts, drop intra-host self-edges, run :func:`pagerank`
    → (host, pagerank). The standard crawl-scheduling granularity — the
    host graph is ~4 orders smaller than the URL graph."""
    host = lambda c: F.regexp_extract(c, r"//([^/:]+)", 1)
    he = edges.select(
        host(F.col("parent_norm")).alias("src"),
        host(F.col("child_norm")).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return pagerank(he, n_iter=n_iter).select(
        F.col("node").alias("host"), "pagerank"
    )
