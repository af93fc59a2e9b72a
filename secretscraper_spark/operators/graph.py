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
- trustrank   : pagerank with teleport mass on a trusted seed set
                (spam demotion — Gyöngyi et al., VLDB 2004)
- hits        : hubs/authorities with per-half-step L2 norms as 1-row
                broadcast crossJoins (Kleinberg, JACM 1999)
- opic_rounds : incremental cash/history importance (Abiteboul et al.,
                WWW 2003) — the signal a crawler updates mid-crawl

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


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    n_iter: int = 10,
    damping: float = 0.85,
    round_to: int | None = 6,
) -> DataFrame:
    """TrustRank (Gyöngyi/Garcia-Molina/Pedersen, VLDB 2004) → (node,
    trustrank): PageRank with the teleport vector concentrated on a
    trusted *seeds* set instead of uniform — trust attenuates with link
    distance from the seeds, so link-farm clusters with no trusted
    in-paths score ~0. The crawl-scheduling use is spam demotion: order
    the frontier by trustrank (or pagerank/trustrank ratio) to starve
    spam networks of fetch budget.

    ``rank0(v) = s(v)``; each round ``rank(v) = (1-d)·s(v) + d·Σ
    rank(u)/deg(u)`` over in-edges, where ``s(v) = 1/|S|`` for seed nodes
    and 0 otherwise. Dangling mass is not redistributed (same
    un-normalized order-only convention as :func:`pagerank`). Scale shape
    identical to :func:`pagerank`: static (src,dst,deg) frame built once,
    one shuffle join + one partial-agg groupBy per round, seed dim
    broadcast. Fixed-round form unrolls into the oracle's chained CTEs
    (__spark_entry__.q_trustrank)."""
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
    )
    s = seeds.select(F.col(seed_col).alias("node")).distinct()
    n_seeds = float(s.count())
    if n_seeds == 0:
        # 1/|S| below would divide by zero per row (ANSI mode) — and a
        # trust computation with nothing trusted is a caller bug
        raise ValueError("trustrank needs a non-empty seeds frame")
    tele = (
        nodes.join(
            F.broadcast(s.withColumn("__seed", F.lit(1))), "node", "left"
        )
        .select(
            "node",
            (F.coalesce("__seed", F.lit(0)) / F.lit(n_seeds)).alias("tele"),
        )
        .localCheckpoint()
    )
    ranks = tele.select("node", F.col("tele").alias("rank"), "tele")
    d = float(damping)
    for _ in range(n_iter):
        contribs = (
            static.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        ranks = (
            tele.join(contribs, tele["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(1.0 - d) * F.col("tele")
                    + F.lit(d) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
                "tele",
            )
            .localCheckpoint()
        )
    out = ranks.select("node", F.col("rank").alias("trustrank"))
    if round_to is not None:
        out = out.select(
            "node", F.round("trustrank", round_to).alias("trustrank")
        )
    return out


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 2,
    round_to: int | None = 6,
) -> DataFrame:
    """HITS (Kleinberg, JACM 1999) → (node, hub, authority), L2-normalized
    per half-step. The crawl reading: authorities are the content worth
    fetching; hubs are the directory/index pages worth RE-fetching for
    fresh outlinks — a different frontier signal than either PageRank
    (in-link popularity) or OPIC (incremental cash).

    Per round: ``auth(v) = Σ hub(u)`` over in-edges then L2-normalize;
    ``hub(v) = Σ auth(w)`` over out-edges then L2-normalize. Scale shape:
    the edge list is materialized once; each half-step is one shuffle
    join + one partial-agg groupBy (keyed by dst for the auth step, src
    for the hub step), and each L2 norm rides a 1-row broadcast crossJoin
    (never a driver collect). Fixed rounds unroll into the oracle's CTEs
    (__spark_entry__.q_hits)."""
    if n_iter < 1:
        raise ValueError("hits needs n_iter >= 1 (authority is undefined before the first half-step)")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    hub = nodes.select("node", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(n_iter):
        raw_auth = (
            e.join(hub.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("raw"))
        )
        auth_norm = raw_auth.agg(
            F.sqrt(F.coalesce(F.sum(F.col("raw") * F.col("raw")), F.lit(0.0))).alias("nrm")
        )
        auth = (
            nodes.join(raw_auth, nodes["node"] == raw_auth["dst"], "left")
            .crossJoin(F.broadcast(auth_norm))
            .select(
                "node",
                F.when(
                    F.col("nrm") > 0, F.coalesce("raw", F.lit(0.0)) / F.col("nrm")
                ).otherwise(F.lit(0.0)).alias("authority"),
            )
            .localCheckpoint()
        )
        raw_hub = (
            e.join(
                auth.select(F.col("node").alias("dst"), "authority"), "dst"
            )
            .groupBy("src")
            .agg(F.sum("authority").alias("raw"))
        )
        hub_norm = raw_hub.agg(
            F.sqrt(F.coalesce(F.sum(F.col("raw") * F.col("raw")), F.lit(0.0))).alias("nrm")
        )
        hub = (
            nodes.join(raw_hub, nodes["node"] == raw_hub["src"], "left")
            .crossJoin(F.broadcast(hub_norm))
            .select(
                "node",
                F.when(
                    F.col("nrm") > 0, F.coalesce("raw", F.lit(0.0)) / F.col("nrm")
                ).otherwise(F.lit(0.0)).alias("hub"),
            )
            .localCheckpoint()
        )
    out = hub.join(auth, "node").select("node", "hub", "authority")
    if round_to is not None:
        out = out.select(
            "node",
            F.round("hub", round_to).alias("hub"),
            F.round("authority", round_to).alias("authority"),
        )
    return out


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
    if n == 0:
        # constant 1.0/0.0 would throw at constant-folding under ANSI;
        # an empty graph has an empty (correct) answer
        return nodes.select(
            "node",
            F.lit(0.0).alias("cash"),
            F.lit(0.0).alias("history"),
            F.lit(0.0).alias("importance"),
        )
    state = nodes.select(
        "node",
        (F.lit(1.0) / F.lit(n)).alias("cash"),
        F.lit(0.0).alias("history"),
    ).localCheckpoint()
    # derived from the CHECKPOINTED static frame (not the raw deg/e
    # lineage) and materialized once: the per-round dangling check would
    # otherwise re-run the edge dedup + degree shuffle every round
    has_out = (
        static.select(F.col("src").alias("node")).distinct().localCheckpoint()
    )
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
