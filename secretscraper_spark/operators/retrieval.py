"""Full-text retrieval operators (BM25 inverted-index search).

The curation loop needs search, not just filtering: "find the documents
that answer these probe queries" powers decontamination audits (which
training docs match an eval question), targeted quality review, and
retrieval-based data selection (DSIR-style). This module re-expresses the
classic Okapi BM25 ranked search as Spark aggregates + one broadcast
probe join — no per-row Python, no corpus self-join.

Determinism contract (shared with the DuckDB oracle gate): the libm-
dependent factor (idf's ``ln``) is rounded to 6 decimals, every per-term
contribution is converted to a fixed-point BIGINT before summation, and
ranking ties break on doc_id — so two independent engines produce
bit-identical rankings regardless of partition layout or summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from secretscraper_spark.operators.textstats import _word_arrays

# fixed-point scale for BM25 contribution sums: contributions are
# round(x * SCALE) BIGINTs so the per-(query, doc) sum is exact integer
# arithmetic — float addition order can never flip a ranking or diverge
# the cross-engine value gate.
_FP_SCALE = 1_000_000


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    max_df: int | None = None,
) -> DataFrame:
    """Okapi BM25 top-k search: rank *docs* for every query in *queries*.

    ``idf = round(ln(1 + (N - df + 0.5)/(df + 0.5)), 6)`` (Lucene's
    always-positive variant), ``tfnorm = tf*(k1+1) / (tf + k1*(1 - b +
    b*dl/avgdl))``; a document's score for a query is the sum of
    ``idf*tfnorm`` over the query's DISTINCT terms (query-side term
    multiplicity is ignored, the common implementation choice). Output:
    ``(query_id, doc_id, score, rk)`` with ``rk <= top_k`` per query,
    ties broken by ascending doc_id on the fixed-point score.

    Plan shape (scales to 100 TB of docs × a bounded probe set):
    - postings: explode → hash-agg on (doc_id, term) with map-side
      combine, carrying doc length via ``max`` (constant per doc) so the
      corpus is never re-joined for lengths.
    - document frequency: vocabulary-sized roll-up of the postings agg
      (no count_distinct Expand).
    - the probe side (query terms ⋈ df-stats) is queries×terms-sized —
      explicitly ``broadcast`` onto the postings, so the corpus-sized
      postings table is probed in place with NO shuffle; only the
      matched postings (Σ df over query terms) flow into the final
      (query_id, doc_id) agg and the per-query ranking window.
    - ``max_df`` drops stopword-grade terms at the df roll-up — the
      skew guard: a term matching half the corpus would otherwise fan
      the probe join out to corpus scale (same role as n-gram
      Jaccard's ``max_df`` / LSH's bucket cap).

    N and total token count are one driver-side agg (two scalars — the
    same cost class as tfidf_top_terms' N); avgdl is their exact integer
    quotient so both engines compute the identical double.
    """
    arrs = _word_arrays(docs, id_col, text_col)
    with_dl = arrs.select(
        "doc_id", F.size("arr").alias("dl"), F.explode("arr").alias("term")
    )
    postings = with_dl.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.max("dl").cast("long").alias("dl"),
    )
    stats = arrs.select(F.size("arr").alias("dl")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n_docs, total_tokens = int(stats["n"]), int(stats["total"] or 0)
    avgdl = total_tokens / n_docs if n_docs else 1.0

    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ),
        6,
    ).alias("idf")

    qterms = _word_arrays(queries, qid_col, qtext_col).select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.array_distinct("arr")).alias("term"),
    )
    probe = qterms.join(dfreq.select("term", idf), "term")

    k1p1 = k1 + 1.0
    tfd = F.col("tf").cast("double")
    tfnorm = (tfd * F.lit(k1p1)) / (
        tfd
        + F.lit(k1)
        * (
            F.lit(1.0)
            - F.lit(b)
            + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
        )
    )
    contrib = F.round(F.col("idf") * tfnorm * F.lit(float(_FP_SCALE)), 0).cast(
        "long"
    )

    matched = postings.join(F.broadcast(probe), "term").select(
        "query_id", "doc_id", contrib.alias("c")
    )
    scored = matched.groupBy("query_id", "doc_id").agg(F.sum("c").alias("c"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("c").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(
            "query_id",
            "doc_id",
            (F.col("c").cast("double") / F.lit(float(_FP_SCALE))).alias("score"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


def hard_negatives(
    docs: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    *,
    top_k: int = 10,
    skip_top: int = 0,
    broadcast_positives: bool = True,
    **bm25_kwargs,
) -> DataFrame:
    """BM25 hard-negative mining for embedding/reranker training (the
    DPR recipe, Karpukhin et al. 2020): for each query, the highest-
    ranked documents that are NOT labeled positives. *positives* is a
    ``(query_id, doc_id)`` pair table; *skip_top* additionally skips the
    first *skip_top* NEGATIVES (the near-duplicates most likely to be
    unlabeled true positives — the standard false-negative guard).

    Returns ``(query_id, doc_id, score, neg_rank)`` with ``skip_top <
    neg_rank <= skip_top + top_k`` (``neg_rank`` counts within the
    non-positive ranking, so the skip offset stays visible).

    Plan: one `bm25_search` with the retrieval window widened by
    ``skip_top + max positives per query`` (so removing positives can
    never starve the negative set), a broadcast LEFT ANTI against the
    pair table, and a probe-set-sized re-rank window. The corpus-side
    cost is exactly one BM25 pass; the anti-join and window touch only
    the retrieved window (queries × window rows)."""
    pos = positives.select(
        F.col(positives.columns[0]).alias("query_id"),
        F.col(positives.columns[1]).alias("doc_id"),
    )
    p_max = pos.groupBy("query_id").count().agg(F.max("count")).collect()[0][0]
    window = top_k + skip_top + int(p_max or 0)
    ranked = bm25_search(docs, queries, top_k=window, **bm25_kwargs)
    anti_side = F.broadcast(pos) if broadcast_positives else pos
    negs = ranked.join(anti_side, ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.col("rk").asc())
    return (
        negs.withColumn("neg_rank", F.row_number().over(w))
        .filter(
            (F.col("neg_rank") > skip_top)
            & (F.col("neg_rank") <= skip_top + top_k)
        )
        .select(
            "query_id", "doc_id", "score",
            F.col("neg_rank").cast("int").alias("neg_rank"),
        )
    )


def recall_at_k(
    results: DataFrame,
    gold: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    denom: str = "gold",
) -> DataFrame:
    """Retrieval-quality evaluation: per-query recall of *results* (an
    already-cut top-k table, e.g. an ANN index's answer) against *gold*
    (the exact answer set) — the metric every approximate index in this
    repo (RP-LSH, IVF, SQ8) trades for its speed, measured as a first-
    class relational op instead of a notebook afterthought.

    ``recall_micro`` is integer fixed-point (hits × 1e6 // denominator)
    so independent engines agree bit-for-bit; *denom* is ``'gold'``
    (|gold| — classic recall) or ``'k'`` (min(|gold|, |results|) — the
    recall@k convention when gold can exceed the cut). Queries with no
    result rows still appear (n_hits = 0).

    Plan: two partial-agg groupBys on the query key + one inner join on
    (query, doc) — every frame is results/gold-sized (queries × k), never
    corpus-sized, so the evaluation is free at any corpus scale."""
    r = results.select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d")
    )
    g = gold.select(F.col(query_col).alias("__q"), F.col(doc_col).alias("__d"))
    n_gold = g.groupBy("__q").agg(F.count(F.lit(1)).alias("n_gold"))
    n_res = r.groupBy("__q").agg(F.count(F.lit(1)).alias("n_results"))
    hits = (
        r.join(g, ["__q", "__d"])
        .groupBy("__q")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = (
        n_gold.join(n_res, "__q", "left")
        .join(hits, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            "n_gold",
            F.coalesce("n_results", F.lit(0)).alias("n_results"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        )
    )
    if denom == "gold":
        d = F.col("n_gold")
    elif denom == "k":
        d = F.least("n_gold", "n_results")
    else:  # pragma: no cover - caller error
        raise ValueError(f"denom {denom!r}")
    # integer DIV, not float '/': a double quotient one ULP above an
    # integer boundary would truncate differently than the oracle's
    # exact integer division
    return (
        base.withColumn("__num", (F.col("n_hits") * F.lit(1_000_000)).cast("long"))
        .withColumn("__den", d.cast("long"))
        .withColumn(
            "recall_micro",
            F.expr("CASE WHEN __den > 0 THEN __num DIV __den ELSE 0 END").cast(
                "long"
            ),
        )
        .drop("__num", "__den")
    )
