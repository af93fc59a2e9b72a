"""Deduplication operators for web-scale corpora.

- exact_duplicates: hash-groupBy (one shuffle, map-side partial agg)
- shingles / minhash_signatures: MinHash entirely JVM-side — shingle
  explode + 64 ``min(xxhash64(shingle, seed))`` aggregates (no Python)
- lsh_candidate_pairs: banding → bucket self-join → pair dedup; the
  classic MinHash-LSH plan where only same-bucket pairs shuffle
- ngram_jaccard_pairs: exact verification join for candidate pairs
- simhash64: vectorized pandas UDF (numpy bit-twiddling, Arrow batches)

Scale notes: the LSH self-join keys on (band, band_hash) so the shuffle
volume is O(candidate buckets), not O(n²); skewed buckets (boilerplate
docs) are capped with a per-bucket limit before pairing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from secretscraper_spark.operators.textstats import WS_SPLIT_PATTERN
from pyspark.sql import types as T


def portable_hash64(col: F.Column | str, seed: int | None = None) -> F.Column:
    """Dialect-portable 60-bit hash: the first 15 hex chars of md5 as a
    bigint. Bit-identical in Spark (``conv(substring(md5(x),1,15),16,10)``)
    and DuckDB (``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``), so
    hash-dependent operators run under the DuckDB oracle gate. The
    production default stays ``xxhash64`` (non-cryptographic, ~10× faster,
    JVM codegen) — this mode exists so the SAME pipeline (banding, bucket
    join, pair logic) is value-checked end-to-end by an independent engine.
    ``seed`` is folded in by suffixing ``\\x01<seed>`` before hashing."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(c.cast("string"), F.lit("\x01" + str(seed)))
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def mode_hash64(
    col: F.Column | str, mode: str, seed: int | None = None
) -> F.Column:
    """The portable/fast hash-mode dispatch shared by every seeded-bucket
    operator (sampling splits, DSIR feature hashing): ``'portable'`` =
    md5-prefix (`portable_hash64`, oracle-exact), ``'fast'`` = xxhash64
    (JVM codegen, production default). Seed folding uses the same
    ``\\x01<seed>`` suffix convention in both modes — keep it HERE only."""
    c = F.col(col) if isinstance(col, str) else col
    if mode == "portable":
        return portable_hash64(c, seed=seed)
    if mode == "fast":
        c = c.cast("string")
        if seed is not None:
            c = F.concat(c, F.lit("\x01" + str(seed)))
        return F.xxhash64(c)
    raise ValueError(f"mode {mode!r}")


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical texts (md5 key), one row per group size>1."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """RefinedWeb/CCNet-style line-level boilerplate removal: a line whose
    EXACT text appears in >= *min_df* distinct documents (nav bars, cookie
    banners, template headers) is removed from EVERY document. Returns one
    row per input doc: (doc_id, text, n_lines, n_removed) — docs whose
    every line is boilerplate keep an empty text.

    Plan shape (100 TB): posexplode lines (no shuffle) → line document-
    frequency via two-phase count-distinct (map-side partial agg; the
    boilerplate side is tiny — only lines crossing min_df survive) →
    left_anti join routes kept lines → order-preserving reassembly with
    sort_array(collect_list(struct(pos, line))) — one hash agg, no window.
    *sep* must be a single literal character (used as both split regex and
    join separator)."""
    did = F.col(id_col)
    lines = df.select(
        did.alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    boilerplate = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("line_df"))
        .filter(F.col("line_df") >= min_df)
        .select("line")
    )
    kept = lines.join(boilerplate, "line", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("kept_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = df.select(
        did.alias("doc_id"),
        F.size(F.split(F.col(text_col), sep)).cast("long").alias("n_lines"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("kept_text"), F.lit("")).alias("text"),
        "n_lines",
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long").alias("n_removed"),
    )


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Word k-gram shingles per doc: explode over a JVM-side transform.

    The token array is let-bound (transform over a 1-element array) so the
    regex split runs once per row — an expression referenced inside a HOF
    lambda body is otherwise re-evaluated on every lambda iteration.

    Empty tokens are filtered and docs with fewer than *k* tokens emit NO
    shingles: without both guards an empty/whitespace-only text produced
    the degenerate '' shingle, making every pair of empty docs Jaccard
    1.0 (and every empty doc a contamination hit against an empty bench
    item)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), WS_SPLIT_PATTERN),
        lambda t: t != "",
    )

    def _grams(tk):
        return F.when(
            F.size(tk) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - k),
                lambda i: F.array_join(F.slice(tk, i + 1, k), " "),
            ),
        ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))

    grams = F.element_at(F.transform(F.array(toks), _grams), 1)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(grams)).alias("shingle"),
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 64, hash_mode: str = "xxhash64"
) -> DataFrame:
    """doc_id → minhash signature columns mh0..mh{H-1}; pure JVM aggregate
    with map-side combine (one shuffle on doc_id). ``hash_mode='portable'``
    swaps xxhash64 for :func:`portable_hash64` so the whole pipeline is
    checkable against the DuckDB oracle (same plan shape, slower hash)."""
    if hash_mode == "portable":
        aggs = [
            F.min(portable_hash64("shingle", seed=i)).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
        return sh.groupBy("doc_id").agg(*aggs)
    # Fast mode hashes each shingle STRING once and derives the H per-seed
    # hashes from the 8-byte base (`xxhash64(base, i)` — still full avalanche
    # mixing, the datasketch/one-permutation family shape). Per-shingle
    # map-side cost drops from H string hashes to 1 string hash + H
    # fixed-width hashes — at corpus scale the string hashing IS the minhash
    # map cost. Statistically each derived hash is an independent-seed hash
    # of an injective-in-practice 64-bit fingerprint of the shingle.
    pre = sh.withColumn("_h", F.xxhash64("shingle"))
    aggs = [
        F.min(F.xxhash64("_h", F.lit(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return pre.groupBy("doc_id").agg(*aggs)


def _band_signatures(
    sig: DataFrame, num_hashes: int, bands: int, max_bucket: int,
    hash_mode: str, extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Shared banding stage: (doc_id, sig array, band, band_hash) with the
    per-bucket cap applied (pathological-bucket / boilerplate skew guard).
    ``extra_cols`` are carried through (e.g. a batch-side tag)."""
    rows = num_hashes // bands
    mh_cols = [F.col(f"mh{i}") for i in range(num_hashes)]

    def band_hash(b: int) -> F.Column:
        cols = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        if hash_mode == "portable":
            return portable_hash64(F.concat_ws("\x01", *cols))
        return F.xxhash64(*cols)

    banded = sig.select(
        "doc_id",
        *extra_cols,
        F.array(*mh_cols).alias("sig"),
        F.posexplode(
            F.array(*[band_hash(b) for b in range(bands)])
        ).alias("band", "band_hash"),
    )
    w_rank = F.row_number().over(
        Window.partitionBy("band", "band_hash").orderBy("doc_id")
    )
    return banded.withColumn("rk", w_rank).filter(F.col("rk") <= max_bucket)


def _est_jaccard(
    num_hashes: int, sig_a: F.Column | str = "sig_a", sig_b: F.Column | str = "sig_b"
) -> F.Column:
    agree = F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v)
    )
    return F.round(agree / F.lit(float(num_hashes)), 6)


def lsh_candidate_pairs(
    sig: DataFrame, num_hashes: int = 64, bands: int = 16,
    max_bucket: int = 200, hash_mode: str = "xxhash64",
) -> DataFrame:
    """Band the signatures, self-join buckets, emit candidate (a<b) pairs
    with the fraction of agreeing minhashes as the jaccard estimate.

    est_jaccard is computed IN the join projection, before the cross-band
    dedup: the distinct then carries three scalars per row instead of two
    H-element signature arrays (which would both bloat the dedup exchange
    ~40× and force a SortAggregate — hash aggregation does not take array
    grouping buffers). est_jaccard is deterministic per pair, so
    distinct-on-all-columns ≡ dropDuplicates on the pair key."""
    banded = _band_signatures(sig, num_hashes, bands, max_bucket, hash_mode)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            _est_jaccard(num_hashes, F.col("a.sig"), F.col("b.sig"))
            .alias("est_jaccard"),
        )
        .distinct()
    )


def incremental_lsh_pairs(
    new_sig: DataFrame, index_sig: DataFrame, num_hashes: int = 64,
    bands: int = 16, max_bucket: int = 200, hash_mode: str = "xxhash64",
) -> DataFrame:
    """Near-dup candidates of an INCOMING batch against an existing corpus
    signature index, plus within-batch pairs — the daily-ingest dedup shape
    at 100 TB. The corpus is never self-joined again: only buckets the new
    batch lands in produce work, so cost is O(batch × collision), not
    O(corpus²). At scale the index side is the PERSISTED banded form
    (bucketed by (band, band_hash) in storage, e.g. an Iceberg table
    partitioned on band) so each ingest pays one co-located join; here it
    is banded inline. The per-bucket cap is applied over the union of both
    sides (identical semantics to whole-corpus banding when new ∪ index
    partitions the corpus — what the DuckDB oracle checks).

    Returns ``(doc_new, doc_match, match_side 'index'|'new', est_jaccard)``
    — one row per candidate pair, new-vs-new pairs emitted once with
    ``doc_new < doc_match``. ``doc_id`` spaces of the two sides must be
    disjoint."""
    tagged = index_sig.withColumn("side", F.lit("index")).unionByName(
        new_sig.withColumn("side", F.lit("new"))
    )
    banded = _band_signatures(
        tagged, num_hashes, bands, max_bucket, hash_mode, extra_cols=("side",)
    )
    a = banded.alias("a")
    b = banded.alias("b")
    a_new = F.col("a.side") == "new"
    pairs = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(a_new | (F.col("b.side") == "new"))
        .select(
            F.when(a_new, F.col("a.doc_id")).otherwise(F.col("b.doc_id"))
            .alias("doc_new"),
            F.when(a_new, F.col("b.doc_id")).otherwise(F.col("a.doc_id"))
            .alias("doc_match"),
            F.when(a_new & (F.col("b.side") == "new"), F.lit("new"))
            .otherwise(F.lit("index")).alias("match_side"),
            # computed pre-dedup so the distinct ships scalars, not the two
            # signature arrays (see lsh_candidate_pairs) — match_side and
            # est_jaccard are both deterministic per (doc_new, doc_match)
            _est_jaccard(num_hashes, F.col("a.sig"), F.col("b.sig"))
            .alias("est_jaccard"),
        )
        .distinct()
    )
    return pairs.select("doc_new", "doc_match", "match_side", "est_jaccard")


def incremental_keep_ids(
    new_sig: DataFrame, pairs: DataFrame, min_est: float = 0.8
) -> DataFrame:
    """New-batch docs to APPEND to the index after incremental dedup: drop
    any new doc matching the index at ≥ ``min_est``, and of each
    within-batch pair keep the smaller id (greedy, deterministic; run the
    connected-components canonicalization instead when cluster-level
    choice matters — see graph.connected_components/canonical pick)."""
    hot = pairs.filter(F.col("est_jaccard") >= min_est)
    drop = (
        hot.filter(F.col("match_side") == "index").select(F.col("doc_new").alias("doc_id"))
        .unionByName(
            hot.filter(F.col("match_side") == "new")
            .select(F.col("doc_match").alias("doc_id"))
        )
        .distinct()
    )
    return new_sig.select("doc_id").join(drop, "doc_id", "left_anti")


def exact_jaccard_pairs(
    sh: DataFrame, min_jaccard: float = 0.5, max_df: int | None = None
) -> DataFrame:
    """Exact shingle-set Jaccard for every pair sharing ≥1 shingle, via an
    inverted-index self-join on the shingle (shuffle is O(postings²) per
    shingle, NOT O(n²) over docs — the scalable exact-dedup plan).

    ``max_df`` optionally drops shingles occurring in more than that many
    docs (stopword-shingle skew guard) — leave None for oracle-exact runs.
    """
    if max_df is not None:
        keep = sh.groupBy("shingle").count().filter(F.col("count") <= max_df)
        sh = sh.join(keep.select("shingle"), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    # sizes is one row per doc — NOT broadcastable at 10^9 docs; let AQE
    # pick broadcast when it fits, sort-merge otherwise
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
    return out.filter(jac >= min_jaccard).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


def mirror_hosts(
    df: DataFrame,
    host_col: str = "source",
    fp_col: str | None = None,
    text_col: str = "text",
    min_jaccard: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Cross-host mirror detection: host pairs whose CONTENT fingerprint
    sets overlap by Jaccard ≥ *min_jaccard* — mirror farms and scraped
    re-hosts are host-level phenomena (the within-host signal is
    `textstats.source_reputation`'s dup_frac; this is the across-host
    complement every crawl-curation pass needs before counting a
    "source" as independent).

    Plan shape (the ngram-jaccard inverted-index scheme, host-keyed):
    distinct (host, fp) postings → self-join on fp with ``host_a <
    host_b`` → per-pair intersection count → broadcast-join each side's
    set size → exact ``|∩| / (|A|+|B|−|∩|)``. Cost is Σ postings² per
    fingerprint — fine because a fingerprint's posting list is the
    number of HOSTS carrying that content; ``max_df`` drops
    boilerplate fingerprints carried by more than *max_df* hosts (the
    standard skew guard, same contract as ngram candidates). Output:
    (host_a, host_b, n_inter, n_a, n_b, jaccard round 6).

    *fp_col* names a precomputed fingerprint column; default derives
    `textstats.fingerprint` (whitespace-normalized md5) from *text_col*."""
    if fp_col is None:
        from .textstats import fingerprint

        postings = df.select(
            F.col(host_col).alias("host"),
            fingerprint(F.col(text_col)).alias("fp"),
        )
    else:
        postings = df.select(
            F.col(host_col).alias("host"), F.col(fp_col).alias("fp")
        )
    postings = postings.distinct()
    if max_df is not None:
        hot = (
            postings.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("fp")
        )
        postings = postings.join(F.broadcast(hot), "fp", "left_anti")
    # sizes AFTER the prune: jaccard stays exact over the (optionally
    # pruned) fingerprint universe rather than mixing universes
    sizes = postings.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    a = postings.select(F.col("host").alias("host_a"), "fp")
    b = postings.select(F.col("host").alias("host_b"), "fp")
    inter = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("host").alias("host_a"),
                                     F.col("n").alias("n_a"))),
            "host_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("host").alias("host_b"),
                                     F.col("n").alias("n_b"))),
            "host_b",
        )
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("host_a", "host_b", "n_inter", "n_a", "n_b", "jaccard")
    )


def ngram_jaccard_pairs(
    sh: DataFrame, candidates: DataFrame
) -> DataFrame:
    """Exact shingle-set jaccard for candidate pairs (verification join)."""
    sets = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("sset"))
    out = (
        candidates.join(sets.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("sset", "set_a")
        .join(sets.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("sset", "set_b")
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size(F.array_union("set_a", "set_b"))
    return out.select(
        "doc_a", "doc_b",
        F.round(inter / F.greatest(union, F.lit(1)).cast("double"), 6).alias("jaccard"),
    )


_SIMHASH_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("simhash", T.LongType())]
)


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over whitespace tokens (vectorized numpy in an Arrow
    batch; FNV-1a token hashes for determinism across workers)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_hash = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").lower().split()
                if not toks:
                    out_ids.append(doc_id)
                    out_hash.append(0)
                    continue
                hs = np.fromiter(
                    (_fnv1a64(t) for t in toks), dtype=np.uint64, count=len(toks)
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
                v = (2 * bits - 1).sum(axis=0)
                sh = np.uint64(0)
                for i in range(64):
                    if v[i] > 0:
                        sh |= np.uint64(1) << np.uint64(i)
                out_ids.append(doc_id)
                out_hash.append(int(sh.astype(np.int64)))
            yield pd.DataFrame({"doc_id": out_ids, "simhash": out_hash})

    return df.select(F.col(id_col).cast("long").alias(id_col), text_col).mapInPandas(
        compute, _SIMHASH_SCHEMA
    )


def contamination_pairs(
    docs: DataFrame, bench: DataFrame, k: int = 3, min_overlap: int = 1,
    id_col: str = "doc_id", text_col: str = "text",
    bench_id_col: str = "doc_id", bench_text_col: str = "text",
    max_df: int | None = None, broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: training docs sharing ≥ ``min_overlap``
    distinct word k-gram shingles with an evaluation/benchmark set —
    the standard leak check run before training on a scraped corpus
    (drop or flag every (doc, bench item) hit).

    Plan shape at 100 TB: the corpus side streams through an inverted-
    index hash join on the shingle; the benchmark side is an evaluation
    set (10^3-10^6 rows), broadcast by default so NO shuffle of the
    corpus ever happens — the whole check is one map-side join plus a
    partial-agg count. ``max_df`` drops benchmark shingles appearing in
    more than that many benchmark items first (stopword-ish grams that
    would match everything and hide real leaks in noise)."""
    d = shingles(docs, id_col, text_col, k)
    b = shingles(bench, bench_id_col, bench_text_col, k).withColumnRenamed(
        "doc_id", "bench_id"
    )
    if max_df is not None:
        ok = (
            b.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        b = b.join(ok, "shingle")
    if broadcast_bench:
        b = F.broadcast(b)
    return (
        d.join(b, "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )


def connected_components(
    pairs: DataFrame, col_a: str = "doc_a", col_b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair list → ``(doc_id,
    component_id)`` where component_id is the minimum id reachable — the
    pairs→groups→canonical step every dedup pipeline needs after LSH/
    SimHash/Jaccard pair generation (keep ``doc_id == component_id`` as the
    canonical copy, drop the rest).

    Min-label propagation (the MapReduce CC family of Rastogi et al.,
    "Finding Connected Components in Map-Reduce in Logarithmic Rounds"):
    every round each node adopts ``min(own, neighbors')`` label; converges
    in graph-diameter rounds. Near-dup graphs are dense low-diameter
    clusters (banding emits most intra-cluster pairs directly), so a
    handful of rounds suffice; a pathological 10^9-link chain would need
    the star-contraction variant instead. Each round is one shuffle join +
    one partial-agg groupBy (map-side combine on the min), with the label
    frame localCheckpointed so lineage doesn't stack across rounds. The
    per-round driver work is one O(1) convergence probe — no collect of
    data. Only ids present in ``pairs`` appear; union singletons back at
    the call site (see __spark_entry__.q_dedup_groups)."""
    edges = (
        pairs.select(F.col(col_a).alias("u"), F.col(col_b).alias("v"))
        .union(pairs.select(F.col(col_b).alias("u"), F.col(col_a).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select("u").distinct()
        .select(F.col("u").alias("id"), F.col("u").alias("label"))
        .localCheckpoint()
    )
    changed = 1
    for _ in range(max_iter):
        msgs = (
            edges.alias("e")
            .join(labels.alias("l"), F.col("e.v") == F.col("l.id"))
            .select(F.col("e.u").alias("id"), F.col("l.label").alias("label"))
        )
        new_labels = (
            labels.union(msgs)
            .groupBy("id").agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # a silently-unconverged result is indistinguishable from a correct
        # one (labels just stop short of the true minimum) — refuse it
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter; raise max_iter or use a "
            "star-contraction variant for chain-shaped graphs)"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("component_id")
    )


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_catalyst(
    df: DataFrame, id_col: str, text_col: str, bits: int = 60
) -> DataFrame:
    """SimHash computed ENTIRELY in Catalyst expressions (no Python at
    all): token hashes via :func:`portable_hash64`, per-bit ±1 vote sums
    via nested higher-order aggregates, bits set where the vote is
    positive. 60 bits (the md5-prefix hash width) instead of the numpy
    kernel's 64 — the banding/pigeonhole math is identical with 4×15-bit
    blocks. Dialect-portable: the DuckDB oracle computes the same value
    with list_transform/list_sum, so this variant runs under the value
    gate; :func:`simhash64` (FNV-1a + numpy, Arrow-batched) remains the
    wider production kernel, pytest-pinned against brute force."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), WS_SPLIT_PATTERN), lambda x: x != ""
    )
    th = F.transform(toks, lambda t: portable_hash64(t))

    # LET-BINDING (transform over a 1-element array): naming `th` inside
    # the per-bit lambda would re-hash every token for each of the 60 bits
    # — Catalyst re-evaluates expressions referenced in lambda bodies on
    # every iteration (no CSE across HOF lambdas). Binding th as a lambda
    # variable hashes each token once per row.
    def _simhash(bound):
        # vote(j) = sum over tokens of +1/-1 for bit j; bit set iff > 0
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: acc
            + F.when(
                F.aggregate(
                    bound,
                    F.lit(0).cast("long"),
                    # call_function: the shiftright/shiftleft PySpark
                    # wrappers take int shift amounts only, but j is a
                    # lambda Column
                    lambda a, h: a
                    + F.when(
                        F.call_function("shiftright", h, j).bitwiseAND(
                            F.lit(1)
                        )
                        == 1,
                        F.lit(1),
                    ).otherwise(F.lit(-1)),
                )
                > 0,
                F.call_function("shiftleft", F.lit(1).cast("long"), j),
            ).otherwise(F.lit(0).cast("long")),
        )

    sh = F.element_at(F.transform(F.array(th), _simhash), 1)
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"), sh.alias("simhash")
    )


def simhash_near_dups(
    sim: DataFrame, max_hamming: int = 3, block_bits: int = 16,
    max_block_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ k via 4-block banding
    (pigeonhole: ≤3 differing bits → at least one block equal).
    ``block_bits=16`` covers the 64-bit numpy kernel; pass 15 for the
    60-bit Catalyst variant.

    Completeness contract: EXACT for ``max_hamming ≤ 3`` (the pigeonhole
    guarantee). For larger thresholds this is classic LSH semantics —
    "pairs within hamming ≤ k AMONG banding candidates" — a pair differing
    in ≥1 bit in every block is never generated; recall is input-dependent.
    Callers needing guaranteed recall at k > 3 must band into k+1 blocks.

    ``max_block_df`` is the hot-block skew guard for the 100 TB regime: a
    degenerate hash value shared by millions of rows (blank images → one
    phash, empty documents → simhash 0) turns its ``(block, block_val)``
    bucket into an O(n²) self-join hot key. When set, blocks whose document
    frequency exceeds the cap are dropped BEFORE the join (same contract as
    ``lsh_candidate_pairs(max_bucket=...)`` / ``exact_jaccard_pairs
    (max_df=...)``: a pair only survives via some non-degenerate block;
    exact when None, the default)."""
    mask = (1 << block_bits) - 1
    blocks = F.array(*[
        F.shiftrightunsigned(F.col("simhash"), i * block_bits).bitwiseAND(F.lit(mask))
        for i in range(4)
    ])
    banded = sim.select(
        "doc_id", "simhash", F.posexplode(blocks).alias("block", "block_val")
    )
    if max_block_df is not None:
        ok = (
            banded.groupBy("block", "block_val")
            .agg(F.count(F.lit(1)).alias("block_df"))
            .filter(F.col("block_df") <= max_block_df)
            .select("block", "block_val")
        )
        banded = banded.join(ok, ["block", "block_val"])
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, ["block", "block_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def positional_grams(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 8
) -> DataFrame:
    """(doc_id, pos, gram): every FULL word k-gram with its 0-based token
    position (unlike :func:`shingles`, positions are kept and partial
    trailing grams are excluded — span arithmetic needs exact windows).
    Empty tokens are dropped BEFORE positioning so coordinates agree with
    :func:`strip_spans`'s canonical tokenization regardless of leading /
    repeated whitespace. JVM-only: one let-bound transform per row, then
    posexplode."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), WS_SPLIT_PATTERN), lambda x: x != ""
    )

    def _grams(tk):
        return F.when(
            F.size(tk) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - k),
                lambda i: F.array_join(F.slice(tk, i + 1, k), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    grams = F.element_at(F.transform(F.array(toks), _grams), 1)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(grams).alias("pos", "gram"),
    )


def duplicate_spans(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, min_df: int = 2, max_gram_df: int | None = None,
    join_on_hash: bool = False,
) -> DataFrame:
    """ExactSubstr-style duplicate-span detection (the span-level dedup of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): a token k-gram window whose exact text occurs in >=
    ``min_df`` DISTINCT documents marks the token interval ``[pos,
    pos+k)``; overlapping/touching marked windows merge into maximal
    spans. Returns one row per merged span: ``(doc_id, span_start,
    span_end)`` — 0-based token coordinates, end exclusive. The reference
    work uses a corpus suffix array; the distributed re-expression swaps
    it for a positional-gram inverted index, which finds exactly the
    duplicated regions of length >= k (shorter overlaps are below the
    dedup threshold by construction).

    Plan shape at 100 TB: posexplode k-grams (no shuffle) -> gram document
    frequency via two-phase distinct-count (groupBy(gram, doc_id) then
    groupBy(gram), both with map-side partial agg — no count_distinct
    Expand) -> semi join routes only duplicated positions onward (the
    surviving set is corpus-overlap-sized, not corpus-sized) -> per-doc
    interval merge as a pure-Catalyst aggregate over sort_array(
    collect_list(pos)) — one hash agg, no window. ``max_gram_df`` is the
    boilerplate skew guard: grams above that document frequency (page
    templates shared by millions of docs) are dropped before the join —
    exact when None.

    ``join_on_hash`` replaces the gram TEXT with ``xxhash64(gram)`` as
    the frequency/join key: at 10^12 grams the two gram shuffles carry 8
    bytes/row instead of ~k tokens of text (~10× shuffle-volume cut).
    The trade is exactness: a 64-bit collision can mark a span that is
    not truly duplicated (expected collisions ≈ n²/2^65 — about 0.03
    spurious PAIRS at 10^9 distinct grams); False (default) keeps the
    operator exact and oracle-checkable."""
    grams = positional_grams(df, id_col, text_col, k)
    if join_on_hash:
        grams = grams.select("doc_id", "pos", F.xxhash64("gram").alias("gram"))
    gram_df = (
        grams.select("gram", "doc_id").distinct()
        .groupBy("gram").agg(F.count(F.lit(1)).alias("gram_docs"))
        .filter(F.col("gram_docs") >= min_df)
    )
    if max_gram_df is not None:
        gram_df = gram_df.filter(F.col("gram_docs") <= max_gram_df)
    marked = grams.join(gram_df.select("gram"), "gram", "left_semi")

    empty = F.array().cast("array<struct<s:int,e:int>>")

    def _merge(acc, p):
        last = F.element_at(acc, -1)
        win = F.struct(p.alias("s"), (p + k).alias("e"))
        grown = F.struct(
            last["s"].alias("s"), F.greatest(last["e"], p + k).alias("e")
        )
        return (
            F.when(F.size(acc) == 0, F.array(win))
            .when(
                last["e"] >= p,
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(grown)),
            )
            .otherwise(F.concat(acc, F.array(win)))
        )

    merged = marked.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.col("pos").cast("int"))), empty, _merge
        ).alias("spans")
    )
    return merged.select(
        "doc_id", F.explode("spans").alias("sp")
    ).select(
        "doc_id",
        F.col("sp.s").alias("span_start"),
        F.col("sp.e").alias("span_end"),
    )


def strip_spans(
    df: DataFrame, spans: DataFrame, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove the token intervals in *spans* (the :func:`duplicate_spans`
    output) from each document: tokens whose position falls inside any
    span are dropped, the rest re-join with single spaces (the dedup
    pipeline's destructive step — run after human/threshold review).
    Returns (doc_id, text, n_tokens, n_removed). Docs without spans pass
    through re-tokenized (lowercased, whitespace-normalized — same
    canonical form the gram index saw).

    One groupBy on the (small) span side, one join, then pure-Catalyst
    position filtering with a let-bound span array — no window, no
    Python."""
    span_arrays = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct(
            F.col("span_start").alias("s"), F.col("span_end").alias("e")
        )).alias("spans")
    )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), WS_SPLIT_PATTERN), lambda x: x != ""
    )
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    joined = base.join(span_arrays, "doc_id", "left").select(
        "doc_id", "toks",
        F.coalesce("spans", F.array().cast("array<struct<s:int,e:int>>"))
        .alias("spans"),
    )
    covered = lambda sp, i: F.exists(sp, lambda v: (v["s"] <= i) & (i < v["e"]))
    kept = F.zip_with(
        F.col("toks"),
        F.sequence(F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0))),
        lambda t, i: F.when(~covered(F.col("spans"), i), t),
    )
    kept = F.filter(kept, lambda t: t.isNotNull())
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("text"),
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
    )


def canonical_by_quality(
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    component_col: str = "component_id",
    score_col: str = "score",
) -> DataFrame:
    """Pick the keeper per dedup cluster: given :func:`connected_components`
    output and a per-doc quality score (``textstats.quality_features`` /
    ``bigram_lm_scores``), return (component_id, canonical_id, n_docs) —
    the highest-scoring member wins, lowest doc_id breaks ties
    (deterministic). This replaces the min-id canonical choice with the
    quality-aware one every production dedup pipeline actually ships.

    One join + one max_by aggregate (map-side partial agg; the tiebreak
    rides inside the ordered struct, so no window, no second pass)."""
    s = scores.select(
        F.col(id_col).alias("s_doc_id"), F.col(score_col).alias("score")
    )
    # LEFT join: an unscored member (e.g. bigram_lm_scores emits no row
    # for <2-token docs) must still count in n_docs and must never make
    # a whole component vanish — it just loses every score comparison
    j = components.join(
        s, components[id_col] == s["s_doc_id"], "left"
    ).select(
        F.col(component_col).alias("component_id"),
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col("score"), F.lit(float("-inf"))).alias("score"),
    )
    # max_by on (score, -doc_id): ties on score resolve to the SMALLEST id
    key = F.struct(F.col("score"), (-F.col("doc_id")).alias("neg_id"))
    return j.groupBy("component_id").agg(
        F.max_by("doc_id", key).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def pair_metrics(
    candidates: DataFrame,
    truth: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Pair-level quality of a sketch's duplicate claims against exact
    ground truth — precision/recall/F1 of a candidate near-dup pair table
    (``lsh_candidate_pairs``, ``simhash_near_dups``, phash banding) versus
    the exact answer (``exact_jaccard_pairs`` at the target threshold).
    This is the dedup twin of ``retrieval.recall_at_k``: the number a
    pipeline owner needs BEFORE trusting a sketch to delete data at
    100 TB, measured as a relational op on a sample instead of a
    notebook afterthought.

    Both inputs are normalized to distinct unordered pairs (least,
    greatest), so orientation and accidental duplicates cannot skew the
    counts. Returns ONE row: ``n_candidates``, ``n_truth``, ``n_hits``,
    and fixed-point ``precision_micro`` (hits/candidates),
    ``recall_micro`` (hits/truth), ``f1_micro`` — all integer DIV of
    BIGINTs (2·h·1e6 DIV (c+t) for F1, exact because P and R share the
    numerator), so independent engines agree bit-for-bit.

    Plan: two distinct-aggregates + one join, every frame pair-table
    sized (the corpus is never touched); counts are map-side-combined
    single-row aggregates."""
    lo_a, hi_b = F.least(F.col(a_col), F.col(b_col)), F.greatest(
        F.col(a_col), F.col(b_col)
    )
    c = candidates.select(lo_a.alias("__a"), hi_b.alias("__b")).distinct()
    t = truth.select(lo_a.alias("__a"), hi_b.alias("__b")).distinct()
    n_c = c.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_t = t.agg(F.count(F.lit(1)).alias("n_truth"))
    n_h = c.join(t, ["__a", "__b"]).agg(F.count(F.lit(1)).alias("n_hits"))
    m = F.lit(1_000_000).cast("long")
    ratio = lambda num, den: F.expr(  # noqa: E731
        f"CASE WHEN {den} > 0 THEN ({num}) DIV ({den}) ELSE 0 END"
    ).cast("long")
    return (
        n_c.crossJoin(n_t)
        .crossJoin(n_h)
        .withColumn("__m", m)
        .select(
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n_hits").cast("long").alias("n_hits"),
            ratio("n_hits * __m", "n_candidates").alias("precision_micro"),
            ratio("n_hits * __m", "n_truth").alias("recall_micro"),
            ratio("2 * n_hits * __m", "n_candidates + n_truth").alias("f1_micro"),
        )
    )
