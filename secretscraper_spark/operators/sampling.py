"""Deterministic sampling / splitting operators for training-data curation.

Every op here is JOIN-FREE and SHUFFLE-FREE on the data path (pure column
expressions over a stable key), which is what makes them usable at 100 TB:
a split assignment or sample decision must be (a) reproducible run-to-run
and machine-to-machine, (b) stable under re-partitioning, (c) independent
of row order. Spark's ``df.sample``/``randomSplit`` are none of these
(seeded per-partition RNG → resampling changes when the partition layout
does), so pipelines key decisions off a content hash instead:

- assign_split: train/val/test split via hash-bucket thresholds on a key
  column — one ``when`` chain, no shuffle, deterministic forever.
- stratified_sample: per-stratum fraction via the same bucket trick —
  e.g. downsample 'en' to 10 % while keeping all 'fr'.
- cap_per_group: per-source quota (keep at most n docs per domain/site),
  the boilerplate-source guard of corpus curation; one window (shuffle on
  the group key) with rank-by-hash so the kept subset is deterministic,
  not first-arrival.

``mode='fast'`` keys buckets on ``xxhash64`` (JVM codegen). The DuckDB
oracle gate can't reproduce xxhash64, so ``mode='portable'`` switches to
the md5-prefix hash (operators/dedup.py:portable_hash64) — same plan,
dialect-portable, value-checked end-to-end in __spark_entry__.q_split_
assign / q_stratified_sample / q_group_cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import mode_hash64

N_BUCKETS = 1_000_000


def _bucket(key_col: str, mode: str, seed: int | None = None) -> F.Column:
    """Stable bucket in [0, N_BUCKETS) from a key column. Non-negative
    modulo via pmod so Spark and the SQL oracle agree on negatives."""
    return F.pmod(mode_hash64(key_col, mode, seed), F.lit(N_BUCKETS))


def assign_split(
    df: DataFrame, key_col: str, weights: dict[str, float],
    mode: str = "fast", seed: int | None = None, out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split column ('train'/'val'/'test'/...) from
    cumulative weight thresholds over the key's hash bucket. Weights must
    sum to 1 (±1e-6). Splits are disjoint, exhaustive, and stable under
    any re-partitioning or re-run — the property randomSplit lacks."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"weights sum to {total}, expected 1.0")
    b = _bucket(key_col, mode, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = b < int(round(cum * N_BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float],
    key_col: str, mode: str = "fast", seed: int | None = None,
    default_fraction: float = 1.0,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows: a row survives
    iff its key's bucket falls below ``fraction × N_BUCKETS`` for its
    stratum (strata not listed get ``default_fraction``). Pure filter —
    no shuffle, no sampling state; rerunning or re-partitioning yields the
    IDENTICAL sample, and a row's fate never depends on other rows."""
    b = _bucket(key_col, mode, seed)
    frac = None
    for name, f_ in fractions.items():
        cond = F.col(strata_col) == name
        lit = F.lit(float(f_))
        frac = F.when(cond, lit) if frac is None else frac.when(cond, lit)
    frac = F.lit(float(default_fraction)) if frac is None else frac.otherwise(
        F.lit(float(default_fraction))
    )
    return df.filter(b < (frac * N_BUCKETS).cast("long"))


def epoch_mix(
    df: DataFrame, strata_col: str, weights: dict[str, float],
    key_col: str, mode: str = "fast", seed: int | None = None,
    default_weight: float = 1.0,
) -> DataFrame:
    """Epoch-style source mixing with weights ≥ 0 INCLUDING > 1
    (upsampling): weight w emits floor(w) full copies of every row plus
    one extra copy for the deterministic hash-fraction (w − floor(w)) of
    keys — how pretraining mixtures repeat high-quality sources ~w epochs
    (books × 2.5, web × 0.8, …). Adds ``copy`` (1-based repeat index) so a
    downstream global shuffle can interleave repeats. Zero shuffle: a CASE
    projection + explode; like every sampler here, rerunning or
    re-partitioning yields the identical mixture."""
    b = _bucket(key_col, mode, seed)
    wexpr = None
    for name, w_ in weights.items():
        cond = F.col(strata_col) == name
        lit = F.lit(float(w_))
        wexpr = F.when(cond, lit) if wexpr is None else wexpr.when(cond, lit)
    wexpr = (
        F.lit(float(default_weight)) if wexpr is None
        else wexpr.otherwise(F.lit(float(default_weight)))
    )
    n = F.floor(wexpr).cast("int") + (
        b < ((wexpr - F.floor(wexpr)) * N_BUCKETS).cast("long")
    ).cast("int")
    # sequence(1, 0) yields a DESCENDING [1, 0] — zero-copy rows must
    # short-circuit to an empty array (explode then drops them)
    copies = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("copy", F.explode(copies))


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str,
    hash_mode: str = "fast",
    seed: int = 0,
    round_to: int | None = 6,
    select_round_to: int | None = None,
) -> DataFrame:
    """Weighted random sampling without replacement (Efraimidis–Spirakis
    A-ES, IPL 2006) → the k rows with the largest ``sample_key``.

    Each row draws ``u ∈ (0,1]`` from a seeded hash of its id and keys on
    ``u^(1/w)``: the top-k by key is an exact-size-k sample with inclusion
    probability proportional to weight — the one-pass distributed form of
    "sample documents ∝ quality score" that a training-mixture builder
    needs (true weighted sampling, unlike a per-stratum rate). Rows with
    ``w <= 0`` or NULL are excluded (outside the algorithm's domain).

    Deterministic by construction: u is a pure function of (id, seed) via
    `dedup.mode_hash64` — 'portable' makes the full draw reproducible in
    an independent engine (q_weighted_sample oracle); 'fast' (xxhash64)
    is the production default. Plan: one scan + TakeOrderedAndProject
    (per-partition top-k, k-row driver merge) — the corpus is never
    shuffled, same shape as cosine_topk.

    ``select_round_to`` quantizes the SELECTION key (which rows make the
    top-k, id tiebreak below it) — pow is a transcendental whose last ulp
    is platform-dependent (JVM Math.pow is not correctly rounded; libm
    pow on modern glibc is), so an unrounded cut at the k boundary can
    flip row MEMBERSHIP across engines. Cross-engine-reproducible draws
    (hash_mode='portable' + an independent oracle) should set it (~12);
    None keeps the raw-key cut."""
    if k < 1:
        raise ValueError("weighted_sample needs k >= 1")
    M = float(1 << 31)
    h = mode_hash64(id_col, hash_mode, seed=seed)
    u = (F.pmod(h, F.lit(int(M))) + 1) / F.lit(M)  # (0, 1]
    w = F.col(weight_col).cast("double")
    key = F.pow(u, F.lit(1.0) / w)
    sel_key = (
        key if select_round_to is None else F.round(key, int(select_round_to))
    )
    out = (
        df.filter(w > 0)
        .select(
            F.col(id_col).alias("id"),
            w.alias("weight"),
            key.alias("sample_key"),
            sel_key.alias("_sel_key"),
        )
        .orderBy(F.desc("_sel_key"), F.asc("id"))
        .limit(int(k))
        .drop("_sel_key")
    )
    if round_to is not None:
        out = out.select(
            "id", "weight", F.round("sample_key", round_to).alias("sample_key")
        )
    return out


def cap_per_group(
    df: DataFrame, group_col: str, n: int, key_col: str,
    mode: str = "fast", seed: int | None = None,
) -> DataFrame:
    """Keep at most ``n`` rows per group (per-source quota), choosing the
    kept subset by hash-of-key rank so the result is deterministic and
    order-independent (ties broken by the key itself). One shuffle on the
    group key; hot groups cost one sort-within-partition, never a driver
    round-trip. The standard guard against a single boilerplate-heavy
    domain dominating a training corpus."""
    b = _bucket(key_col, mode, seed)
    w = Window.partitionBy(group_col).orderBy(b.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def token_budget_fill(
    df: DataFrame,
    source_col: str,
    tokens_col: str,
    key_col: str,
    budgets: dict[str, int],
    mode: str = "fast",
    seed: int | None = None,
    default_budget: int = 0,
    n_blocks: int = 64,
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Fill a per-source TOKEN budget deterministically: within each
    source, rows are ordered by (hash-of-key, key) and the maximal prefix
    whose inclusive running token total stays ≤ the source's budget is
    kept (the first budget-crossing row and everything after it drop).
    This is how pretraining mixtures are actually specified — "1T tokens:
    300B web, 80B code, …" — and, like every sampler here, the kept set
    is a pure function of content: identical under re-partitioning,
    re-runs, and engines. Sources not named in *budgets* get
    *default_budget* (0 = dropped entirely).

    Plan shape — a giant source ("web" is most of the corpus) would make
    a single per-source cumsum window one straggler task, so the running
    total is computed in TWO phases like `plans/ranking.assign_global_seq`:
    the hash order is cut into *n_blocks* contiguous ranges, a block-
    subtotal hash-agg (map-side combined, sources × n_blocks rows) feeds
    a tiny window that yields each block's starting offset, and the data
    pays one shuffle keyed (source, block) — per-task sort bounded to
    ~1/n_blocks of the hottest source — where offset + within-block
    cumsum gives the exact global prefix sum. Output: input columns +
    *cum_col* (the inclusive running total, for budget audits).
    """
    b = _bucket(key_col, mode, seed)
    block = F.floor((b * F.lit(int(n_blocks))) / F.lit(N_BUCKETS)).cast("int")
    base = df.withColumn("__b", b).withColumn("__blk", block).withColumn(
        "__tok", F.col(tokens_col).cast("long")
    )
    sub = base.groupBy(F.col(source_col).alias("__src"), "__blk").agg(
        F.sum("__tok").alias("__blk_tot")
    )
    off_w = (
        Window.partitionBy("__src")
        .orderBy("__blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sub.select(
        "__src",
        "__blk",
        F.coalesce(F.sum("__blk_tot").over(off_w), F.lit(0)).alias("__off"),
    )
    joined = base.join(
        F.broadcast(offsets),
        (F.col(source_col) == F.col("__src")) & (base["__blk"] == offsets["__blk"]),
    ).drop(offsets["__blk"]).drop("__src")
    cum_w = (
        Window.partitionBy(source_col, "__blk")
        .orderBy(F.col("__b").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (F.col("__off") + F.sum("__tok").over(cum_w)).alias(cum_col)
    budget = None
    for name, n_ in budgets.items():
        cond = F.col(source_col) == name
        lit = F.lit(int(n_))
        budget = F.when(cond, lit) if budget is None else budget.when(cond, lit)
    budget = (
        F.lit(int(default_budget))
        if budget is None
        else budget.otherwise(F.lit(int(default_budget)))
    )
    return (
        joined.select(*df.columns, cum)
        # budget > 0 guard: a zero-token row's inclusive cum equals the
        # prior prefix (0 at the head of the hash order), so without it a
        # 0-budget source would leak its empty/whitespace-only docs.
        .filter((budget > F.lit(0)) & (F.col(cum_col) <= budget))
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_stages: int = 4,
    mode: str = "fast",
    seed: int | None = None,
    stage_col: str = "stage",
    seq_col: str = "curriculum_seq",
) -> DataFrame:
    """Deterministic curriculum training order: rank every row globally
    by ``(score, id)`` (easy → hard; e.g. score = length for the classic
    short-first curriculum), cut the ranking into *n_stages* equal
    stages, then emit ``seq_col`` = the training order — stages in
    order, rows WITHIN a stage interleaved by key hash so no source or
    score band clumps together (the same stability contract as every
    sampler here: identical output under any partitioning, rerun, or
    engine).

    Plan: two `plans/ranking.assign_global_seq` passes (range-partitioned
    two-phase rank — never a single-task window at scale); the stage cut
    is pure integer-on-rank arithmetic, so stage sizes differ by at most
    one row. Returns the input columns + ``stage_col`` + ``seq_col``."""
    from secretscraper_spark.plans.ranking import assign_global_seq_with_count

    ranked, total = assign_global_seq_with_count(
        df, [score_col, id_col], seq_col="__rank"
    )
    stage = F.floor(
        (F.col("__rank") * F.lit(int(n_stages)))
        / F.lit(float(max(total, 1)))
    ).cast("int")
    tagged = ranked.withColumn(stage_col, stage).withColumn(
        "__h", _bucket(id_col, mode, seed)
    )
    from secretscraper_spark.plans.ranking import assign_global_seq

    out = assign_global_seq(
        tagged, [stage_col, "__h", id_col], seq_col=seq_col
    )
    return out.drop("__rank", "__h")
