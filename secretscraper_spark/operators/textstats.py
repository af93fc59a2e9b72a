"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in Column expressions (JVM, codegen) so they
hold at 100 TB; nothing here shuffles except the explicit aggregations the
caller adds. Semantics are chosen to be expressible 1:1 in ANSI SQL for the
DuckDB oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# minimal per-language stopword lists for the n-gram/stopword language
# heuristic — deterministic, not a trained model
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ein"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (matches DuckDB len(string_split(x, ' ')))."""
    return F.size(F.split(text, " "))


# BPE-ish pre-tokenizer classes (letters / digits / other-symbol runs) —
# the GPT-2-style split shape, restricted to a dialect-portable pattern so
# the DuckDB oracle (RE2) and Spark (Java regex) agree byte-for-byte.
# Whitespace is an EXPLICIT class, not \s: Java's \s includes \x0B while
# RE2's does not, so \s would diverge on vertical-tab bytes.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]"


def bpe_token_count(text: Column) -> Column:
    """Approximate subword-token count via the BPE-ish class pattern —
    the standard cheap LLM-token estimator for corpus sizing."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_count(text: Column) -> Column:
    """Characters that are not [a-zA-Z0-9 ]."""
    return F.length(F.regexp_replace(text, "[a-zA-Z0-9 ]", ""))


def stopword_hits(text: Column, words: list[str]) -> Column:
    """Occurrences of any of *words* as whole lowercase words."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features per row."""
    t = F.col(text_col)
    toks = token_count(t)
    return df.withColumns(
        {
            "n_chars_calc": char_count(t),
            "n_tokens": toks,
            "n_punct": punct_count(t),
            "en_stopwords": stopword_hits(t, LANG_STOPWORDS["en"]),
            "quality_score": F.round(
                (toks.cast("double") / F.greatest(char_count(t), F.lit(1)))
                * (F.lit(1.0) - punct_count(t).cast("double") / F.greatest(char_count(t), F.lit(1))),
                6,
            ),
        }
    )


def source_reputation(
    df: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-source (domain) reputation roll-up — the URL/source-level
    curation stage (RefinedWeb-style): corpora are gated by where a page
    came from, not only by per-document features, because spam farms and
    mirror hosts are source-shaped phenomena.

    Per source: ``n_docs``, ``n_unique_fp`` (distinct whitespace-normalized
    fingerprints), ``dup_frac`` (within-source exact-dup rate — mirror/spam
    signal), and a ``rep_score`` combining corpus-level token/char and
    punctuation ratios with the dup rate.

    Scale shape: two partial-agg stages — (source, fingerprint) roll-up
    then source roll-up — so distinct-counting never builds an Expand and
    every shuffle carries pre-combined partial sums; output is
    sources-sized (≪ corpus). All ratios are computed ONCE per source from
    exact integer sums (not averaged per-row doubles), which also makes
    them bit-reproducible across engines and partition layouts."""
    t = F.col(text_col)
    per_fp = (
        df.select(
            F.col(source_col).alias("source"),
            fingerprint(t).alias("fp"),
            token_count(t).alias("tk"),
            char_count(t).alias("cc"),
            punct_count(t).alias("pc"),
        )
        .groupBy("source", "fp")
        .agg(
            F.count("*").alias("n"),
            F.sum("tk").alias("tk"),
            F.sum("cc").alias("cc"),
            F.sum("pc").alias("pc"),
        )
    )
    agg = per_fp.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.count("*").alias("n_unique_fp"),
        F.sum("tk").alias("sum_tokens"),
        F.sum("cc").alias("sum_chars"),
        F.sum("pc").alias("sum_punct"),
    )
    nd = F.col("n_docs").cast("double")
    dup = F.lit(1.0) - F.col("n_unique_fp").cast("double") / nd
    chars = F.greatest(F.col("sum_chars"), F.lit(1)).cast("double")
    rep = (
        (F.col("sum_tokens").cast("double") / chars)
        * (F.lit(1.0) - F.col("sum_punct").cast("double") / chars)
        * (F.lit(1.0) - dup)
    )
    return agg.withColumns(
        {"dup_frac": F.round(dup, 6), "rep_score": F.round(rep, 6)}
    )


def gate_by_reputation(
    df: DataFrame, rep: DataFrame, min_score: float,
    source_col: str = "source",
) -> DataFrame:
    """Keep documents whose source clears the reputation bar. The rep dim
    is sources-sized — explicitly broadcast, so the corpus scan never
    shuffles (semi-join against a broadcast hash table)."""
    dim = rep.filter(F.col("rep_score") >= min_score).select(
        F.col("source").alias(source_col)
    )
    return df.join(F.broadcast(dim), source_col, "left_semi")


def lang_id(text: Column) -> Column:
    """Stopword-vote language heuristic → 2-letter code or 'unknown'.
    Pure Column expr (CASE over greatest), SQL-expressible."""
    hits = {lang: stopword_hits(text, ws) for lang, ws in LANG_STOPWORDS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("unknown")
    # reversed so earlier languages win ties (stable, documented order)
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def entropy_over_symbols(
    sym_df: DataFrame,
    id_col: str = "doc_id",
    sym_col: str = "sym",
    out_prefix: str = "char",
) -> DataFrame:
    """Shared fixed-point Shannon-entropy rollup over an exploded
    (id, symbol) frame — the engine room of ``char_entropy`` and
    multimodal ``payload_entropy``. See char_entropy for the fixed-point
    exactness argument; output columns are ``n_<prefix>s``,
    ``n_distinct_<prefix>s``, ``<prefix>_entropy``."""
    counts = sym_df.groupBy(
        F.col(id_col).alias("doc_id"), F.col(sym_col).alias("sym")
    ).agg(F.count(F.lit(1)).alias("c"))
    lnc_fp = F.round(F.log(F.col("c").cast("double")) * 1e6).cast("long")
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_sym"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("c") * lnc_fp).alias("s_fp"),
    )
    h = F.log(F.col("n_sym").cast("double")) - (
        F.col("s_fp").cast("double")
        / (F.col("n_sym").cast("double") * 1e6)
    )
    return agg.select(
        F.col("doc_id").alias(id_col),
        F.col("n_sym").alias(f"n_{out_prefix}s"),
        F.col("n_distinct").alias(f"n_distinct_{out_prefix}s"),
        F.round(h, 6).alias(f"{out_prefix}_entropy"),
    )


def char_entropy(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-document Shannon character entropy (bits of surprise per
    character, natural-log units) — the Gopher-family gibberish /
    compression-junk detector: base64 blobs and minified assets score
    high, keyboard-mash and repeated-char spam score near zero, natural
    language sits in a tight band.

    H = ln(n) − (Σ_ch c·ln(c)) / n over exact character counts. The
    inner Σ is accumulated in FIXED-POINT: each ln(c) is rounded to 1e-6
    and carried as a BIGINT, so the corpus-scale sum is exact integer
    arithmetic — partition layout, executor count, and engine (libm on
    the same integer inputs) cannot drift the result; the only float ops
    are one ln(n) and one division per document, after the sum.

    Plan shape: explode chars → (doc, char) hash-agg → per-doc rollup,
    both map-side combined (executor state is bounded by per-partition
    distinct (doc, char) pairs — alphabet-sized per doc), the
    repetition_features cost class. Docs with no characters yield no row
    (both engines agree)."""
    chars = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), "")).alias("sym"),
    ).filter(F.col("sym") != "")
    return entropy_over_symbols(chars, out_prefix="char")


# Unicode script ranges (BMP-only, so Java regex and RE2 agree without
# surrogate handling). Built with chr() so the literal pattern BYTES are
# identical in both engines — no \uXXXX vs \x{XXXX} dialect divergence.
SCRIPT_RANGES: dict[str, list[tuple[int, int]]] = {
    "latin": [(0x0041, 0x005A), (0x0061, 0x007A), (0x00C0, 0x024F)],
    "cyrillic": [(0x0400, 0x04FF)],
    "greek": [(0x0370, 0x03FF)],
    "arabic": [(0x0600, 0x06FF)],
    "devanagari": [(0x0900, 0x097F)],
    "cjk": [(0x3040, 0x30FF), (0x4E00, 0x9FFF), (0xAC00, 0xD7AF)],
}


def _script_class(name: str) -> str:
    return "[" + "".join(
        f"{chr(lo)}-{chr(hi)}" for lo, hi in SCRIPT_RANGES[name]
    ) + "]"


def script_counts(text: Column) -> dict[str, Column]:
    """Per-script character counts — ``length(x) − length(x with the
    class removed)``, one codegen'd regexp_replace per script, no UDF.
    The routing signal every multilingual curation pipeline needs before
    language-ID (stopword voting is script-blind: a Cyrillic page scores
    0 on every Latin stopword list)."""
    return {
        name: F.length(text) - F.length(
            F.regexp_replace(text, _script_class(name), "")
        )
        for name in SCRIPT_RANGES
    }


def dominant_script(text: Column) -> Column:
    """Script with the most characters → its name, or 'unknown' when no
    script character occurs. Ties break by SCRIPT_RANGES order (earlier
    wins — same reversed-when-chain idiom as lang_id)."""
    counts = script_counts(text)
    best = F.greatest(*counts.values())
    expr = F.lit("unknown")
    for name in reversed(list(SCRIPT_RANGES)):
        expr = F.when(
            (counts[name] > 0) & (counts[name] == best), F.lit(name)
        ).otherwise(expr)
    return expr


def script_profile(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-document script profile: each script's character count, the
    dominant script, and its share of all script characters (round 6).
    One projection — every column derives from the same let-bound text,
    all JVM-side."""
    t = F.col(text_col)
    counts = script_counts(t)
    total = sum(counts.values(), F.lit(0))
    cols = {f"n_{name}": c.cast("long") for name, c in counts.items()}
    cols["script"] = dominant_script(t)
    cols["script_frac"] = F.round(
        F.greatest(*counts.values()).cast("double")
        / F.greatest(total, F.lit(1)).cast("double"),
        6,
    )
    return df.select(F.col(id_col).alias("doc_id"),
                     *[c.alias(n) for n, c in cols.items()])


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (portable to the DuckDB oracle; a rolling/simhash variant lives in
    operators/dedup.py)."""
    return F.md5(F.lower(F.regexp_replace(text, WS_SPLIT_PATTERN, " ")))


def winnowing_fingerprints(
    text: Column, k: int = 8, w: int = 4, hash_mode: str = "xxhash64"
) -> Column:
    """Winnowing fingerprint set (Schleimer et al., SIGMOD'03): hash every
    character k-gram, keep the minimum of each sliding window of w hashes,
    distinct. Entirely JVM-side — substring k-grams + a 64-bit hash stand in
    for the Rabin-Karp rolling hash (identical output semantics: one hash
    per gram position), sequence/transform/slice/array_min do the windowing.
    Guarantees any shared substring of length ≥ k+w-1 yields a shared
    fingerprint — the rolling-hash doc-fingerprinting scheme for plagiarism
    / near-dup detection at corpus scale. ``hash_mode='portable'`` swaps
    xxhash64 for the md5-prefix hash the DuckDB oracle can reproduce
    (operators/dedup.py:portable_hash64) so the fingerprint VALUES are
    value-gated, not just the counts."""
    from .dedup import portable_hash64

    hash_fn = portable_hash64 if hash_mode == "portable" else F.xxhash64
    t = F.lower(F.regexp_replace(text, WS_SPLIT_PATTERN, " "))
    n = F.length(t)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: hash_fn(F.substring(t, i, k)),
    )

    # LET-BINDING (transform over a 1-element array): an expression named
    # inside a lambda body is RE-EVALUATED on every lambda iteration —
    # Catalyst does no common-subexpression elimination across HOF lambdas.
    # Referencing `grams` directly in the window lambda re-hashes all ~n
    # grams for each of ~n windows: O(n²) hashing, ~1 s/doc measured.
    # Binding it as a lambda variable evaluates it once per row.
    def _windows(g: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(g) - w, F.lit(0))),
            lambda j: F.array_min(F.slice(g, j + 1, w)),
        )

    return F.array_distinct(
        F.element_at(F.transform(F.array(grams), _windows), 1)
    )


def redact_text(text: Column, patterns: dict[str, str]) -> Column:
    """Training-corpus scrubbing: replace every match of each named pattern
    with its ``[NAME]`` placeholder — the standard PII/secret-redaction
    pass run before corpus release (reference semantics: the same rule set
    its Handler extracts with, `handler.py:41-61`, applied destructively).

    Rules apply in sorted-name order (deterministic composition; a later
    rule sees earlier rules' placeholders). Pure chained `regexp_replace`
    Column exprs — JVM-side, codegen, no UDF — so the pass costs the same
    scan the extraction pass does. Callers wanting the shipped secret rules
    pass `{name: rule.pattern for ...}` from `config.loaded_rules()`."""
    out = text
    for name in sorted(patterns):
        out = F.regexp_replace(out, patterns[name], f"[{name.upper()}]")
    return out


# Explicit whitespace class (not \s): Java regex \s includes \x0B, RE2's
# does not — same dialect-portability rule as BPE_TOKEN_PATTERN.
WS_SPLIT_PATTERN = "[ \t\n\r\f]+"


def _word_arrays(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), WS_SPLIT_PATTERN), lambda x: x != ""
    )
    return df.select(F.col(id_col).alias("doc_id"), toks.alias("arr"))


# Control characters stripped by normalize_text: C0 controls except
# \t \n \r, plus DEL. Explicit \xNN escapes — identical in Java regex
# (Spark) and RE2 (DuckDB oracle); \x0B and \x0C are included here (they
# are "controls" for cleaning purposes) while the whitespace-collapse
# class keeps its dialect-portable explicit form.
CONTROL_CHAR_PATTERN = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def normalize_text(text: Column) -> Column:
    """Corpus-cleaning normalization pass: strip C0/DEL control characters,
    collapse whitespace runs to single spaces, trim — the standard
    pre-tokenization canonicalization every web-scraped corpus needs before
    dedup/quality scoring (mojibake bytes and stray controls otherwise make
    identical documents hash apart). Pure chained ``regexp_replace`` /
    ``trim`` Column exprs — JVM codegen, no UDF, costs one scan. Dialect-
    portable patterns so the DuckDB oracle reproduces the exact strings."""
    cleaned = F.regexp_replace(text, CONTROL_CHAR_PATTERN, "")
    return F.trim(F.regexp_replace(cleaned, WS_SPLIT_PATTERN, " "))


def vocab_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Corpus vocabulary with term frequency + document frequency — the
    tokenizer-training / corpus-sizing primitive (BPE trainers, stopword
    discovery, df-based filtering all start from this table).

    Plan shape (scales to 100 TB): explode → per-(doc, word) count with
    map-side partial combine → per-word rollup (``sum`` → tf, ``count`` →
    df). Document frequency is counted WITHOUT ``count_distinct`` — the
    two-phase aggregate avoids Catalyst's Expand fallback and keeps every
    stage partially aggregated, so per-word state never exceeds the
    vocabulary size on any executor. Output: (word, tf, df)."""
    words = _word_arrays(df, id_col, text_col).select(
        "doc_id", F.explode("arr").alias("word")
    )
    per_doc = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_doc.groupBy("word")
        .agg(
            F.sum("cnt").cast("long").alias("tf"),
            F.count(F.lit(1)).cast("long").alias("df"),
        )
        .filter(F.col("df") >= min_df)
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic keyword/topic sketch
    used for corpus clustering, domain tagging, and search-index keying.

    ``idf = ln((N+1)/(df+1)) + 1`` (smoothed, sklearn convention);
    ``score = round(tf * idf, 6)``. Ranking uses the ROUNDED score with a
    lexicographic term tiebreak so two independent engines order ties
    identically (the DuckDB oracle mirrors this exactly).

    Plan: the vocab_table aggregate (vocabulary-sized — broadcastable for
    natural-language vocabularies) joins the per-doc term counts, then one
    window partitioned by doc — a single shuffle on the doc id. N is a
    driver-side scalar (same cost class as bigram_lm_scores' V)."""
    from pyspark.sql import Window

    if n_docs is None:
        n_docs = df.count()
    words = _word_arrays(df, id_col, text_col).select(
        "doc_id", F.explode("arr").alias("term")
    )
    per_doc = words.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1)).cast("double")) + F.lit(1.0)
    scored = per_doc.join(dfreq, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(F.col("tf").cast("double") * idf, 6).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "score", "rk")
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
    model_df: DataFrame | None = None,
) -> DataFrame:
    """CCNet/Gopher-style statistical-LM quality score: train an add-k
    smoothed bigram language model on *model_df* (default: the corpus
    itself) and score every document by its mean bigram log-probability
    (`avg_logprob`) and perplexity (`ppl`). Low-probability documents are
    gibberish / OCR noise / non-language boilerplate — the standard
    perplexity pre-training filter.

    P(w2|w1) = (C(w1 w2) + k) / (C(w1) + k*V), V = model vocabulary size.

    Plan shape (scales to 100 TB): bigram construction is a JVM-side HOF
    over the token array (no shuffle); the model is two hash aggregations
    with map-side combine; scoring pre-aggregates each doc's bigrams to
    (doc_id, bigram, cnt) so the model joins carry distinct bigrams per
    doc, not every token position; the final rollup is one hash agg. The
    model tables arrive at the join as aggregates (vocabulary-sized, not
    corpus-sized) — broadcastable for natural-language vocabularies, a
    plain shuffle hash join beyond that. V is a driver-side scalar of one
    count over the unigram aggregate (same cost class as IVF's centroid
    collect).

    Docs with <2 tokens have no bigrams and yield no row (both engines
    agree). Floats are rounded to 6 before exp so the oracle's libm and
    summation order cannot diverge the gate."""
    docs = _word_arrays(df, id_col, text_col)
    model_docs = (
        docs if model_df is None else _word_arrays(model_df, id_col, text_col)
    )

    words = model_docs.select(F.explode("arr").alias("w"))
    uni = words.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni.count()

    def bigram_col(arr: Column) -> Column:
        # guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not an
        # empty list — single-token docs must short-circuit to []
        return F.when(
            F.size(arr) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(arr) - 1),
                lambda i: F.concat(
                    F.element_at(arr, i), F.lit(" "), F.element_at(arr, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    big_model = (
        model_docs.select(F.explode(bigram_col(F.col("arr"))).alias("big"))
        .groupBy("big")
        .agg(F.count(F.lit(1)).alias("c2"))
    )

    doc_bigs = (
        docs.select("doc_id", F.explode(bigram_col(F.col("arr"))).alias("big"))
        .groupBy("doc_id", "big")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("w1", F.split(F.col("big"), " ").getItem(0))
    )

    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(float(k)))
        / (
            F.coalesce(F.col("c1"), F.lit(0)).cast("double")
            + F.lit(float(k)) * F.lit(float(vocab))
        )
    )
    scored = (
        doc_bigs.join(big_model, "big", "left")
        .join(uni.withColumnRenamed("w", "w1"), "w1", "left")
        .select("doc_id", "cnt", logp.alias("logp"))
    )
    avg = F.round(
        F.sum(F.col("cnt") * F.col("logp")) / F.sum("cnt").cast("double"), 6
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            avg.alias("avg_logprob"),
        )
        .withColumn("ppl", F.round(F.exp(-F.col("avg_logprob")), 6))
    )


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Intra-document repetition features (the Gopher/RefinedWeb-style
    quality rules): fraction of distinct words, most-common-word mass, and
    the fraction of word occurrences belonging to repeated words. Heavily
    repetitive documents (boilerplate, keyword stuffing, templated spam)
    score low distinct_word_frac / high dup_word_frac and get filtered
    before training.

    Plan: one explode + two hash aggregations, both with map-side partial
    combine — per-word state never leaves the executor until the final
    per-doc rollup, so the op scales with corpus size, not vocabulary.
    Docs whose text has no words yield no row (both engines agree)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), WS_SPLIT_PATTERN), lambda x: x != ""
    )
    words = df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("word"))
    counts = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    agg = counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias("dup_occ"),
    )
    n = F.col("n_words").cast("double")
    return agg.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.round(F.col("n_distinct") / n, 6).alias("distinct_word_frac"),
        F.round(F.col("top") / n, 6).alias("top_word_frac"),
        F.round(F.col("dup_occ") / n, 6).alias("dup_word_frac"),
    )


# block-level HTML noise stripped before tag removal; all constructs
# ((?is) inline flags, non-greedy, \b) behave identically in Java regex
# (Spark) and RE2 (DuckDB oracle) — probe-verified
_HTML_BLOCK_PATTERNS = [
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
]
# single-pass entity unescape: specific entities first, bare &amp; LAST so
# a literal '&amp;lt;' decodes once (to '&lt;'), never twice (to '<')
_HTML_ENTITIES = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
]


def html_to_text(html: Column) -> Column:
    """Crawl page → training text: drop script/style/comment blocks,
    strip remaining tags, decode the common entities (single-pass
    order), collapse whitespace, trim — the boilerplate-strip every
    HTML-sourced corpus runs before quality scoring and dedup (the
    text-extraction analog of purekit's title extractor, as a pure
    Column chain). Chained ``regexp_replace``/``replace`` exprs — JVM
    codegen, zero Python, one scan; dialect-portable so the DuckDB
    oracle reproduces the exact strings. NOT a parser: pathological
    markup (unclosed <script>, '>' inside attribute values) degrades
    gracefully rather than exactly — the bs4-gated DOM path is the
    parser-grade option where the wheel exists."""
    out = html
    for p in _HTML_BLOCK_PATTERNS:
        out = F.regexp_replace(out, p, " ")
    out = F.regexp_replace(out, r"(?s)<[^>]+>", " ")
    for ent, ch in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, WS_SPLIT_PATTERN, " "))


def line_features(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Gopher line-format rules (Rae et al. 2021 §A1.1): fraction of
    lines that start with a bullet glyph, end with an ellipsis, or are
    blank — the boilerplate-list / truncated-snippet detectors that
    token-level stats miss (nav menus are bullet walls, search-result
    scrapes end every line with '...'). Gopher's shipped cutoffs: reject
    at >90% bullet lines or >30% ellipsis lines.

    Lines are a plain ``split('\\n')`` (empties kept — blank lines are a
    signal); predicates are per-line regexes inside ONE let-bound
    ``filter`` each, so the whole profile is a single JVM projection —
    no explode, no shuffle, line arrays never leave the row."""
    lines = F.split(F.col(text_col), "\n")
    n = F.size(lines)

    def frac(pred) -> Column:
        return F.round(
            F.size(F.filter(lines, pred)).cast("double")
            / F.greatest(n, F.lit(1)).cast("double"),
            6,
        )

    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_lines"),
        frac(lambda x: x.rlike(r"^[ \t]*[-*•]")).alias("bullet_frac"),
        frac(
            lambda x: x.rlike(r"(\.\.\.|…)[ \t]*$")
        ).alias("ellipsis_frac"),
        frac(lambda x: x.rlike(r"^[ \t]*$")).alias("blank_frac"),
    )


def ngram_repetition(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style duplicate word-n-gram metrics (Rae et al. 2021 §A1.1):
    per document, the character mass of the single most frequent n-gram
    (``top_frac``) and of ALL n-grams occurring more than once
    (``dup_frac``), as fractions of the normalized character stream.
    Templated spam and keyword-stuffing score high on both; the n-gram
    family catches phrase-level repetition the word-level
    ``repetition_features`` cannot.

    Definitions (mirrored exactly by the DuckDB oracle): tokens are the
    lowercased whitespace split; an n-gram's char mass is the length of
    its space-joined string times its occurrence count (OVERLAPPING
    occurrences counted — the cheap exact variant; interval-de-overlapped
    coverage is what `dedup.duplicate_spans` computes); the denominator
    is the space-joined token stream's length. Ties for the top gram
    break lexicographically. Docs with fewer than n tokens yield no row.

    Plan shape: gram construction is a JVM HOF over the token array (no
    shuffle), then one (doc, gram) hash agg and one doc-keyed window +
    rollup — all map-side combined, the repetition_features cost class."""
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), WS_SPLIT_PATTERN),
        lambda x: x != "",
    )

    def _grams(arr: Column) -> Column:
        return F.when(
            F.size(arr) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(arr) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(arr, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def _total_chars(arr: Column) -> Column:
        return F.aggregate(
            arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ) + F.greatest(F.size(arr) - 1, F.lit(0)).cast("long")

    base = df.select(
        F.col(id_col).alias("doc_id"),
        _grams(toks).alias("grams"),
        _total_chars(toks).alias("total_chars"),
    )
    counts = base.select(
        "doc_id", "total_chars", F.explode("grams").alias("gram")
    ).groupBy("doc_id", "total_chars", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("gram").asc()
    )
    ranked = counts.withColumn("rk", F.row_number().over(w))
    tc = F.col("total_chars").cast("double")
    return (
        ranked.groupBy("doc_id", "total_chars")
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.max(F.when(F.col("rk") == 1, F.col("gram"))).alias("top_gram"),
            F.max(F.when(F.col("rk") == 1, F.col("cnt")))
            .cast("long").alias("top_cnt"),
            F.sum(
                F.when(F.col("rk") == 1, F.col("cnt") * F.length("gram"))
                .otherwise(F.lit(0))
            ).alias("top_mass"),
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt") * F.length("gram"))
                .otherwise(F.lit(0))
            ).alias("dup_mass"),
        )
        .select(
            "doc_id",
            F.col("total_chars").cast("long").alias("total_chars"),
            "n_grams",
            "top_gram",
            "top_cnt",
            F.round(F.col("top_mass") / tc, 6).alias("top_frac"),
            F.round(F.col("dup_mass") / tc, 6).alias("dup_frac"),
        )
    )


def quality_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopwords: int = 1,
) -> DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021 §A1.1 rule
    family, restricted to dialect-portable signals) — the text analog of
    ``multimodal.filter_images``: every gate is a pure Column expression
    over one let-bound tokenize, so the whole filter collapses into the
    scan stage (predicate pushdown applies to the cheap gates), zero
    Python, zero shuffle.

    Gates, in reject_reason order: ``short`` / ``long`` (token count
    bounds), ``word_len`` (mean word length outside [min,max] — gibberish
    and char-soup), ``symbols`` (non-alphanumeric char ratio — markup
    and encoding junk), ``stopwords`` (fewer than *min_stopwords* English
    stopword hits — non-linguistic text). Returns the measured signals
    plus ``keep`` and a '+'-joined ``reject_reason`` ('-' when kept), so
    drops are auditable instead of silent."""
    t = F.col(text_col)
    toks = F.filter(F.split(t, WS_SPLIT_PATTERN), lambda x: x != "")

    def _stats(tk):
        n = F.size(tk)
        char_sum = F.aggregate(
            tk, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        )
        return F.struct(
            n.alias("n"),
            (char_sum / F.greatest(n, F.lit(1)).cast("double")).alias("mwl"),
        )

    st = F.element_at(F.transform(F.array(toks), _stats), 1)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        st.alias("st"),
        F.round(
            punct_count(t).cast("double") / F.greatest(char_count(t), F.lit(1)), 6
        ).alias("symbol_ratio"),
        stopword_hits(t, LANG_STOPWORDS["en"]).alias("n_stopwords"),
    ).select(
        "doc_id",
        F.col("st.n").alias("n_tokens"),
        F.round(F.col("st.mwl"), 6).alias("mean_word_len"),
        "symbol_ratio",
        "n_stopwords",
    )
    f_short = F.col("n_tokens") < min_tokens
    f_long = F.col("n_tokens") > max_tokens
    f_wl = (F.col("mean_word_len") < min_mean_word_len) | (
        F.col("mean_word_len") > max_mean_word_len
    )
    f_sym = F.col("symbol_ratio") > max_symbol_ratio
    f_stop = F.col("n_stopwords") < min_stopwords
    keep = ~(f_short | f_long | f_wl | f_sym | f_stop)
    reason = F.when(keep, F.lit("-")).otherwise(
        F.concat_ws(
            "+",
            *[
                F.when(flag, F.lit(name))
                for flag, name in [
                    (f_short, "short"), (f_long, "long"), (f_wl, "word_len"),
                    (f_sym, "symbols"), (f_stop, "stopwords"),
                ]
            ],
        )
    )
    return base.select(
        "doc_id", "n_tokens", "mean_word_len", "symbol_ratio", "n_stopwords",
        keep.alias("keep"), reason.alias("reject_reason"),
    )
