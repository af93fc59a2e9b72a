"""Tier-extraction plan fragments shared VERBATIM by the batch crawler
(plans/crawler.py) and the streaming bridge (streaming/crawl_bridge.py).

One Arrow pass per tier: the combined UDF (functions/extract.py
``make_extract_udf``) turns each fetched page into
``struct(children, secrets, title)`` in a single JVM→worker caption
transfer — running links, secrets, and title as separate UDFs shipped
every caption across the Arrow boundary three times and capped executor
feed throughput at high parallelism. The checkpointed combined output
carries the frontier identity + page metadata but NOT the caption, so
the tier's large text column is never stored twice.

All fragments are stateless per page, so the identical DataFrame code
runs in both execution modes — the one-operator-two-modes pattern of
SURVEY §3.2; the bridge test gates availableNow-stream ≡ batch on them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.exprs import is_extend_expr, is_js_expr

# frontier identity + fetched metadata that downstream consumers need;
# caption deliberately absent (it lives only inside the UDF pass)
_CARRY_COLS = [
    "url_norm", "scheme", "netloc", "path", "params", "query", "fragment",
    "depth", "discovery_seq", "status", "content_type", "content_length",
]


def extract_combined(fetched: DataFrame, extract_udf) -> DataFrame:
    """F7-gated P1∪P2 + P3 + P7 in one pass: fetched pages →
    carry-columns + ``ex`` struct(children, secrets, title).

    ``latency_ms`` (paced real-fetch mode only — fetch_exec measures the
    fetch call) is carried through when present so the crawler's AIMD
    fold can feed observed latencies to adapt_crawl_delay; the join-mode
    schema is unchanged."""
    carry = list(_CARRY_COLS)
    if "latency_ms" in fetched.columns:
        carry.append("latency_ms")
    return fetched.select(
        *carry,
        extract_udf(
            F.col("scheme"), F.col("netloc"), F.col("caption"),
            is_extend_expr(F.col("content_type")),
        ).alias("ex"),
    )


def nodes_of(combined: DataFrame) -> DataFrame:
    """P10 metadata projection + P7 title (reference URLNode state)."""
    return combined.select(
        "url_norm", "scheme", "netloc", "path", "params", "query",
        "fragment", "depth",
        F.col("status").cast("string").alias("status"),
        F.col("ex.title").alias("title"),
        F.col("content_length").cast("long").alias("content_length"),
        "content_type",
    )


def secrets_of(combined: DataFrame) -> DataFrame:
    """P3: (url_norm, rule_name, match) rows (crawler.py:296, 311)."""
    return combined.select(
        "url_norm", F.explode("ex.secrets").alias("s")
    ).select("url_norm", "s.rule_name", "s.match")


def children_of(combined: DataFrame) -> DataFrame:
    """Exploded child rows (parent_norm, parent_seq, url 6-tuple +
    url_norm); pure JVM explode over the checkpointed arrays."""
    return (
        combined.select(
            F.col("url_norm").alias("parent_norm"),
            F.col("discovery_seq").alias("parent_seq"),
            F.explode("ex.children").alias("c"),
        )
        .select("parent_norm", "parent_seq", "c.*")
    )


def edge_kind_expr(path_col) -> F.Column:
    """F11 js classifier for one child path — the SINGLE definition used
    by the retained edges projection (`edges_of`) and the fold digests
    (`edge_pairs_expr` → crawler._fold_tier), so the two paths cannot
    silently diverge (ADVICE round-4)."""
    return F.when(is_js_expr(path_col), "js").otherwise("url")


def edges_of(children: DataFrame) -> DataFrame:
    """D5: child rows → (parent_norm, child_norm, kind) with the F11 js
    classifier (reference crawler.py:364-376)."""
    return children.select(
        "parent_norm",
        F.col("url_norm").alias("child_norm"),
        edge_kind_expr(F.col("path")).alias("kind"),
    )


# ---------------------------------------------------------------------------
# Digest recipes — the ONE place that says which columns each output
# table hashes for the order-invariant sum-of-xxhash64 digests. Consumed
# by crawler._fold_tier (per-tier fold over the pre-explosion combined
# frame), submit/crawl_job.py --checksum (retained tables), and the
# fold-vs-retained parity tests. Editing a projection above without
# updating its recipe here is the divergence ADVICE round-4 warned
# about — keep them adjacent.

SEEN_DIGEST_COLS = ("url_norm", "depth", "discovery_seq")
NODE_DIGEST_COLS = ("url_norm", "status", "title", "content_length")
EDGE_DIGEST_COLS = ("parent_norm", "child_norm", "kind")
SECRET_DIGEST_COLS = ("url_norm", "rule_name", "match")


def node_digest_exprs() -> list:
    """NODE_DIGEST_COLS' values read off the PRE-explosion combined
    frame — value- and type-identical to the `nodes_of` projection."""
    return [
        F.col("url_norm"),
        F.col("status").cast("string"),
        F.col("ex.title"),
        F.col("content_length").cast("long"),
    ]


def secret_digest_exprs(s) -> list:
    """SECRET_DIGEST_COLS from one ``ex.secrets`` element ≡ one
    `secrets_of` row (the extract UDF dedups in-page secrets on exactly
    (rule_name, match), so the retained path's global dropDuplicates is
    a true no-op here — no array_distinct needed)."""
    return [F.col("url_norm"), s["rule_name"], s["match"]]


def edge_pairs_expr() -> F.Column:
    """Per-page DEDUPED (child_norm, kind) pairs for the fold digests.

    The extract UDF dedups children on the full 6-tuple, which is
    STRICTLY FINER than the edge identity (child_norm, kind): two
    distinct 6-tuples can unparse to the same url_norm — e.g.
    ('http','h','/a','b','','') and ('http','h','/a;b','','','') both
    serialize to ``http://h/a;b`` — and the retained path's global
    dropDuplicates would collapse them while a naive per-child fold
    counts both. array_distinct restores bit-parity. Seen-at-enqueue
    fetches each page in exactly one tier, so global edge dedup ≡
    per-page dedup on these pairs (parent_norm is the page itself)."""
    return F.array_distinct(
        F.transform(
            F.col("ex.children"),
            lambda c: F.struct(
                c["url_norm"].alias("child_norm"),
                edge_kind_expr(c["path"]).alias("kind"),
            ),
        )
    )


def edge_digest_exprs(p) -> list:
    """EDGE_DIGEST_COLS from one `edge_pairs_expr` element ≡ one
    `edges_of` row after the retained path's dropDuplicates."""
    return [F.col("url_norm"), p["child_norm"], p["kind"]]
