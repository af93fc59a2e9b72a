"""CDX capture-index build over the fetched-pages log.

Web archives answer "have we captured this URL (or this site), and
where" through a CDX index: one record per capture, keyed by the SURT
form of the URL (`operators/urlnorm.surt_key`), GLOBALLY sorted by
``(surt, ts)`` so lookups are range scans — the Internet Archive /
Common Crawl index layout. The reference keeps its whole seen-set in a
process-local dict (`crawler.py` url_dict) and writes no index; a
standing 10^10-URL deployment needs exactly this artifact to make the
crawl's output addressable.

Plan shape (100 TB): one map-only projection builds the record (SURT is
a pure Column chain; digest is ``md5`` over the payload — same engine-
portable identity convention as `plans/traps.py`), then ONE range
shuffle (`repartitionByRange` on the sort key) + an in-partition sort —
the minimum any globally sorted artifact costs. Range partitioning makes
each output shard a contiguous SURT interval, so a prefix lookup prunes
to the few shards whose range overlaps (see :func:`cdx_lookup`).
``repartitionByRange`` samples boundaries by RE-EXECUTING the upstream
plan — feed it a stored table or checkpoint expensive upstreams first
(same caveat as `plans/ranking.assign_global_seq`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from secretscraper_spark.operators.urlnorm import surt_key


def build_cdx(
    fetched: DataFrame,
    num_shards: int | None = None,
    url_col: str = "url_norm",
    ts_col: str = "fetched_ms",
    status_col: str = "status",
    mime_col: str = "mime",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Build the sorted capture index: one row per input capture with
    ``(surt, ts_ms, url, status, mime, digest, length)``, globally
    ordered by ``(surt, ts_ms)``. Rows whose URL has no SURT form
    (non-http(s) garbage) are dropped — a capture index only describes
    web captures. ``digest`` is ``md5`` of the payload (NULL payload →
    digest of empty, length 0 — a recorded empty capture, not an absent
    row); ``length`` is the stored octet count."""
    payload = F.coalesce(F.col(bytes_col), F.lit(b""))
    records = fetched.select(
        surt_key(F.col(url_col)).alias("surt"),
        F.col(ts_col).cast("long").alias("ts_ms"),
        F.col(url_col).alias("url"),
        F.col(status_col).cast("int").alias("status"),
        F.col(mime_col).alias("mime"),
        F.md5(payload).alias("digest"),
        F.octet_length(payload).cast("long").alias("length"),
    ).filter(F.col("surt").isNotNull())
    # repartitionByRange's boundary sampling RE-EXECUTES its input plan;
    # without this pin that means scanning + md5-ing every payload twice.
    # The projected records are CDX-sized (digest, never the payload), so
    # materializing them is the cheap side of that trade.
    records = records.localCheckpoint()
    parts = [F.col("surt"), F.col("ts_ms")]
    ranged = (
        records.repartitionByRange(num_shards, *parts)
        if num_shards
        else records.repartitionByRange(*parts)
    )
    return ranged.sortWithinPartitions("surt", "ts_ms")


def cdx_lookup(cdx: DataFrame, surt_prefix: str) -> DataFrame:
    """All captures under a SURT prefix (a URL, a path subtree, a host,
    or — the point of SURT — a whole registered domain via
    ``com,example``), in capture order. On the range-sharded artifact of
    :func:`build_cdx` persisted with its sort order (parquet/Iceberg with
    min/max stats on ``surt``), this prefix filter prunes to the shards
    whose [min, max] interval overlaps the prefix range — a range scan,
    not a full scan. No re-sort: the artifact is already globally
    (surt, ts)-ordered and a filter preserves that order; an orderBy
    here would pay a full range exchange per lookup for nothing.

    A prefix that has not yet crossed the host boundary (no ``)``)
    is HOST-TOKEN anchored: ``com,example`` matches the host itself and
    its subdomains/ports (next char ``)``, ``,`` or ``:``) but NOT
    ``com,examplefoo`` — a bare startswith would leak another
    registrant's captures. A prefix containing ``)`` is a plain
    path-level startswith."""
    cond = F.col("surt").startswith(surt_prefix)
    if ")" not in surt_prefix and surt_prefix[-1:] not in (",", ":", ""):
        # mid-token host prefix: anchor on the next token boundary
        nxt = F.col("surt").substr(len(surt_prefix) + 1, 1)
        cond = cond & nxt.isin(")", ",", ":")
    return cdx.filter(cond)
