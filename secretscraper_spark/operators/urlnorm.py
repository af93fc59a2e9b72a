"""Curation-grade URL canonicalization for corpus dedup.

The crawler's URL identity is deliberately REFERENCE-PARITY (fragment
kept, no normalization — `functions/purekit.parse6`); that is correct
for matching the reference's seen-set but wrong for corpus dedup, where
`http://A.com/x?utm_source=tw#top` and `http://a.com/x` are the same
document. This module is the other contract: an aggressive, deterministic
canonical form for dedup keys and mirror detection —

- scheme and host lowercased, default ports dropped (:80 http, :443 https)
- fragment dropped
- tracking parameters stripped (utm_*, fbclid, gclid, msclkid, igshid, ref)
- surviving query parameters SORTED (byte order) and rejoined
- empty query → no '?'

Pure Column chain: one regex decomposition + HOF filter/sort on the
query — JVM codegen, no UDF, no shuffle; every construct is
dialect-portable so the DuckDB oracle reproduces the exact strings.
Inputs that don't look like absolute http(s) URLs pass through unchanged
(NULL-safe, garbage-safe — a 100 TB url column always has garbage).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: decomposition groups: 1=scheme 2=authority 3=path 4=query(no '?')
URL_PARTS_PATTERN = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\??([^#]*)"

#: tracking parameter names (the ubiquitous analytics/click identifiers)
TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|fbclid|gclid|msclkid|igshid|ref)(=|$)"


def _sorted_query(query: Column, drop_pattern: str | None = None) -> Column:
    """Shared query normalization: split on ``&``, drop empty pairs (and
    *drop_pattern* matches, if given), byte-sort, rejoin. One definition
    so `canonical_url` and `surt_key` can never drift on it."""
    keep = (
        (lambda p: (p != "") & ~p.rlike(drop_pattern))
        if drop_pattern
        else (lambda p: p != "")
    )
    return F.array_join(F.array_sort(F.filter(F.split(query, "&"), keep)), "&")


def canonical_url(url: Column) -> Column:
    """Canonical dedup key for an absolute http(s) URL (see module doc);
    non-matching inputs return unchanged."""
    scheme = F.lower(F.regexp_extract(url, URL_PARTS_PATTERN, 1))
    auth = F.lower(F.regexp_extract(url, URL_PARTS_PATTERN, 2))
    path = F.regexp_extract(url, URL_PARTS_PATTERN, 3)
    query = F.regexp_extract(url, URL_PARTS_PATTERN, 4)

    host = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring(auth, 1, F.length(auth) - 3),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring(auth, 1, F.length(auth) - 4),
    ).otherwise(auth)

    q = _sorted_query(query, TRACKING_PARAM_PATTERN)
    rebuilt = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(scheme.isin("http", "https"), rebuilt).otherwise(url)


def surt_key(url: Column) -> Column:
    """SURT form of an absolute http(s) URL — the Sort-friendly URI
    Reordering Transform used by web-archive indexes (Internet Archive
    webarchive-commons / Common Crawl CDX): URLs of one registered site
    become one contiguous key range, so a globally sorted index answers
    host/domain-prefix lookups with range pruning instead of a scan.

    Following the IA default canonicalizer: the whole URL is lowercased,
    the scheme and userinfo dropped, a leading ``www\\d*.`` label
    stripped once, a trailing FQDN dot dropped, the scheme's default
    port dropped (compared NUMERICALLY — ``:080`` is ``:80``; kept
    ports render unpadded), host labels REVERSED and comma-joined
    (IPv4 hosts stay in address order, as IA does — reversing octets
    would scatter one host's captures), ``)`` appended, then path
    (empty → ``/``) and byte-sorted query; fragment dropped.
    ``http://WWW.Sub.Example.COM:80/A?b=2&a=1`` →
    ``com,example,sub)/a?a=1&b=2``. Pure Column chain (regex decompose +
    split/reverse/sort HOFs — JVM codegen, no UDF, no shuffle);
    non-http(s) inputs AND http(s) rows with an empty authority return
    NULL (a CDX indexes fetched web pages only, and a key with no host
    could never be range-addressed)."""
    low = F.lower(url)
    scheme = F.regexp_extract(low, URL_PARTS_PATTERN, 1)
    raw_auth = F.regexp_extract(low, URL_PARTS_PATTERN, 2)
    path = F.regexp_extract(low, URL_PARTS_PATTERN, 3)
    query = F.regexp_extract(low, URL_PARTS_PATTERN, 4)

    auth = F.regexp_replace(raw_auth, r"^[^/@]*@", "")  # userinfo off
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    no_port = F.regexp_replace(auth, r":\d+$", "")
    # non-default port survives AFTER the reversed host (IA form:
    # ``com,example:8080)``), compared and rendered numerically so
    # zero-padding can't split one origin across two keys
    port_num = F.nullif(port, F.lit("")).cast("int")
    is_default = ((scheme == "http") & (port_num == 80)) | (
        (scheme == "https") & (port_num == 443)
    )
    port_sfx = F.when(
        port_num.isNull() | is_default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port_num.cast("string")))
    host = F.regexp_replace(  # IA strip rule is www\d*., applied once
        F.regexp_replace(no_port, r"^www\d*\.", ""),
        r"\.$",  # trailing FQDN dot: same DNS host, same key range
        "",
    )
    host_rev = F.when(
        host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$"),  # IPv4: no reversal (IA)
        host,
    ).otherwise(F.array_join(F.reverse(F.split(host, r"\.")), ","))

    q = _sorted_query(query)
    key = F.concat(
        host_rev,
        port_sfx,
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(scheme.isin("http", "https") & (host != ""), key)
