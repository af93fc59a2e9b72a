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

    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
        )
    )
    q = F.array_join(kept, "&")
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
    the scheme and userinfo dropped, one leading ``www.`` label
    stripped, the default port for the scheme dropped, host labels
    REVERSED and comma-joined (IPv4 hosts stay in address order, as IA
    does — reversing octets would scatter one host's captures),
    ``)`` appended, then path (empty → ``/``) and byte-sorted query;
    fragment dropped. ``http://WWW.Sub.Example.COM:80/A?b=2&a=1`` →
    ``com,example,sub)/a?a=1&b=2``. Pure Column chain (regex decompose +
    split/reverse/sort HOFs — JVM codegen, no UDF, no shuffle);
    non-http(s) inputs return NULL (a CDX indexes fetched web pages
    only)."""
    low = F.lower(url)
    scheme = F.regexp_extract(low, URL_PARTS_PATTERN, 1)
    raw_auth = F.regexp_extract(low, URL_PARTS_PATTERN, 2)
    path = F.regexp_extract(low, URL_PARTS_PATTERN, 3)
    query = F.regexp_extract(low, URL_PARTS_PATTERN, 4)

    auth = F.regexp_replace(raw_auth, r"^[^/@]*@", "")  # userinfo off
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    no_port = F.regexp_replace(auth, r":\d+$", "")
    # non-default port survives AFTER the reversed host (IA form:
    # ``com,example:8080)``); the scheme's default port drops
    port_sfx = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    host = F.when(
        no_port.startswith("www."),
        F.substring(no_port, 5, F.length(no_port) - 4),
    ).otherwise(no_port)
    host_rev = F.when(
        host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$"),  # IPv4: no reversal (IA)
        host,
    ).otherwise(F.array_join(F.reverse(F.split(host, r"\.")), ","))

    q = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda p: p != "")), "&"
    )
    key = F.concat(
        host_rev,
        port_sfx,
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(scheme.isin("http", "https"), key)
