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
