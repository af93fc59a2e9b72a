"""SURT canonicalization + CDX capture-index tests
(operators/urlnorm.surt_key, sinks/cdx.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from secretscraper_spark.operators.urlnorm import surt_key
from secretscraper_spark.sinks.cdx import build_cdx, cdx_lookup


def _surt(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(surt_key(F.col("u")).alias("s")).collect()[0].s


def test_surt_key_canonical_form(spark):
    assert (
        _surt(spark, "HTTP://WWW.Sub.Example.COM:80/A/B?b=2&a=1#frag")
        == "com,example,sub)/a/b?a=1&b=2"
    )


def test_surt_key_edges(spark):
    # empty path -> '/', https default port dropped
    assert _surt(spark, "https://Example.com:443") == "com,example)/"
    # non-default port survives after the reversed host (IA form)
    assert _surt(spark, "http://example.com:8080/p") == "com,example:8080)/p"
    # www strip is the IA rule www\d*. applied ONCE to the leading label
    assert _surt(spark, "http://www2.example.com/") == "com,example)/"
    assert _surt(spark, "http://www.www2.example.com/") == (
        "com,example,www2)/"
    )
    # trailing FQDN dot: same DNS host, same key range
    assert _surt(spark, "http://example.com./x") == "com,example)/x"
    # default port compared numerically; kept ports render unpadded
    assert _surt(spark, "http://example.com:080/x") == "com,example)/x"
    assert _surt(spark, "http://example.com:08080/x") == (
        "com,example:8080)/x"
    )
    # http(s) with an empty authority is garbage, not a key
    assert _surt(spark, "http:///x") is None
    assert _surt(spark, "http://?a=1") is None
    # non-http(s) and garbage -> NULL
    assert _surt(spark, "ftp://example.com/x") is None
    assert _surt(spark, "not a url") is None
    # IPv4 hosts are NOT reversed (IA canonicalizer) — octet reversal
    # would scatter one host's captures across the key space
    assert _surt(spark, "http://10.0.0.1/x") == "10.0.0.1)/x"
    assert _surt(spark, "http://10.0.0.1:8080/x") == "10.0.0.1:8080)/x"
    # userinfo stripped: the capture sorts inside its domain's range
    assert _surt(spark, "http://alice@Example.com/x") == "com,example)/x"
    assert (
        _surt(spark, "http://u:pw@example.com:443/x") == "com,example:443)/x"
    )


def _fetched(spark):
    rows = [
        ("http://B.example/two", 200, 2000, "text/html", b"bb"),
        ("http://a.example/one", 200, 1000, "text/html", b"aa"),
        ("http://a.example/one", 304, 3000, "text/html", None),
        ("mailto:x@y", 0, 1, "x", b"drop me"),
    ]
    return spark.createDataFrame(
        rows, "url_norm string, status int, fetched_ms long, mime string, "
        "bytes binary"
    )


def test_build_cdx_records_and_global_order(spark):
    cdx = build_cdx(_fetched(spark), num_shards=3)
    rows = []
    # read shards in partition order WITHOUT re-sorting: range partitioning
    # + in-partition sort must already yield the global (surt, ts) order
    for pdf in cdx.toPandas().itertuples():
        rows.append(pdf)
    keys = [(r.surt, r.ts_ms) for r in rows]
    assert keys == sorted(keys)
    assert keys == [
        ("example,a)/one", 1000),
        ("example,a)/one", 3000),
        ("example,b)/two", 2000),
    ]
    first = rows[0]
    assert first.url == "http://a.example/one"
    assert first.status == 200
    assert first.mime == "text/html"
    assert first.digest == hashlib.md5(b"aa").hexdigest()
    assert first.length == 2
    # NULL payload -> recorded empty capture
    revisit = rows[1]
    assert revisit.digest == hashlib.md5(b"").hexdigest()
    assert revisit.length == 0


def test_cdx_lookup_prefix(spark):
    cdx = build_cdx(_fetched(spark), num_shards=2)
    got = [r.url for r in cdx_lookup(cdx, "example,a)").collect()]
    assert got == ["http://a.example/one", "http://a.example/one"]
    # domain-level prefix: the point of SURT — one contiguous range
    assert cdx_lookup(cdx, "example,").count() == 3
    assert cdx_lookup(cdx, "org,").count() == 0


def test_cdx_lookup_host_prefix_is_token_anchored(spark):
    rows = [
        ("http://a.example/one", 200, 1, "text/html", b"x"),
        ("http://aa.example/two", 200, 2, "text/html", b"y"),
        ("http://sub.a.example/three", 200, 3, "text/html", b"z"),
    ]
    df = spark.createDataFrame(
        rows, "url_norm string, status int, fetched_ms long, mime string, "
        "bytes binary"
    )
    cdx = build_cdx(df, num_shards=2)
    # 'example,a' must match a.example and its subdomains — never
    # aa.example, whose key merely shares the text prefix
    got = {r.url for r in cdx_lookup(cdx, "example,a").collect()}
    assert got == {"http://a.example/one", "http://sub.a.example/three"}
