"""WARC source tests: codec roundtrip (binary payloads containing record
markers, gzip members), distributed read, and the response→pages bridge
feeding the engine's secret-extraction operator unchanged."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from secretscraper_spark.config import loaded_rules
from secretscraper_spark.functions.extract import make_secrets_udf
from secretscraper_spark.sources import warc


def _records():
    return [
        {
            "warc_type": "warcinfo",
            "record_id": "<urn:uuid:0>",
            "target_uri": "",
            "warc_date": "2026-01-01T00:00:00Z",
            "content_type": "application/warc-fields",
            "payload": b"software: secretscraper_spark\r\n",
        },
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:1>",
            "target_uri": "http://a.example/page",
            "warc_date": "2026-01-01T00:00:01Z",
            "content_type": "application/http; msgtype=response",
            "payload": (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                b"<html>sourcemap hint: /xx/static/app.js.map</html>"
            ),
        },
        {
            "warc_type": "resource",
            "record_id": "<urn:uuid:2>",
            "target_uri": "http://a.example/blob",
            "warc_date": "2026-01-01T00:00:02Z",
            "content_type": "application/octet-stream",
            # payload embeds a fake record marker + CRLFCRLF: framing must
            # come from Content-Length, never from scanning
            "payload": b"\x00\x01WARC/1.0\r\n\r\nfake: header\r\n\r\n\xff\xfe",
        },
    ]


def test_warc_codec_roundtrip():
    data = warc.build_warc_bytes(_records())
    back = warc.parse_warc_bytes(data, src_file="t.warc")
    assert len(back) == 3
    for want, got in zip(_records(), back):
        for k in ("warc_type", "record_id", "target_uri", "warc_date", "content_type"):
            assert got[k] == want[k]
        assert got["payload"] == want["payload"]
        assert got["content_length"] == len(want["payload"])
        assert got["src_file"] == "t.warc"


def test_read_warc_distributed(spark, tmp_path):
    plain = tmp_path / "a.warc"
    plain.write_bytes(warc.build_warc_bytes(_records()))
    gz = tmp_path / "b.warc.gz"
    # two concatenated gzip members (the Common Crawl per-record layout)
    gz.write_bytes(
        gzip.compress(warc.build_warc_bytes(_records()[:1]))
        + gzip.compress(warc.build_warc_bytes(_records()[1:]))
    )
    df = warc.read_warc(spark, str(tmp_path) + "/*.warc*")
    rows = df.collect()
    assert len(rows) == 6
    by_file = {(r.src_file.rsplit("/", 1)[-1], r.record_id) for r in rows}
    assert ("a.warc", "<urn:uuid:2>") in by_file
    assert ("b.warc.gz", "<urn:uuid:2>") in by_file
    blob = [r for r in rows if r.warc_type == "resource"][0]
    assert bytes(blob.payload) == _records()[2]["payload"]
    assert df.schema == warc.WARC_SCHEMA


def test_warc_responses_to_pages_bridge(spark, tmp_path):
    p = tmp_path / "c.warc"
    p.write_bytes(warc.build_warc_bytes(_records()))
    pages = warc.warc_responses_to_pages(warc.read_warc(spark, str(p)))
    rows = pages.collect()
    assert len(rows) == 1  # only the response record crosses the bridge
    r = rows[0]
    assert r.url_norm == "http://a.example/page"
    assert r.status == "200"
    assert r.content_type == "text/html"
    assert r.caption == "<html>sourcemap hint: /xx/static/app.js.map</html>"
    assert r.content_length == len(r.caption)
    # the archived crawl feeds the SAME extraction operator as live pages
    udf = make_secrets_udf(loaded_rules())
    secrets = pages.select("url_norm", F.explode(udf("caption")).alias("s"))
    hits = secrets.select("s.rule_name").collect()
    assert any(h.rule_name == "JS Map" for h in hits)


def test_parse_warc_truncated_tail_stops_cleanly():
    data = warc.build_warc_bytes(_records())
    # cut mid-payload of the final record: earlier records still parse
    cut = data[: len(data) - 10]
    back = warc.parse_warc_bytes(cut)
    assert len(back) == 2


def test_parse_warc_negative_length_stops_cleanly():
    # a crafted negative Content-Length must not move the cursor backward
    # (pre-guard this looped forever appending bogus records)
    data = warc.build_warc_bytes(_records()[:1])
    evil = data + b"WARC/1.0\r\nContent-Length: -33\r\n\r\n"
    back = warc.parse_warc_bytes(evil)
    assert len(back) == 1  # the valid record only, and we returned at all
