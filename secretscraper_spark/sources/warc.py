"""WARC (Web ARChive, ISO 28500) source — the public interchange format
for crawl output (Common Crawl, Internet Archive, wget --warc).

The reference engine only ever holds fetched pages in memory
(crawler.py:115-127's url_dict); a web-scale deployment instead lands and
re-reads crawl data as WARC, so the Spark engine treats it as a
first-class source:

- parse_warc_bytes / build_warc_bytes : exact record codec (pure python,
  used inside executors and by test fixtures — no external warc lib)
- read_warc            : distributed reader. WARC is NOT line-splittable
  (binary payloads may contain record markers), so parallelism is
  per-file — the standard approach for this format: Common Crawl ships
  ~1 GB files by design, 100 TB ≈ 10^5 files ≫ task slots, and .gz
  members decompress per file. ``sc.binaryFiles`` + a flatMap parse is
  the sanctioned imperative-per-partition case (record format Spark's
  readers cannot express).
- warc_responses_to_pages : bridge HTTP 'response' records into the
  engine's pages schema (url_norm/status/content_type/caption) so the
  whole extraction/report pipeline (P1-P3, K1-K7) runs unchanged over an
  archived crawl — scan_pages_for_secrets(read-back) ≡ live crawl.
"""

from __future__ import annotations

import gzip
from email.parser import BytesHeaderParser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("src_file", T.StringType()),
    ]
)

_CRLF = b"\r\n"


def build_warc_bytes(records: list[dict]) -> bytes:
    """Serialize records (dicts with the WARC_SCHEMA fields minus
    src_file; payload bytes) to a spec-shaped WARC/1.0 byte stream.
    Content-Length is computed, never trusted from the caller."""
    out = bytearray()
    for r in records:
        payload = r.get("payload") or b""
        out += b"WARC/1.0" + _CRLF
        out += b"WARC-Type: " + r["warc_type"].encode() + _CRLF
        if r.get("record_id"):
            out += b"WARC-Record-ID: " + r["record_id"].encode() + _CRLF
        if r.get("target_uri"):
            out += b"WARC-Target-URI: " + r["target_uri"].encode() + _CRLF
        if r.get("warc_date"):
            out += b"WARC-Date: " + r["warc_date"].encode() + _CRLF
        if r.get("content_type"):
            out += b"Content-Type: " + r["content_type"].encode() + _CRLF
        out += b"Content-Length: " + str(len(payload)).encode() + _CRLF
        out += _CRLF
        out += payload
        out += _CRLF + _CRLF
    return bytes(out)


def parse_warc_bytes(data: bytes, src_file: str = "") -> list[dict]:
    """Parse a WARC byte stream into record dicts. Walks records by
    Content-Length (the only correct way — payloads may contain
    ``WARC/1.0`` bytes), tolerates WARC/1.0 and 1.1, multi-member gzip
    handled by the caller. Malformed trailing garbage stops the walk
    rather than mis-framing records."""
    recs: list[dict] = []
    i = 0
    n = len(data)
    parser = BytesHeaderParser()
    while i < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, i):
            i += 2
        if i >= n:
            break
        eol = data.find(b"\r\n", i)
        if eol < 0 or not data[i:eol].startswith(b"WARC/"):
            break
        hdr_end = data.find(b"\r\n\r\n", eol)
        if hdr_end < 0:
            break
        headers = parser.parsebytes(data[eol + 2 : hdr_end + 2])
        try:
            length = int(headers.get("Content-Length", "0"))
        except ValueError:
            break
        if length < 0:
            # malformed/crafted record: a negative length would move the
            # cursor BACKWARD and loop forever on untrusted archive input
            break
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) < length:
            break
        recs.append(
            {
                "warc_type": headers.get("WARC-Type", ""),
                "record_id": headers.get("WARC-Record-ID", ""),
                "target_uri": headers.get("WARC-Target-URI", ""),
                "warc_date": headers.get("WARC-Date", ""),
                "content_type": headers.get("Content-Type", ""),
                "content_length": length,
                "payload": payload,
                "src_file": src_file,
            }
        )
        i = body_start + length
    return recs


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: one task per file (``binaryFiles``),
    pure-python record walk per file, declared schema. ``.gz`` files
    (including Common Crawl's concatenated per-record members) decompress
    as a multi-member stream. Parallelism = file count; at archive scale
    that is 10^4-10^5 files, far above any cluster's task slots."""

    def parse_file(kv):
        fname, data = kv
        if fname.endswith(".gz"):
            data = gzip.decompress(bytes(data))
        return parse_warc_bytes(bytes(data), src_file=fname)

    rdd = spark.sparkContext.binaryFiles(path).flatMap(parse_file)
    return spark.createDataFrame(
        rdd.map(
            lambda r: (
                r["warc_type"], r["record_id"], r["target_uri"],
                r["warc_date"], r["content_type"], r["content_length"],
                r["payload"], r["src_file"],
            )
        ),
        WARC_SCHEMA,
    )


def split_http_payload(payload: bytes) -> tuple[str, str, bytes]:
    """(status, content_type, body) from an ``application/http`` record
    payload (HTTP status line + headers + CRLFCRLF + body)."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return "Unknown", "", payload
    line_end = head.find(b"\r\n")
    status_line = head[: line_end if line_end >= 0 else len(head)]
    parts = status_line.split(b" ", 2)
    status = parts[1].decode("latin-1") if len(parts) >= 2 else "Unknown"
    headers = BytesHeaderParser().parsebytes(
        head[line_end + 2 :] + b"\r\n" if line_end >= 0 else b""
    )
    return status, headers.get("Content-Type", ""), body


def warc_responses_to_pages(warc: DataFrame) -> DataFrame:
    """HTTP ``response`` records → the engine's pages columns
    (url/url_norm/status/content_type/content_length/caption), so an
    archived crawl re-enters the extraction pipeline exactly where live
    fetches do. The HTTP split is an Arrow-batched pandas UDF (tiny
    per-record python, no per-row Spark UDF); everything downstream is
    the existing JVM/UDF path."""
    from pyspark.sql.functions import pandas_udf

    split_schema = T.StructType(
        [
            T.StructField("status", T.StringType()),
            T.StructField("http_content_type", T.StringType()),
            T.StructField("body", T.BinaryType()),
        ]
    )

    @pandas_udf(split_schema)
    def split_udf(payload: pd.Series) -> pd.DataFrame:
        rows = [split_http_payload(bytes(p or b"")) for p in payload]
        return pd.DataFrame(rows, columns=["status", "http_content_type", "body"])

    resp = warc.filter(F.lower("warc_type") == "response")
    split = resp.withColumn("hx", split_udf("payload"))
    return split.select(
        F.col("target_uri").alias("url"),
        F.col("target_uri").alias("url_norm"),
        F.col("hx.status").alias("status"),
        F.col("hx.http_content_type").alias("content_type"),
        F.length("hx.body").cast("long").alias("content_length"),
        F.col("hx.body").cast("string").alias("caption"),
    )
