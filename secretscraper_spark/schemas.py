"""Declared StructTypes — the engine never relies on schema inference.

The ``pages`` schema is the driver-mandated image+caption store
(BASELINE.json input_hint); ``frontier``/``seen``/``edges``/``secrets``
re-express the reference's in-memory object graph (entity.py:15-44,
crawler.py:115-127) as columnar tables.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The parsed-URL 6-tuple IS the node identity (reference entity.py:21-22).
URL_PART_FIELDS = [
    T.StructField("scheme", T.StringType()),
    T.StructField("netloc", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("params", T.StringType()),
    T.StructField("query", T.StringType()),
    T.StructField("fragment", T.StringType()),
]

# canonical serialization of the 6-tuple; dedup key of the whole engine
URL_NORM_FIELD = T.StructField("url_norm", T.StringType())

FRONTIER_SCHEMA = T.StructType(
    [
        URL_NORM_FIELD,
        *URL_PART_FIELDS,
        T.StructField("depth", T.IntegerType()),
        T.StructField("parent_norm", T.StringType()),
        T.StructField("discovery_seq", T.LongType()),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        URL_NORM_FIELD,
        T.StructField("depth", T.IntegerType()),
        T.StructField("discovery_seq", T.LongType()),
    ]
)

# crawled node state (reference URLNode mutable fields, entity.py:23-28)
NODES_SCHEMA = T.StructType(
    [
        URL_NORM_FIELD,
        *URL_PART_FIELDS,
        T.StructField("depth", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("content_type", T.StringType()),
    ]
)

# url_dict/js_dict unified (reference crawler.py:118-123); kind ∈ {url, js}
EDGES_SCHEMA = T.StructType(
    [
        T.StructField("parent_norm", T.StringType()),
        T.StructField("child_norm", T.StringType()),
        T.StructField("kind", T.StringType()),
    ]
)

SECRETS_SCHEMA = T.StructType(
    [
        URL_NORM_FIELD,
        T.StructField("rule_name", T.StringType()),
        T.StructField("match", T.StringType()),
    ]
)

# driver-mandated fetched-payload store (BASELINE.json input_hint) plus the
# join-side columns of FIXTURES.md §1
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_norm", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("title", T.StringType()),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("disallow_prefix", T.StringType()),
        T.StructField("crawl_delay", T.DoubleType()),
    ]
)

RULES_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("regex", T.StringType()),
        T.StructField("loaded", T.BooleanType()),
    ]
)

# output of the link-extraction UDF: one array element per child
CHILD_STRUCT = T.StructType(
    [
        URL_NORM_FIELD,
        *URL_PART_FIELDS,
    ]
)

SECRET_STRUCT = T.StructType(
    [
        T.StructField("rule_name", T.StringType()),
        T.StructField("match", T.StringType()),
    ]
)
