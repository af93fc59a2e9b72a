"""Pages-store I/O across source formats.

The engine's canonical store is parquet/Iceberg, but fetched-page feeds
arrive in whatever a fleet emits; these helpers read/write the pages table
as parquet, JSON-lines, or CSV with the declared schema enforced (no
inference in the engine path, SURVEY §1.3). Binary image bytes are not
representable in text formats — JSON/CSV round-trip them base64-encoded in
a ``bytes_b64`` column, decoded back on read (JVM `base64`/`unbase64`
exprs, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import PAGES_SCHEMA

_TEXT_FORMATS = ("json", "csv")


def _text_schema():
    from pyspark.sql import types as T

    fields = [
        f for f in PAGES_SCHEMA.fields if f.name != "bytes"
    ] + [T.StructField("bytes_b64", T.StringType())]
    return T.StructType(fields)


def write_pages(pages: DataFrame, path: str, fmt: str = "parquet") -> None:
    if fmt == "parquet":
        pages.write.mode("overwrite").parquet(path)
        return
    if fmt in _TEXT_FORMATS:
        out = pages.withColumn("bytes_b64", F.base64("bytes")).drop("bytes")
        w = out.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", True).option("escape", '"')
        getattr(w, fmt)(path)
        return
    raise ValueError(f"unsupported pages format {fmt!r}")


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt == "parquet":
        return spark.read.schema(PAGES_SCHEMA).parquet(path)
    if fmt in _TEXT_FORMATS:
        r = spark.read.schema(_text_schema())
        if fmt == "csv":
            # multiLine: captions legitimately contain newlines; the writer
            # quotes them, the reader must not split records on them
            r = r.option("header", True).option("multiLine", True).option("escape", '"')
        df = getattr(r, fmt)(path)
        # preserve NULL bytes (pages generated without images): a NULL
        # bytes_b64 must round-trip to NULL binary, not b""
        return df.withColumn(
            "bytes",
            F.when(F.col("bytes_b64").isNull(), F.lit(None).cast("binary"))
            .otherwise(F.unbase64("bytes_b64")),
        ).drop("bytes_b64").select([f.name for f in PAGES_SCHEMA.fields])
    raise ValueError(f"unsupported pages format {fmt!r}")
