"""Zero-decode image metadata sniffing: container format + dimensions
straight from the header bytes, no codec, no image library.

Every web-scale image pipeline needs (fmt, w, h) long before it can
afford a decode — for size/aspect gating (multimodal.filter_images), AR
bucketing (imagebatch), and for DISTRUSTING the crawl's own metadata
columns (a declared 512×512 JPEG whose header says 16×16 is a corrupt or
adversarial payload). This module parses the four dominant container
headers directly — the same bytes Pillow's lazy ``Image.open`` reads —
in pure Python over Arrow batches:

- PNG:  8-byte signature, then IHDR (first chunk, fixed offset).
- JPEG: marker scan to the first SOF0/1/2 frame header (skipping
  APPn/DQT/etc. via their big-endian lengths; standalone markers have
  no length and are stepped over).
- GIF:  6-byte version signature, then the little-endian logical
  screen descriptor.
- BMP:  'BM' + BITMAPINFOHEADER (little-endian signed; height may be
  negative for top-down rows — reported as |h|).

Returns NULL fmt/dims for anything unrecognized or truncated — the
caller's funnel counts those as reject rows rather than erroring the
scan. The Spark surface is one Arrow-batched ``mapInPandas``
(header-only byte peeks per row; the payload column is never copied
beyond the batch Arrow already materialized).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF markers that carry frame dimensions (C0-C3, C5-C7, C9-CB, CD-CF —
# i.e. every SOFn; C4/C8/CC are DHT/JPG/DAC, not frames)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}
# standalone markers with no length word
_JPEG_STANDALONE = set(range(0xD0, 0xD8)) | {0x01}


def sniff_header(data: bytes | None) -> tuple[str | None, int | None, int | None]:
    """(fmt, w, h) from container header bytes, or (None, None, None)."""
    if not data or len(data) < 10:
        return (None, None, None)
    try:
        if data[:8] == _PNG_SIG and data[12:16] == b"IHDR" and len(data) >= 24:
            w, h = struct.unpack(">II", data[16:24])
            return ("png", int(w), int(h))
        if data[:2] == b"\xff\xd8":  # JPEG SOI
            i = 2
            n = len(data)
            while i + 3 < n:
                if data[i] != 0xFF:
                    return (None, None, None)  # desynced marker stream
                marker = data[i + 1]
                if marker == 0xFF:  # fill byte
                    i += 1
                    continue
                if marker in _JPEG_STANDALONE:
                    i += 2
                    continue
                if i + 4 > n:
                    break
                seglen = struct.unpack(">H", data[i + 2:i + 4])[0]
                if marker in _JPEG_SOF:
                    if i + 9 > n:
                        break
                    h, w = struct.unpack(">HH", data[i + 5:i + 9])
                    return ("jpeg", int(w), int(h))
                i += 2 + seglen
            return (None, None, None)
        if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
            w, h = struct.unpack("<HH", data[6:10])
            return ("gif", int(w), int(h))
        if data[:2] == b"BM" and len(data) >= 26:
            # dims live where the DIB header version puts them:
            # BITMAPCOREHEADER (size 12) carries int16 w/h at 18/20;
            # INFO and later carry int32s at 18/22
            dib = struct.unpack("<I", data[14:18])[0]
            if dib == 12:
                w, h = struct.unpack("<HH", data[18:22])
            else:
                w, h = struct.unpack("<ii", data[18:26])
            return ("bmp", int(abs(w)), int(abs(h)))
    except struct.error:
        return (None, None, None)
    return (None, None, None)


SNIFF_SCHEMA_FIELDS = [
    StructField("sniff_fmt", StringType()),
    StructField("sniff_w", IntegerType()),
    StructField("sniff_h", IntegerType()),
]


def sniff_dimensions(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    carry_cols: dict[str, str] | None = None,
) -> DataFrame:
    """(id, [carried cols], sniff_fmt, sniff_w, sniff_h) per payload — one
    Arrow-batched header peek per row, map-only, no shuffle. Unrecognized
    or truncated payloads come back with NULL fmt/dims (curation funnels
    count them; the scan never errors). *carry_cols* (alias → source
    column) rides extra columns through the same Arrow batch so callers
    never need an id-keyed join back to the input."""
    carry_cols = carry_cols or {}
    id_field = df.schema[id_col]
    out_schema = StructType(
        [StructField(id_col, id_field.dataType)]
        + [StructField(a, df.schema[src].dataType)
           for a, src in carry_cols.items()]
        + SNIFF_SCHEMA_FIELDS
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sniffed = [sniff_header(b) for b in pdf[bytes_col]]
            out = {id_col: pdf[id_col]}
            for a in carry_cols:
                out[a] = pdf[a]
            out["sniff_fmt"] = [s[0] for s in sniffed]
            out["sniff_w"] = pd.array([s[1] for s in sniffed], dtype="Int32")
            out["sniff_h"] = pd.array([s[2] for s in sniffed], dtype="Int32")
            yield pd.DataFrame(out)

    slim = df.select(
        id_col,
        *[F.col(src).alias(a) for a, src in carry_cols.items()],
        bytes_col,
    )
    return slim.mapInPandas(batches, out_schema)


def metadata_mismatches(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Audit the input-hint table's DECLARED (fmt, w, h) against the
    payload's actual header: rows whose payload is unparseable or whose
    header disagrees with the metadata columns — corrupt fetches,
    mislabeled rows, and adversarial payloads. Returns every row with
    ``sniff_*`` columns plus ``header_ok`` / ``dims_ok`` / ``fmt_ok``;
    filter on ``NOT (header_ok AND dims_ok AND fmt_ok)`` for the reject
    stream. One sniff pass, map-only — the declared columns ride through
    the Arrow batch, so there is NO join back to the input."""
    j = sniff_dimensions(
        df,
        id_col=id_col,
        bytes_col=bytes_col,
        carry_cols={"decl_fmt": fmt_col, "decl_w": w_col, "decl_h": h_col},
    )
    return j.select(
        id_col,
        "decl_fmt", "decl_w", "decl_h",
        "sniff_fmt", "sniff_w", "sniff_h",
        F.col("sniff_fmt").isNotNull().alias("header_ok"),
        (
            (F.col("sniff_w") == F.col("decl_w"))
            & (F.col("sniff_h") == F.col("decl_h"))
        ).alias("dims_ok"),
        (F.col("sniff_fmt") == F.lower(F.col("decl_fmt"))).alias("fmt_ok"),
    )
