"""Header sniffing vs hand-built container fixtures: every format's
dimensions come from bytes constructed here from the published header
layouts, independent of the implementation."""

from __future__ import annotations

import struct

from secretscraper_spark.operators.imagesniff import (
    metadata_mismatches,
    sniff_dimensions,
    sniff_header,
)
from secretscraper_spark.operators.imagecodec import encode_png, pixels_for


def _jpeg(w, h, *, progressive=False, junk_segments=2):
    """Minimal JPEG: SOI + APP0/COM filler + SOF0 (or SOF2) + EOI."""
    out = b"\xff\xd8"
    for i in range(junk_segments):
        payload = b"J" * (5 + i)
        out += b"\xff\xe0" + struct.pack(">H", len(payload) + 2) + payload
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    body = b"\x08" + struct.pack(">HH", h, w) + b"\x03"
    out += sof + struct.pack(">H", len(body) + 2) + body
    return out + b"\xff\xd9"


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def _bmp(w, h):
    return (
        b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 8
    )


def test_sniff_header_formats():
    png = encode_png(pixels_for(7, 5, 9))
    assert sniff_header(png) == ("png", 5, 9)
    assert sniff_header(_jpeg(640, 480)) == ("jpeg", 640, 480)
    assert sniff_header(_jpeg(31, 17, progressive=True)) == ("jpeg", 31, 17)
    assert sniff_header(_gif(12, 34)) == ("gif", 12, 34)
    assert sniff_header(_bmp(100, 200)) == ("bmp", 100, 200)
    assert sniff_header(_bmp(100, -200)) == ("bmp", 100, 200)  # top-down
    for junk in (None, b"", b"notanimage", png[:10], _jpeg(9, 9)[:6]):
        assert sniff_header(junk) == (None, None, None)


def test_sniff_dimensions_and_mismatch_audit(spark):
    png = encode_png(pixels_for(1, 8, 6))
    rows = [
        ("ok",    png,            "png",  8, 6),
        ("wrongd", png,           "png",  9, 6),     # dims lie
        ("wrongf", _gif(8, 6),    "png",  8, 6),     # fmt lies
        ("corrupt", b"xx",        "png",  8, 6),     # unparseable
        ("jp",    _jpeg(20, 10),  "JPEG", 20, 10),   # case-folded fmt ok
    ]
    df = spark.createDataFrame(rows, ["image_id", "bytes", "fmt", "w", "h"])
    sn = {r["image_id"]: r.asDict() for r in sniff_dimensions(df).collect()}
    assert (sn["ok"]["sniff_fmt"], sn["ok"]["sniff_w"], sn["ok"]["sniff_h"]) == ("png", 8, 6)
    assert sn["corrupt"]["sniff_fmt"] is None and sn["corrupt"]["sniff_w"] is None

    audit = {r["image_id"]: r.asDict() for r in metadata_mismatches(df).collect()}
    assert (audit["ok"]["header_ok"], audit["ok"]["dims_ok"], audit["ok"]["fmt_ok"]) == (True, True, True)
    assert audit["wrongd"]["dims_ok"] is False
    assert audit["wrongf"]["fmt_ok"] is False and audit["wrongf"]["dims_ok"] is True
    assert audit["corrupt"]["header_ok"] is False
    assert (audit["jp"]["fmt_ok"], audit["jp"]["dims_ok"]) == (True, True)
