"""Charset sniffing (operators/charset.py)."""

from __future__ import annotations

from secretscraper_spark.operators.charset import charset_profile


def test_charset_profile_classes(spark):
    rows = [
        ("ascii", b"plain ascii"),
        ("utf8", "café".encode("utf-8")),
        ("utf8bom", b"\xef\xbb\xbfx"),
        ("utf16le", b"\xff\xfeA\x00"),
        ("utf16be", b"\xfe\xff\x00A"),
        ("utf32le", b"\xff\xfe\x00\x00A\x00\x00\x00"),
        ("utf32be", b"\x00\x00\xfe\xffA"),
        ("badseq", b"bad \xc3\x28 seq"),
        ("nullrow", None),
    ]
    df = spark.createDataFrame(rows, "id string, bytes binary")
    got = {
        r.id: (r.bom, r.utf8_valid, r.n_bytes, r.n_chars, r.ascii_only)
        for r in charset_profile(df, keep=["id"]).collect()
    }
    assert got["ascii"] == ("none", True, 11, 11, True)
    # é is 2 bytes 1 char
    assert got["utf8"] == ("none", True, 5, 4, False)
    # BOM decodes to U+FEFF: 4 bytes, 2 chars, valid UTF-8
    assert got["utf8bom"] == ("utf8-bom", True, 4, 2, False)
    assert got["utf16le"][:2] == ("utf16le", False)
    assert got["utf16be"][:2] == ("utf16be", False)
    # UTF-32 marks win over their UTF-16 prefixes
    assert got["utf32le"][:2] == ("utf32le", False)
    assert got["utf32be"][:2] == ("utf32be", False)
    assert got["badseq"] == ("none", False, 10, None, None)
    assert got["nullrow"] == ("none", True, 0, 0, True)


def test_charset_profile_map_only(spark):
    df = spark.createDataFrame([("a", b"x")], "id string, bytes binary")
    plan = (
        charset_profile(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
