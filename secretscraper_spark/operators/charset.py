"""Charset sniffing over raw payload bytes — the pre-extraction text gate.

A crawler lands payloads as opaque ``binary``; before any caption/text
extraction the pipeline must know whether the bytes ARE text and in what
encoding — feeding mojibake into the regex/secret extractors yields
garbage matches, and Spark 4's ``decode`` (ANSI mode) throws
``MALFORMED_CHARACTER_CODING`` task errors on the first bad byte, which
a 100 TB job cannot afford. This module classifies without ever risking
a throw:

- ``bom``        — byte-order-mark family from raw prefix bytes (hex
  compare on substrings; UTF-32 checked before UTF-16 because their
  marks share prefixes).
- ``utf8_valid`` — Spark's builtin ``is_valid_utf8`` (JVM, codegen; no
  Python, no exception path).
- ``n_chars``    — decoded length via ``try_validate_utf8`` (NULL on
  invalid instead of throwing).
- ``ascii_only`` — char count == byte count on valid rows: a pure
  integer identity, no second scan of the bytes.

Everything is one map-only projection over the scan — the same
zero-decode contract as ``operators/imagesniff`` on the image side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def charset_profile(
    df: DataFrame, bytes_col: str = "bytes", keep: list[str] | None = None
) -> DataFrame:
    """Append (bom, utf8_valid, n_bytes, n_chars, ascii_only) derived
    from *bytes_col*; *keep* selects the passthrough columns (default:
    all originals). NULL payloads profile as invalid with n_bytes 0."""
    b = F.coalesce(F.col(bytes_col), F.lit(b""))
    h2 = F.hex(F.substring(b, 1, 2))
    h3 = F.hex(F.substring(b, 1, 3))
    h4 = F.hex(F.substring(b, 1, 4))
    bom = (
        F.when(h4 == "FFFE0000", F.lit("utf32le"))
        .when(h4 == "0000FEFF", F.lit("utf32be"))
        .when(h3 == "EFBBBF", F.lit("utf8-bom"))
        .when(h2 == "FFFE", F.lit("utf16le"))
        .when(h2 == "FEFF", F.lit("utf16be"))
        .otherwise(F.lit("none"))
    )
    n_chars = F.char_length(F.try_validate_utf8(b))
    cols = keep if keep is not None else df.columns
    return df.select(
        *cols,
        bom.alias("bom"),
        F.is_valid_utf8(b).alias("utf8_valid"),
        F.octet_length(b).cast("long").alias("n_bytes"),
        n_chars.cast("long").alias("n_chars"),
        (n_chars == F.octet_length(b)).alias("ascii_only"),
    )
