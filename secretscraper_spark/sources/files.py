"""Sources S1 (seed list) and S4 (local file scan).

S1 — seed-list source (reference facade.py:176-192; cmdline -u/-f): read
one URL per line, strip blanks, collapse duplicates.

S4 — local file corpus (reference facade.py:404-414 rglob + scanner.py:33-47
utf-8 errors=ignore): Spark binaryFile source with recursive lookup, decoded
losslessly-ish the same way; the secrets UDF then runs per file — the same
extraction operator as the crawl (one implementation, two sources,
SURVEY §3.2).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import loaded_rules
from ..functions.extract import make_secrets_udf


def read_seed_file(spark: SparkSession, path: str) -> list[str]:
    """Seed URLs from a file, driver-side (seed lists are small): one per
    line, blanks skipped, duplicates collapsed preserving first occurrence."""
    rows = spark.read.text(path).collect()
    out: list[str] = []
    seen = set()
    for r in rows:
        u = r.value.strip()
        if u and u not in seen:
            seen.add(u)
            out.append(u)
    return out


def scan_files(spark: SparkSession, root: str, glob: str = "*") -> DataFrame:
    """(path, text) for every file under root, recursive; utf-8 decode with
    errors ignored (scanner.py:40: read as text, errors='ignore')."""
    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(root)
    )

    @F.pandas_udf("string")
    def decode_ignore(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(lambda b: b.decode("utf-8", errors="ignore") if b is not None else "")

    return raw.select(
        F.col("path"), decode_ignore(F.col("content")).alias("text")
    )


def scan_secrets(
    spark: SparkSession, root: str, rules: dict[str, str] | None = None
) -> DataFrame:
    """The FileScannerFacade pipeline (SURVEY §3.2): files → secrets UDF →
    (path, rule_name, match), set-deduped per file (scanner.py:44).
    *rules* defaults to the shipped config; the facade passes the
    YAML/env-merged set (settings.py)."""
    files = scan_files(spark, root)
    udf = make_secrets_udf(loaded_rules() if rules is None else rules)
    return (
        files.select("path", F.explode(udf("text")).alias("s"))
        .select("path", "s.rule_name", "s.match")
        .dropDuplicates(["path", "rule_name", "match"])
    )
