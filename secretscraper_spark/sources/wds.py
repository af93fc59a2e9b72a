"""WebDataset-style tar-shard source — the reader counterpart of
``sinks/wds.py``.

A WebDataset corpus is a directory (or bucket prefix) of ``*.tar`` shards;
a sample is a maximal run of CONSECUTIVE members whose names share the
key prefix (name up to the FIRST dot of the basename; the remainder is
the extension). This module turns those shards back into the engine's
columnar shape: one row per (sample, payload member), with the sample's
``.txt`` member decoded as the caption and ``.json`` as metadata.

Spark shape:

- ``spark.read.format("binaryFile")`` over the shard glob — the shard is
  the parallelism unit, exactly as in a real WebDataset loader (tar is a
  sequential format; splitting inside one tar buys nothing, and
  binaryFile never splits a file). 10^5 shards → 10^5 independent tasks.
- one ``mapInPandas`` pass parses members with stdlib ``tarfile`` over an
  in-memory buffer and yields OUTPUT CHUNKS of bounded sample count, so a
  1000-sample shard never materializes as a single Arrow batch.
- memory bound: a task holds one shard's bytes (binaryFile row) plus one
  output chunk. Size shards 0.3-1 GB (writer doc) and, for multi-GB
  shards, set ``spark.sql.execution.arrow.maxRecordsPerBatch=1`` so the
  JVM feeds the Python worker one shard at a time — the same guidance as
  any whole-file Arrow pipeline.

Column pruning note: ``binaryFile`` supports predicate pushdown on path/
length only; payload pruning happens at sample granularity here (tar has
no column projection — that is WHY the curation funnel runs on parquet
and this format is only the last-mile loader surface).
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

#: one row per (sample, payload member); caption/meta repeat per payload.
WDS_SCHEMA = (
    "shard string, key string, fmt string, bytes binary, "
    "caption string, meta_json string"
)

#: samples per emitted output chunk (bounds Arrow batch memory)
_CHUNK_SAMPLES = 256


def _iter_samples(data: bytes) -> Iterator[tuple[str, dict[str, bytes]]]:
    """Yield (key, {ext: member_bytes}) per consecutive-key run."""
    with tarfile.open(fileobj=io.BytesIO(data), mode="r") as tar:
        key, members = None, {}
        for info in tar:
            if not info.isfile():
                continue
            base = os.path.basename(info.name)
            dot = base.find(".")
            k = base if dot < 0 else base[:dot]
            ext = "" if dot < 0 else base[dot + 1:]
            if key is not None and k != key:
                yield key, members
                members = {}
            key = k
            fh = tar.extractfile(info)
            members[ext] = fh.read() if fh is not None else b""
        if key is not None:
            yield key, members


def _sample_rows(shard: str, key: str, members: dict[str, bytes]) -> list[dict]:
    caption_b = members.pop("txt", None)
    caption = caption_b.decode("utf-8") if caption_b is not None else None
    meta_b = members.pop("json", None)
    meta = meta_b.decode("utf-8") if meta_b is not None else None
    rows = [
        {"shard": shard, "key": key, "fmt": ext, "bytes": payload,
         "caption": caption, "meta_json": meta}
        for ext, payload in members.items()
    ]
    if not rows:  # caption/meta-only sample (text datasets) stays a row
        rows = [{"shard": shard, "key": key, "fmt": None, "bytes": None,
                 "caption": caption, "meta_json": meta}]
    return rows


def read_wds_shards(spark: SparkSession, path: str,
                    glob: str = "*.tar") -> DataFrame:
    """Read WebDataset tar shards under *path* into WDS_SCHEMA rows.

    Compressed shards (``.tar.gz`` etc.) work unchanged — ``tarfile``'s
    ``mode="r"`` auto-detects the compression; pass the matching *glob*.
    """
    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for path_str, content in zip(batch["path"], batch["content"]):
                shard = os.path.basename(path_str)
                rows: list[dict] = []
                for key, members in _iter_samples(bytes(content)):
                    rows.extend(_sample_rows(shard, key, members))
                    if len(rows) >= _CHUNK_SAMPLES:
                        yield pd.DataFrame(rows)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows)

    return shards.mapInPandas(parse, WDS_SCHEMA)
