"""WebDataset-style tar-shard sink — packing curated image+caption
samples into the sequential-read format multimodal training loaders use.

The curation funnel ends in parquet/Iceberg (columnar, pruned scans), but
a dataloader streaming 100 TB into GPU hosts wants large SEQUENTIAL
shards, not row-group random access: the WebDataset convention (one tar
per shard; each sample = a run of members sharing a key prefix, e.g.
``000123.png`` + ``000123.txt`` + ``000123.json``) is the de-facto public
format for that (webdataset/webdataset README; the tar layout itself is
plain POSIX tar — stdlib ``tarfile`` writes it, no extra wheel).

Spark shape — every step is the scalable form:

- global sample order comes from ``plans/ranking.assign_global_seq``
  (two-phase zipWithIndex — parallel, never a one-task window), so shard
  membership is a DETERMINISTIC function of the sort key, independent of
  partition layout: shard_id = seq // samples_per_shard. Re-running the
  job bit-reproduces every shard.
- one ``applyInPandas`` group per shard writes its tar. A shard is
  bounded by samples_per_shard × sample size — size it to the 0.3-1 GB
  shards real WebDataset pipelines use so a group fits one task's memory
  (same bound a real shard writer has: the shard IS the unit of work).
- tar bytes are canonical: USTAR-era fields zeroed (mtime=0, uid/gid=0,
  empty uname/gname, mode 0644, GNU format for >100-char names), members
  emitted in (seq, payload→caption→meta) order — two runs over the same
  rows produce byte-identical shards (tested).
- the write is idempotent under Spark task retry: each task writes to a
  pid/attempt-unique temp file in the target dir, then ``os.replace`` —
  the atomic-rename commit a posix/fuse mount gives; a retried task
  replaces with identical bytes.
- the returned manifest (one row per shard: path, n_samples, n_bytes,
  key range) is ``localCheckpoint``-materialized so the write runs
  EXACTLY ONCE, eagerly, and the manifest stays a DataFrame (10^7 shards
  at 10^10 samples must never transit the driver).

Reference seam: the reference's CSV/report sinks (`secretscraper/output
formatter`) are row sinks; this is the payload-table sink the north rule
adds ("fetched payloads land in the image+caption table") re-expressed
for the training-loader side. Reader counterpart: ``sources/wds.py``.
"""

from __future__ import annotations

import io
import os
import tarfile
import uuid

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..plans.ranking import assign_global_seq

#: manifest row per written shard
MANIFEST_SCHEMA = (
    "shard_id long, path string, n_samples long, n_bytes long, "
    "key_min string, key_max string"
)


def _member(tar: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(data)
    info.mtime = 0
    info.uid = 0
    info.gid = 0
    info.uname = ""
    info.gname = ""
    info.mode = 0o644
    tar.addfile(info, io.BytesIO(data))


def write_wds_shards(
    df: DataFrame,
    out_dir: str,
    samples_per_shard: int = 1000,
    key_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    caption_col: str = "caption",
    meta_col: str | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Pack *df* into ``out_dir/shard-%06d.tar`` WebDataset shards; return
    the materialized manifest DataFrame (MANIFEST_SCHEMA).

    Per sample, members ``{key}.{fmt}`` (payload bytes), ``{key}.txt``
    (caption, utf-8) and — when *meta_col* is given — ``{key}.json`` are
    written contiguously. Keys must be non-null, unique under the sort,
    and contain no ``/`` (member names are flat; a slash would silently
    change the reader's key grouping — rejected per batch). A null/empty
    payload writes a zero-byte member (text-only datasets stay valid).

    *order_cols* (default ``[key_col]``) define the global sample order —
    and therefore shard assignment — via the two-phase rank.
    """
    if samples_per_shard <= 0:
        raise ValueError("samples_per_shard must be positive")
    os.makedirs(out_dir, exist_ok=True)

    cols = [
        F.col(key_col).cast("string").alias("_key"),
        F.col(bytes_col).cast("binary").alias("_payload"),
        F.col(fmt_col).cast("string").alias("_fmt"),
        F.col(caption_col).cast("string").alias("_caption"),
    ]
    cols.append(
        (F.col(meta_col) if meta_col else F.lit(None)).cast("string").alias("_meta")
    )
    # caller-supplied order columns ride along (they may be any df columns,
    # e.g. a quality score) and are dropped after ranking
    extra = [c for c in (order_cols or []) if c not in ("_key",)]
    slim = df.select(*cols, *[F.col(c) for c in extra])

    seqd = assign_global_seq(slim, ["_key"] if order_cols is None else order_cols,
                             seq_col="_seq")
    if extra:
        seqd = seqd.drop(*extra)
    sharded = seqd.withColumn(
        "_shard", (F.col("_seq") / F.lit(samples_per_shard)).cast("long")
    )

    write_meta = meta_col is not None

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_seq")
        shard_id = int(pdf["_shard"].iloc[0])
        keys = pdf["_key"]
        if keys.isna().any():
            raise ValueError("wds sink: null key")
        # '/' would nest members in tar directories; '.' would make the
        # reader (which splits the basename at the FIRST dot) regroup the
        # sample under a truncated key. Both corrupt silently on read-back.
        bad = keys[keys.str.contains("/", regex=False)
                   | keys.str.contains(".", regex=False)]
        if len(bad):
            raise ValueError(f"wds sink: key contains '/' or '.': {bad.iloc[0]!r}")
        path = os.path.join(out_dir, f"shard-{shard_id:06d}.tar")
        tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.GNU_FORMAT) as tar:
            for _, row in pdf.iterrows():
                key = row["_key"]
                payload = row["_payload"]
                fmt = row["_fmt"] or "bin"
                # 'txt'/'json' are the caption/meta member extensions — a
                # payload named '{key}.txt' would silently REPLACE the
                # caption in the reader's members dict (last member wins).
                if fmt in ("txt", "json") or "/" in fmt or "." in fmt:
                    raise ValueError(f"wds sink: reserved/invalid fmt {fmt!r}")
                _member(tar, f"{key}.{fmt}",
                        bytes(payload) if payload is not None else b"")
                _member(tar, f"{key}.txt",
                        (row["_caption"] or "").encode("utf-8"))
                if write_meta:
                    _member(tar, f"{key}.json",
                            (row["_meta"] or "").encode("utf-8"))
        data = buf.getvalue()
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)  # atomic commit; retries rewrite same bytes
        return pd.DataFrame(
            {
                "shard_id": [shard_id],
                "path": [path],
                "n_samples": [len(pdf)],
                "n_bytes": [len(data)],
                # min/max, NOT first/last: samples arrive in _seq order,
                # which is the caller's order_cols (e.g. a quality
                # score), not necessarily key order
                "key_min": [keys.min()],
                "key_max": [keys.max()],
            }
        )

    manifest = (
        sharded.groupBy("_shard")
        .applyInPandas(write_shard, MANIFEST_SCHEMA)
        # materialize NOW, exactly once, executor-side; the manifest can be
        # shard-count huge, so it stays distributed (never .collect()).
        .localCheckpoint()
    )
    return manifest
