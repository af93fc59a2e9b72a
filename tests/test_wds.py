"""WebDataset tar-shard sink/source (sinks/wds.py, sources/wds.py):
round-trip exactness, byte-determinism, manifest accounting, key safety,
and the consecutive-key sample grouping convention."""

from __future__ import annotations

import io
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from secretscraper_spark.sinks.wds import write_wds_shards
from secretscraper_spark.sources.sitegen import generate_pages_spark
from secretscraper_spark.sources.wds import read_wds_shards


def _pairs(spark, n=30):
    pages = generate_pages_spark(spark, n, n_hosts=4, include_images=True,
                                 partitions=4)
    return pages.select(
        "image_id", "bytes", "fmt", "caption",
        F.to_json(F.struct("w", "h", "phash")).alias("meta"),
    )


def test_roundtrip_images_exact(spark, tmp_path):
    src = _pairs(spark, 30)
    out = str(tmp_path / "shards")
    manifest = write_wds_shards(
        src, out, samples_per_shard=8, meta_col="meta",
    )
    assert manifest.count() == 4  # ceil(30/8)

    back = read_wds_shards(spark, out)
    want = {
        (r.image_id, r.fmt, bytes(r.bytes), r.caption, r.meta)
        for r in src.collect()
    }
    got = {
        (r.key, r.fmt, bytes(r.bytes), r.caption, r.meta_json)
        for r in back.collect()
    }
    assert got == want


def test_write_is_byte_deterministic(spark, tmp_path):
    src = _pairs(spark, 17)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_wds_shards(src.repartition(5), a, samples_per_shard=6,
                     meta_col="meta").count()
    write_wds_shards(src.repartition(2), b, samples_per_shard=6,
                     meta_col="meta").count()
    names = sorted(os.listdir(a))
    assert names == sorted(os.listdir(b)) and names
    for n in names:
        with open(os.path.join(a, n), "rb") as fa, \
             open(os.path.join(b, n), "rb") as fb:
            assert fa.read() == fb.read(), n


def test_manifest_accounting(spark, tmp_path):
    src = _pairs(spark, 30)
    out = str(tmp_path / "shards")
    m = write_wds_shards(src, out, samples_per_shard=8, meta_col="meta")
    rows = sorted(m.collect(), key=lambda r: r.shard_id)
    assert [r.n_samples for r in rows] == [8, 8, 8, 6]
    # shards cover disjoint, ordered key ranges (deterministic assignment)
    for lo, hi in zip(rows, rows[1:]):
        assert lo.key_max < hi.key_min
    for r in rows:
        assert r.n_bytes == os.path.getsize(r.path)


def test_key_with_slash_rejected(spark, tmp_path):
    bad = spark.createDataFrame(
        [("a/b", b"x", "bin", "c")],
        "image_id string, bytes binary, fmt string, caption string",
    )
    with pytest.raises(Exception, match="key contains"):
        write_wds_shards(bad, str(tmp_path / "s"), samples_per_shard=4).count()


def test_key_with_dot_rejected(spark, tmp_path):
    # the reader splits the basename at the FIRST dot, so 'v1.2' would
    # silently regroup under key 'v1' — must be rejected at write time
    bad = spark.createDataFrame(
        [("v1.2", b"x", "bin", "c")],
        "image_id string, bytes binary, fmt string, caption string",
    )
    with pytest.raises(Exception, match="key contains"):
        write_wds_shards(bad, str(tmp_path / "s"), samples_per_shard=4).count()


def test_reserved_fmt_rejected(spark, tmp_path):
    # fmt='txt' would name the payload member '{key}.txt' — the same
    # member name as the caption, silently replacing it on read-back
    for fmt in ("txt", "json", "a.b"):
        bad = spark.createDataFrame(
            [("k", b"x", fmt, "c")],
            "image_id string, bytes binary, fmt string, caption string",
        )
        with pytest.raises(Exception, match="reserved/invalid fmt"):
            write_wds_shards(
                bad, str(tmp_path / f"s_{fmt.replace('.', '_')}"),
                samples_per_shard=4,
            ).count()


def test_null_payload_roundtrips_empty(spark, tmp_path):
    src = spark.createDataFrame(
        [("k1", None, None, "only text")],
        "image_id string, bytes binary, fmt string, caption string",
    )
    out = str(tmp_path / "s")
    write_wds_shards(src, out, samples_per_shard=4).count()
    [r] = read_wds_shards(spark, out).collect()
    assert (r.key, r.fmt, bytes(r.bytes), r.caption) == ("k1", "bin", b"", "only text")
    assert r.meta_json is None  # no meta_col -> no .json member written


def test_reader_groups_consecutive_runs(spark, tmp_path):
    # hand-built shard: two payloads for one key, then the SAME key again
    # later -> the non-consecutive reappearance is a NEW sample (the
    # WebDataset convention: samples are maximal consecutive runs)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name, data in [
            ("a.png", b"P1"), ("a.jpeg", b"P2"), ("a.txt", b"cap-a"),
            ("b.png", b"P3"), ("b.txt", b"cap-b"),
            ("a.png", b"P4"),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    p = tmp_path / "x.tar"
    p.write_bytes(buf.getvalue())

    rows = read_wds_shards(spark, str(tmp_path)).collect()
    got = sorted((r.key, r.fmt, bytes(r.bytes), r.caption) for r in rows)
    assert got == [
        ("a", "jpeg", b"P2", "cap-a"),
        ("a", "png", b"P1", "cap-a"),
        ("a", "png", b"P4", None),
        ("b", "png", b"P3", "cap-b"),
    ]


def test_reader_handles_gzip_shards(spark, tmp_path):
    # tarfile's stream auto-detection makes .tar.gz shards readable with
    # no reader changes; the glob just has to match
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        for name, data in [("k.png", b"PP"), ("k.txt", b"cap")]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    (tmp_path / "s.tar.gz").write_bytes(buf.getvalue())
    [r] = read_wds_shards(spark, str(tmp_path), glob="*.tar.gz").collect()
    assert (r.key, r.fmt, bytes(r.bytes), r.caption) == ("k", "png", b"PP", "cap")


def test_order_cols_drive_shard_assignment(spark, tmp_path):
    src = spark.createDataFrame(
        [("k1", b"x", "bin", "c", 3), ("k2", b"y", "bin", "c", 1),
         ("k3", b"z", "bin", "c", 2)],
        "image_id string, bytes binary, fmt string, caption string, rank int",
    )
    out = str(tmp_path / "s")
    m = write_wds_shards(src, out, samples_per_shard=2,
                         order_cols=["rank", "image_id"])
    rows = sorted(m.collect(), key=lambda r: r.shard_id)
    # rank order k2,k3 | k1 — not key order
    assert (rows[0].key_min, rows[0].key_max) == ("k2", "k3")
    assert (rows[1].key_min, rows[1].key_max) == ("k1", "k1")
