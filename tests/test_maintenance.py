"""Small-file compaction (sinks/maintenance.py): row-exact rewrite into
the computed file budget, both coalesce and shuffle strategies."""

from pyspark.sql import functions as F

from secretscraper_spark.sinks.maintenance import compact_parquet, _parquet_files


def test_compact_parquet_row_exact(spark, tmp_path):
    src = str(tmp_path / "frag")
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") * 7 % 13).alias("v")
    )
    df.repartition(16).write.parquet(src)
    assert len(_parquet_files(src)) == 16
    total = sum(sz for _, sz in _parquet_files(src))

    for shuffle, dst_name in ((False, "c1"), (True, "c2")):
        dst = str(tmp_path / dst_name)
        stats = compact_parquet(
            spark, src, dst,
            # half the table per file -> exactly 2 output files
            target_file_bytes=(total + 1) // 2, shuffle=shuffle,
        )
        assert stats["n_files_before"] == 16
        assert stats["n_files_after"] == 2
        assert stats["n_rows"] == 2000
        got = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
        want = sorted(tuple(r) for r in df.collect())
        assert got == want
