"""Bucketed seen-table storage (plans/bucketed_seen.py): anti-join
equality with the exact plan, exchange-free bucketed scan, append under
the same layout, and loud failure on a mismatched append."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from secretscraper_spark.plans.bucketed_seen import (
    assert_no_seen_exchange,
    bucketed_seen_anti_join,
    write_seen_bucketed,
)


def _seen(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("http://h/"), F.col("id")).alias("url_norm"),
    )


def _frontier(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("http://h/"), F.col("id")).alias("url_norm"),
    )


@pytest.fixture()
def no_broadcast(spark):
    # the 10^10 seen side is never broadcastable; make the test regime
    # match so the join exercises the bucketed SMJ path
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_anti_join_matches_exact(spark, tmp_path, no_broadcast):
    seen = _seen(spark, 0, 500)
    write_seen_bucketed(seen, "seen_b1", str(tmp_path / "t1"), buckets=8)
    frontier = _frontier(spark, 300, 800)

    got_df = bucketed_seen_anti_join(frontier, "seen_b1")
    assert_no_seen_exchange(got_df)
    want = frontier.join(seen.select("url_hash"), "url_hash", "left_anti")
    assert sorted(r.url_norm for r in got_df.collect()) == sorted(
        r.url_norm for r in want.collect()
    )
    assert got_df.count() == 300  # ids 500..799


def test_append_keeps_layout_and_semantics(spark, tmp_path, no_broadcast):
    write_seen_bucketed(_seen(spark, 0, 200), "seen_b2",
                        str(tmp_path / "t2"), buckets=8)
    write_seen_bucketed(_seen(spark, 200, 400), "seen_b2",
                        str(tmp_path / "t2"), buckets=8, mode="append")
    frontier = _frontier(spark, 0, 500)
    got_df = bucketed_seen_anti_join(frontier, "seen_b2")
    assert_no_seen_exchange(got_df)
    assert got_df.count() == 100  # only 400..499 unseen


def test_mismatched_append_fails_loudly(spark, tmp_path):
    write_seen_bucketed(_seen(spark, 0, 10), "seen_b3",
                        str(tmp_path / "t3"), buckets=8)
    with pytest.raises(Exception):
        write_seen_bucketed(_seen(spark, 10, 20), "seen_b3",
                            str(tmp_path / "t3"), buckets=4, mode="append")
