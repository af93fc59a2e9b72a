"""Structured Streaming extraction path: file-source stream → secrets UDF /
streaming URL-dedup / windowed counts, run to completion with
trigger(availableNow) + memory sink and checked against the batch answers
on the same pages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from secretscraper_spark.config import loaded_rules
from secretscraper_spark.functions.extract import make_secrets_udf
from secretscraper_spark.sources.sitegen import generate_pages_pandas
from secretscraper_spark.streaming.extract_stream import (
    stream_pages,
    stream_secrets,
    stream_seen_dedup,
    windowed_secret_counts,
    with_event_time,
)

N_PAGES = 120


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    pdf = generate_pages_pandas(N_PAGES, 4)
    # two append "arrivals" to exercise multi-file streaming
    spark.createDataFrame(pdf.iloc[:60]).write.mode("overwrite").parquet(f"{d}/part1")
    spark.createDataFrame(pdf.iloc[60:]).write.mode("append").parquet(f"{d}/part1")
    return f"{d}/part1"


def run_to_memory(stream_df, name, output_mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(timeout) returns False WITHOUT raising when the
    # query is still running — reading the memory table then sees partial
    # results and the assertion failure masquerades as a correctness bug
    # (observed: the stateful test exceeding 120 s under a fully loaded
    # suite at local[8]). Wait generously, then fail loudly.
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError(f"stream {name!r} did not finish in 600 s")
    return name


def test_stream_secrets_matches_batch(spark, pages_dir):
    st = with_event_time(stream_pages(spark, pages_dir))
    run_to_memory(stream_secrets(st), "s_secrets")
    got = {
        (r.url_norm, r.rule_name, r.match)
        for r in spark.sql("SELECT * FROM s_secrets").collect()
    }
    batch = spark.read.parquet(pages_dir)
    udf = make_secrets_udf(loaded_rules())
    expected = {
        (r.url_norm, r.s.rule_name, r.s.match)
        for r in batch.select("url_norm", F.explode(udf("caption")).alias("s")).collect()
    }
    assert got == expected and expected


def test_stream_seen_dedup(spark, pages_dir):
    base = with_event_time(stream_pages(spark, pages_dir))
    # duplicate the stream rows to plant dupes
    dup = base.unionByName(base)
    run_to_memory(
        stream_seen_dedup(dup, watermark="1 hour").select("url_norm"), "s_seen"
    )
    rows = [r.url_norm for r in spark.sql("SELECT * FROM s_seen").collect()]
    assert len(rows) == N_PAGES                 # each url exactly once
    assert len(set(rows)) == N_PAGES


def test_windowed_counts(spark, pages_dir):
    st = with_event_time(stream_pages(spark, pages_dir))
    # complete mode: append only emits windows the watermark has passed,
    # and a single availableNow run never advances it past the last window
    run_to_memory(
        windowed_secret_counts(stream_secrets(st), window="1 minute"),
        "s_win",
        output_mode="complete",
    )
    rows = spark.sql("SELECT * FROM s_win").collect()
    assert rows, "windowed aggregation produced no closed windows"
    assert all(r.n_matches >= 1 for r in rows)
    assert all(r.window_end > r.window_start for r in rows)


def test_host_running_counts_stateful(spark, pages_dir):
    """applyInPandasWithState: per-host running totals survive across
    micro-batches and match the batch groupBy on the same data."""
    from secretscraper_spark.streaming.extract_stream import host_running_counts

    st = with_event_time(
        stream_pages(spark, pages_dir, max_files_per_trigger=1)
    )
    run_to_memory(host_running_counts(st), "s_hosts", output_mode="update")
    # update mode appends a row per (host, batch); the LAST row per host is
    # the final running total
    rows = spark.sql("SELECT * FROM s_hosts").collect()
    final = {}
    for r in rows:  # totals are monotone → the max row is the final state
        if r.host not in final or r.n_pages > final[r.host][0]:
            final[r.host] = (r.n_pages, r.caption_bytes)

    batch = spark.read.parquet(pages_dir)
    expected = {
        r.host: (r.n, r.b)
        for r in batch.selectExpr(
            "regexp_extract(url_norm, '//([^/:]+)', 1) AS host", "caption"
        )
        .groupBy("host")
        .agg(F.count("*").alias("n"), F.sum(F.length("caption")).alias("b"))
        .collect()
    }
    assert final == expected and expected


class TestCrawlBridge:
    """availableNow stream over one crawl tier ≡ the batch tier's outputs
    (the streaming-crawl composition gate)."""

    def test_tier_stream_equals_batch(self, spark, tmp_path):
        from secretscraper_spark.config import CrawlConfig
        from secretscraper_spark.functions import purekit as pk
        from secretscraper_spark.plans.crawler import SparkCrawler
        from secretscraper_spark.streaming.crawl_bridge import (
            stream_fetched,
            stream_tier_edges,
            stream_tier_secrets,
        )

        # a 4-page site where every page is a seed → exactly one tier
        site = {
            "http://s.test/": '<a href="/a.html">a</a> 10.0.0.1',
            "http://s.test/a.html": '<a href="/b.html">b</a>',
            "http://s.test/b.html": 'x rememberMe=1 <script src="/j.js"></script>',
            "http://s.test/c.html": "quiet page",
        }
        pages = spark.createDataFrame(
            [(u, "200", "text/html", len(c), c) for u, c in site.items()],
            "url_norm string, status string, content_type string, "
            "content_length long, caption string",
        )
        cfg = CrawlConfig(max_depth=1, max_page_num=0)
        res = SparkCrawler(spark, pages, cfg).run(list(site))
        batch_edges = {
            (r.parent_norm, r.child_norm, r.kind) for r in res.edges.collect()
        }
        batch_secrets = {
            (r.url_norm, r.rule_name, r.match) for r in res.secrets.collect()
        }

        # the same tier as a fetched-rows directory → stream path
        rows = []
        for seq, (u, c) in enumerate(site.items()):
            t6 = pk.parse6(u)
            rows.append((u, *t6, 0, None, seq, "200", "text/html", len(c), c))
        tier_dir = str(tmp_path / "tier0")
        spark.createDataFrame(
            rows,
            "url_norm string, scheme string, netloc string, path string, "
            "params string, query string, fragment string, depth int, "
            "parent_norm string, discovery_seq long, status string, "
            "content_type string, content_length long, caption string",
        ).write.parquet(tier_dir)

        st = stream_fetched(spark, tier_dir)
        run_to_memory(stream_tier_edges(st), "bridge_edges")
        run_to_memory(stream_tier_secrets(st), "bridge_secrets")
        stream_edges = {
            (r.parent_norm, r.child_norm, r.kind)
            for r in spark.sql("SELECT DISTINCT * FROM bridge_edges").collect()
        }
        stream_secrets_set = {
            (r.url_norm, r.rule_name, r.match)
            for r in spark.sql("SELECT DISTINCT * FROM bridge_secrets").collect()
        }
        assert stream_edges == batch_edges and batch_edges
        assert stream_secrets_set == batch_secrets and batch_secrets


def test_stream_audio_features_matches_batch(spark, tmp_path_factory):
    """Payload-column streaming: the audio feature mapInPandas runs
    UNCHANGED on a file-source stream (two arrival files, availableNow)
    and produces exactly the batch answer — multimodal decode stages
    compose with the continuous-ingest path like the text ones."""
    from secretscraper_spark.operators import audio

    d = str(tmp_path_factory.mktemp("audio_stream")) + "/clips"
    ids = spark.range(0, 50).withColumnRenamed("id", "audio_id")
    clips = audio.synth_audio_table(ids)
    clips.filter(F.col("audio_id") < 25).write.mode("overwrite").parquet(d)
    clips.filter(F.col("audio_id") >= 25).write.mode("append").parquet(d)

    schema = "audio_id long, bytes binary"
    st = spark.readStream.schema(schema).parquet(d)
    run_to_memory(audio.audio_features(st), "audio_feats")
    got = {
        tuple(r) for r in spark.sql("SELECT * FROM audio_feats").collect()
    }
    batch = {
        tuple(r)
        for r in audio.audio_features(spark.read.schema(schema).parquet(d)).collect()
    }
    assert got == batch and len(got) == 50


def test_stream_curation_funnel_matches_batch(spark, tmp_path):
    """availableNow streamed funnel (2 micro-batches) rolled up ==
    one-shot batch funnel over the same documents — valid because every
    streamed stage is per-doc independent."""
    from pyspark.sql import functions as F

    from secretscraper_spark.operators.curation import funnel_counts
    from secretscraper_spark.operators.textstats import lang_id, quality_gate
    from secretscraper_spark.streaming.curate_stream import (
        rollup_funnel,
        stream_curation_funnel,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    ddir = tmp_path / "docs"
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(str(ddir))
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(str(ddir))

    def prepare(batch_df):
        qg = quality_gate(batch_df).select("doc_id", "keep")
        return batch_df.select(
            "doc_id", lang_id(F.col("text")).alias("lid")
        ).join(qg, "doc_id")

    def stages():
        return [
            ("quality", F.col("keep")),
            ("english", F.col("lid") == "en"),
        ]

    st = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ddir))
    )
    q = stream_curation_funnel(
        st, prepare, stages, str(tmp_path / "funnel"), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(600), "funnel stream did not finish"

    raw = spark.read.parquet(str(tmp_path / "funnel"))
    assert raw.select("batch_id").distinct().count() >= 2

    got = [
        (r["stage_idx"], r["stage"], r["n_in"], r["n_kept"])
        for r in rollup_funnel(spark, str(tmp_path / "funnel")).collect()
    ]
    want = [
        (r["stage_idx"], r["stage"], r["n_in"], r["n_kept"])
        for r in funnel_counts(prepare(docs), stages())
        .orderBy("stage_idx").collect()
    ]
    assert got == want
    assert got[0][2] == 500
