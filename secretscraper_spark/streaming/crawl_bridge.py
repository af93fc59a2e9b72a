"""Streaming-crawl bridge: a crawl tier through Structured Streaming.

The batch crawler and a continuous-ingest deployment meet here: a fetch
fleet appends fetched-page rows (frontier columns + page columns) to a
directory/table, and the SAME extraction plan fragments the batch tier
runs (plans/extraction.py) run as a stream — secrets and edges flow out
incrementally instead of per-tier. ``trigger(availableNow=True)`` over
one tier's rows is bit-equal to the batch tier (gated by
tests/test_streaming.py::TestCrawlBridge), which is what makes the two
worlds composable: a tier can be drained through the stream path and the
frontier loop continues from its outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..config import loaded_rules, url_finder_rules
from ..functions.extract import make_extract_udf
from ..plans import extraction
from ..schemas import FRONTIER_SCHEMA

# one tier's fetched rows: frontier identity + the fetched page columns
FETCHED_SCHEMA = T.StructType(
    list(FRONTIER_SCHEMA.fields)
    + [
        T.StructField("status", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("caption", T.StringType()),
    ]
)


def stream_fetched(
    spark: SparkSession, input_dir: str, fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a tier's fetched-page rows."""
    r = spark.readStream.schema(FETCHED_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.format(fmt).load(input_dir)


def _combined(fetched, rules, link_rules):
    udf = make_extract_udf(
        url_finder_rules() if link_rules is None else link_rules,
        loaded_rules() if rules is None else rules,
    )
    return extraction.extract_combined(fetched, udf)


def stream_tier_secrets(
    fetched: DataFrame, rules: dict[str, str] | None = None,
    link_rules: dict[str, str] | None = None,
) -> DataFrame:
    """P3 over the stream — the batch tier's secrets fragment verbatim."""
    return extraction.secrets_of(_combined(fetched, rules, link_rules))


def stream_tier_edges(
    fetched: DataFrame, rules: dict[str, str] | None = None,
    link_rules: dict[str, str] | None = None,
) -> DataFrame:
    """F7→P1∪P2→D5 over the stream — the batch tier's edge fragment
    verbatim (per-page child explosion; stateless map)."""
    return extraction.edges_of(
        extraction.children_of(_combined(fetched, rules, link_rules))
    )


def stream_land_payloads(
    fetched: DataFrame,
    pages_store: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming payload landing: each micro-batch's fetched URL set
    semi-joins the payload store and appends to the landing table — the
    continuous-ingest form of ``sinks.payloads.land_payloads``, so a
    fetch fleet's output flows into the image+caption table without a
    per-round batch job.

    Idempotence: each batch writes (mode=overwrite) its OWN
    ``batch_id=N`` subdirectory, so a micro-batch replayed after a crash
    overwrites its previous attempt instead of duplicating rows — the
    standard exactly-once-effect foreachBatch pattern on a plain-file
    sink (an Iceberg deployment gets the same guarantee from
    commit-by-batchId). Read the landing with
    ``spark.read.parquet(out_dir)`` (partition discovery unions the
    batch dirs). A URL fetched in TWO different micro-batches lands
    twice — run the stream through ``stream_seen_dedup`` first (the
    crawler's seen semantics) if the fleet can emit repeats.

    *pages_store*'s FILE LISTING is resolved when the DataFrame is
    created, not per micro-batch — `spark.read.parquet(dir)` snapshots
    an InMemoryFileIndex, so payload files appended to the store AFTER
    stream start are invisible to the semi-join and their rows silently
    never land. For a store that grows while the stream runs, pass a
    table-backed DataFrame whose snapshot resolves per query (Iceberg /
    a metastore table), or restart the stream after store appends.
    Returns the StreamingQuery; caller awaits/stops."""
    from ..sinks.payloads import PAYLOAD_COLS

    def land(batch_df: DataFrame, batch_id: int) -> None:
        keys = batch_df.select("url_norm").distinct()
        landed = pages_store.join(keys, "url_norm", "left_semi").select(
            *PAYLOAD_COLS
        )
        landed.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    w = (
        fetched.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
