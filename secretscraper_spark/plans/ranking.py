"""Scalable global sequence assignment (two-phase zipWithIndex).

A naive ``row_number() OVER (ORDER BY ...)`` collapses to one task — a
non-starter at 10^10 frontier scale. This helper range-partitions on the
order key, counts per partition, and assigns ``offset + local_index``
inside each partition: fully parallel, one extra pass for the counts,
and the tag itself is a pure-JVM expression (monotonically_increasing_id
arithmetic + a broadcast offsets join) — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


SMALL_INPUT_ROWS = 1_000_000


def assign_global_seq(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "discovery_seq",
    start: int = 0,
    num_partitions: int | None = None,
    small_input_rows: int = SMALL_INPUT_ROWS,
) -> DataFrame:
    """Add ``seq_col`` = dense global rank of rows ordered by *order_cols*
    (caller guarantees the key is unique per row), starting at *start*."""
    return assign_global_seq_with_count(
        df, order_cols, seq_col=seq_col, start=start,
        num_partitions=num_partitions, small_input_rows=small_input_rows,
    )[0]


def assign_global_seq_with_count(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "discovery_seq",
    start: int = 0,
    num_partitions: int | None = None,
    small_input_rows: int = SMALL_INPUT_ROWS,
) -> tuple[DataFrame, int]:
    """assign_global_seq, also returning the (already-materialized) input
    row count. Ranking must count its input anyway (plan choice + range
    offsets); callers that need |df| — every crawl tier does, for
    next_seq/metrics — save one full count job per tier by reusing it."""
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    # Materialize the input first: repartitionByRange runs a boundary-
    # sampling job that RE-EXECUTES the full upstream plan before the
    # shuffle itself runs it again. With an expensive upstream (the
    # crawler's links-UDF explode + groupBy + anti-join) that doubles the
    # cost of ranking; after this checkpoint the sample pass reads
    # already-materialized rows.
    df = df.localCheckpoint()
    # Stats-adaptive plan choice (the count is free — the input is already
    # materialized): below ``small_input_rows`` a single-partition window
    # beats the two-phase rank's 4 extra jobs (sample, checkpoint, counts,
    # Arrow tag) by seconds of pure scheduling overhead, and a one-task
    # sort of ≤2·10^5 short rows is microseconds-per-row work. Large
    # inputs — the 10^10-frontier regime — always take the distributed
    # path below; this mirrors how AQE picks physical plans from runtime
    # statistics.
    n_rows = df.count()
    if n_rows <= small_input_rows:
        from pyspark.sql.window import Window

        w = Window.orderBy(*order_cols)
        return df.withColumn(
            seq_col, (F.row_number().over(w) - 1 + F.lit(start)).cast("long")
        ), n_rows
    ranged = df.repartitionByRange(int(parts), *order_cols).sortWithinPartitions(*order_cols)
    # freeze the (sampled) range boundaries so the count pass and the tag
    # pass see identical partitioning
    ranged = ranged.localCheckpoint()

    counts = (
        ranged.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    sizes = {r["pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    # Tag pass stays entirely JVM-side: monotonically_increasing_id() on the
    # CHECKPOINTED ranged data is (partition_id << 33) + local row index in
    # stored (= sorted) order, so seq = offset[pid] + (mid & (2^33 - 1)).
    # The offsets join is a broadcast of ≤`parts` rows. The previous
    # mapInPandas tag shipped every frontier column through an Arrow
    # round-trip just to add one long — at the 10^7 leg that pass was the
    # bulk of a 20 s enqueue phase for a 2 M-row tier.
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()],
        "__pid int, __off long",
    )
    local_idx = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    return (
        ranged.select(
            "*",
            F.spark_partition_id().alias("__pid"),
            F.monotonically_increasing_id().alias("__mid"),
        )
        .join(F.broadcast(off_df), "__pid")
        .withColumn(seq_col, (F.col("__off") + local_idx).cast("long"))
        .drop("__pid", "__mid", "__off")
    ), n_rows
