"""spark-submit entry point for the corpus-curation pipeline: a documents
parquet table → quality gate → language-ID → entropy band → exact-dedup
canonical, writing the curated corpus plus the per-stage funnel report.
This is the batch job a training-data release runs after crawling; every
stage is the same oracle-gated operator the driver contract exposes.

    spark-submit --master local[8] --py-files /tmp/secretscraper_spark.zip \\
        submit/curate_job.py --docs /root/testdata/sf0.01/documents.parquet \\
        [--out /tmp/curated] [--lang en] [--min-entropy 2.0] [--max-entropy 5.0]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, Window, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-entropy", type=float, default=2.0)
    ap.add_argument("--max-entropy", type=float, default=5.0)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("secretscraper-curate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("SELECT lower('WarḿÉ')").collect()  # ICU warmup (see session.py)

    from secretscraper_spark.operators.curation import funnel_counts
    from secretscraper_spark.operators.textstats import (
        char_entropy,
        fingerprint,
        lang_id,
        quality_gate,
    )

    docs = spark.read.parquet(args.docs)
    qg = quality_gate(docs).select("doc_id", "keep")
    ce = char_entropy(docs).select("doc_id", "char_entropy")
    sig = docs.select(
        "doc_id",
        lang_id(F.col("text")).alias("lid"),
        fingerprint(F.col("text")).alias("fp"),
    )
    j = (
        sig.join(qg, "doc_id")
        .join(ce, "doc_id", "left")
        .withColumn(
            "first_id", F.min("doc_id").over(Window.partitionBy("fp"))
        )
    )
    stages = [
        ("quality", F.col("keep")),
        ("language", F.col("lid") == args.lang),
        (
            "entropy",
            F.coalesce(
                F.col("char_entropy").between(
                    args.min_entropy, args.max_entropy
                ),
                F.lit(False),
            ),
        ),
        ("dedup_canonical", F.col("doc_id") == F.col("first_id")),
    ]
    funnel = funnel_counts(j, stages).orderBy("stage_idx").collect()

    cum = F.lit(True)
    for _, pred in stages:
        cum = cum & pred
    kept_ids = j.filter(cum).select("doc_id")
    curated = docs.join(kept_ids, "doc_id", "left_semi")
    if args.out:
        curated.write.mode("overwrite").parquet(args.out)

    print(json.dumps({
        "n_docs": funnel[0]["n_in"] if funnel else 0,
        "n_curated": funnel[-1]["n_kept"] if funnel else 0,
        "funnel": [
            {"stage": r["stage"], "n_in": r["n_in"], "n_kept": r["n_kept"]}
            for r in funnel
        ],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
