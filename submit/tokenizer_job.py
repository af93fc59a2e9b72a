"""spark-submit entry point for distributed BPE tokenizer training: a
documents parquet table → merge table (batched vocabulary-sized merge
loop) written as parquet, plus corpus encode statistics printed as one
JSON line. The artifact is the (rank, lhs, rhs, merged, pair_count)
merge table any BPE runtime consumes.

    spark-submit --master local[8] --py-files /tmp/secretscraper_spark.zip \\
        submit/tokenizer_job.py --docs /root/testdata/sf0.01/documents.parquet \\
        --merges-out /tmp/merges [--n-merges 512] [--batch-k 32]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--merges-out", default=None)
    ap.add_argument("--n-merges", type=int, default=256)
    ap.add_argument("--batch-k", type=int, default=32)
    ap.add_argument("--min-pair-count", type=int, default=2)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("secretscraper-bpe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("SELECT lower('WarḿÉ')").collect()  # ICU warmup (see session.py)

    from secretscraper_spark.operators.bpe import (
        bpe_encode,
        merges_df,
        train_bpe_batched,
    )

    docs = spark.read.parquet(args.docs)
    merges = train_bpe_batched(
        docs,
        n_merges=args.n_merges,
        batch_k=args.batch_k,
        min_pair_count=args.min_pair_count,
    )
    if args.merges_out:
        merges_df(spark, merges).coalesce(1).write.mode("overwrite").parquet(
            args.merges_out
        )

    stats = bpe_encode(docs, merges).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("sum_words"),
        F.sum("n_bpe_tokens").alias("sum_bpe_tokens"),
    ).head()
    print(json.dumps({
        "n_merges": len(merges),
        "n_docs": int(stats["n_docs"]),
        "sum_words": int(stats["sum_words"]),
        "sum_bpe_tokens": int(stats["sum_bpe_tokens"]),
        "tokens_per_word": round(
            stats["sum_bpe_tokens"] / max(stats["sum_words"], 1), 4
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
