"""Secondary micro-bench (BASELINE.md plan #4): secrets-extraction
throughput, single-threaded `re` kernel vs the Spark Arrow-batched pipeline
on the same corpus.

The single-threaded side is this repo's RegexExtractor, which is
parity-tested against the reference's ReRegexHandler semantics
(tests/test_handler_parity.py; the reference class itself imports bs4,
which this container lacks). Both sides run the same 10 loaded rules over
the same generated captions.

Run: python bench_handler.py [n_pages] [filler_bytes]   (not part of the
driver's bench.py loop — run on demand; results recorded in BASELINE.md)
"""

from __future__ import annotations

import json
import sys
import time

from secretscraper_spark.config import loaded_rules
from secretscraper_spark.functions.purekit import RegexExtractor
from secretscraper_spark.sources.sitegen import caption_for


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    filler = int(sys.argv[2]) if len(sys.argv) > 2 else 6144

    captions = [caption_for(i, n_pages, 8, filler) for i in range(n_pages)]
    total_mb = sum(len(c) for c in captions) / 1e6

    # single-threaded reference-equivalent kernel
    ext = RegexExtractor(loaded_rules(), use_groups=True)
    t0 = time.perf_counter()
    n_matches = sum(len(ext.extract(c)) for c in captions)
    single_s = time.perf_counter() - t0

    # Spark pipeline: same rules through the Arrow-batched pandas UDF
    from pyspark.sql import functions as F

    from secretscraper_spark.functions.extract import make_secrets_udf
    from secretscraper_spark.session import get_spark

    spark = get_spark("bench-handler", master="local[32]",
                      shuffle_partitions=32, extra={"spark.task.cpus": "2"})
    try:
        df = spark.createDataFrame(
            [(c,) for c in captions], "caption string"
        ).repartition(64).localCheckpoint()
        df.count()
        udf = make_secrets_udf(loaded_rules())
        t0 = time.perf_counter()
        spark_matches = df.select(F.explode(udf("caption"))).count()
        spark_s = time.perf_counter() - t0
    finally:
        spark.stop()

    print(json.dumps({
        "n_pages": n_pages,
        "corpus_mb": round(total_mb, 1),
        "single_thread": {
            "sec": round(single_s, 2),
            "mb_per_sec": round(total_mb / single_s, 2),
            "matches": n_matches,
        },
        "spark_local32_taskcpus2": {
            "sec": round(spark_s, 2),
            "mb_per_sec": round(total_mb / spark_s, 2),
            "matches": spark_matches,
        },
        "speedup": round(single_s / spark_s, 2),
        "matches_equal": n_matches == spark_matches,
    }))


if __name__ == "__main__":
    main()
