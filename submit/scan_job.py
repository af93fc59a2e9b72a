"""spark-submit entry point for the local-file scan mode (reference
`secretscraper -l PATH`, SURVEY §3.2): recursive file source → the same
secrets UDF as the crawl → per-file report (K7).

    spark-submit --master local[8] --py-files /tmp/secretscraper_spark.zip \
        submit/scan_job.py --root /path/to/tree [--out /tmp/scan_out]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("secretscraper-scan").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("SELECT lower('WarḿÉ')").collect()  # ICU warmup (see session.py)

    from secretscraper_spark.sinks.reports import local_scan_report
    from secretscraper_spark.sources.files import scan_secrets

    secrets = scan_secrets(spark, args.root)
    report = local_scan_report(secrets)
    if args.out:
        report.write.mode("overwrite").json(args.out)
    rows = report.collect()
    print(json.dumps({
        "files_with_secrets": len(rows),
        "total_secrets": int(sum(r.n_secrets for r in rows)),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
