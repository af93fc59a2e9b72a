"""Report sinks K1-K7 (reference output_formatter.py) as DataFrames.

Each report is a DataFrame the caller can show()/collect()/write — the
terminal coloring of the reference is presentation, not semantics; the
grouping/filter/ordering logic is what is reproduced (and oracle-testable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import purekit as pk
from ..functions.exprs import host_of, root_domain, status_allowed

CSV_HEADER = ["URL", "Title", "Response Code", "Content Length", "Content Type", "Secrets"]


def csv_rows(
    universe: DataFrame, secrets: DataFrame
) -> DataFrame:
    """K1 CSV sink (output_formatter.py:233-255): rows = url_dict keys ∪
    children ∪ secret-bearing urls; the Secrets cell is the newline-joined
    'type: data' set."""
    sec_agg = (
        secrets.select(
            "url_norm",
            F.concat(F.col("rule_name"), F.lit(": "), F.col("match")).alias("s"),
        )
        .groupBy("url_norm")
        .agg(F.array_join(F.array_sort(F.collect_set("s")), "\n").alias("Secrets"))
    )
    rows = universe.join(sec_agg, "url_norm", "full_outer")
    return rows.select(
        F.col("url_norm").alias("URL"),
        F.coalesce(F.col("title"), F.lit("")).alias("Title"),
        F.coalesce(F.col("status"), F.lit("Unknown")).alias("Response Code"),
        F.coalesce(F.col("content_length"), F.lit(-1)).alias("Content Length"),
        F.coalesce(F.col("content_type"), F.lit("")).alias("Content Type"),
        F.coalesce(F.col("Secrets"), F.lit("")).alias("Secrets"),
    )


def write_single_csv(df: DataFrame, path: str) -> None:
    """Write *df* as ONE csv FILE at *path* (reference parity: the CLI's
    ``-o`` produces a file, and click declares the option dir_okay=False —
    a raw ``df.write.csv`` would leave a part-file DIRECTORY that makes
    every subsequent run with the same -o fail at option parsing).
    Reports are aggregate-sized, so the coalesce(1) is a non-issue; for
    a genuinely huge export use ``df.write.csv`` directly."""
    import glob
    import os
    import shutil

    tmp = path + ".__spark_tmp__"
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)
    shutil.move(part, path)
    shutil.rmtree(tmp)


def write_csv(universe: DataFrame, secrets: DataFrame, path: str) -> None:
    write_single_csv(csv_rows(universe, secrets), path)


def url_hierarchy(
    edges: DataFrame, universe: DataFrame, kind: str = "url",
    allowed_status: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """K2 (kind='url') / K6 (kind='js') per-parent child listing with
    count; children pass the display-status filter F12."""
    kids = (
        edges.filter(F.col("kind") == kind)
        .join(universe.withColumnRenamed("url_norm", "child_norm"), "child_norm", "left")
        .filter(status_allowed(F.coalesce(F.col("status"), F.lit("Unknown")), allowed_status))
    )
    return (
        kids.groupBy("parent_norm")
        .agg(
            F.count("*").alias("n_children"),
            F.array_sort(F.collect_set(
                F.concat(F.col("child_norm"), F.lit(" ["),
                         F.coalesce(F.col("status"), F.lit("Unknown")), F.lit("]"))
            )).alias("children"),
        )
        .orderBy("parent_norm")
    )


def per_domain_report(
    universe: DataFrame, start_domains: list[str]
) -> DataFrame:
    """K3 (output_formatter.py:129-164): bucket by root domain of the
    start-url set, everything else → 'Other' ordered last (O4).
    *start_domains* may be URLs or bare hosts."""
    def _root(u: str) -> str:
        netloc = pk.parse6(u)[1] if "//" in u or ":" in u else u
        host = pk.to_host_port(netloc or u)[0] or u
        return pk.get_root_domain(host)

    roots = sorted({_root(d) for d in start_domains})

    host = host_of(_netloc_of(F.col("url_norm")))
    # PSL-aware root domain (exprs.root_domain ≡ purekit.get_root_domain)
    root = root_domain(host)
    dom = F.when(root.isin(roots), root).otherwise("Other")
    return (
        universe.select(dom.alias("domain"), "url_norm")
        .groupBy("domain")
        .agg(F.count("*").alias("n_urls"),
             F.array_sort(F.collect_set("url_norm")).alias("urls"))
        .orderBy(F.when(F.col("domain") == "Other", 1).otherwise(0), "domain")
    )


def found_domains(found: DataFrame) -> DataFrame:
    """K4/D7 (output_formatter.py:78-94): distinct netlocs of found_urls."""
    return (
        found.select(_netloc_of(F.col("url_norm")).alias("netloc"))
        .distinct()
        .orderBy("netloc")
    )


def secrets_report(secrets: DataFrame, universe: DataFrame) -> DataFrame:
    """K5 (output_formatter.py:196-214): per-URL secret set + count."""
    return (
        secrets.select(
            "url_norm",
            F.concat(F.col("rule_name"), F.lit(": "), F.col("match")).alias("s"),
        )
        .groupBy("url_norm")
        .agg(F.count_distinct("s").alias("n_secrets"),
             F.array_sort(F.collect_set("s")).alias("secrets"))
        .join(universe.select("url_norm", "status"), "url_norm", "left")
        .orderBy("url_norm")
    )


def local_scan_report(file_secrets: DataFrame) -> DataFrame:
    """K7 (output_formatter.py:216-231): per-file secret set."""
    return (
        file_secrets.select(
            "path",
            F.concat(F.col("rule_name"), F.lit(": "), F.col("match")).alias("s"),
        )
        .groupBy("path")
        .agg(F.count_distinct("s").alias("n_secrets"),
             F.array_sort(F.collect_set("s")).alias("secrets"))
        .orderBy("path")
    )


def _netloc_of(url_norm):
    """netloc of a canonical url: text between the FIRST '//' and the
    next '/', '?' or '#' — urlparse semantics. (substring_index with a
    negative count would key on the LAST '//', which misbuckets URLs
    whose path or query embeds '//' — reachable here because relative
    hrefs are kept verbatim, reference parity.) URLs with no '//' have
    no netloc ('')."""
    return F.regexp_extract(url_norm, r"//([^/?#]*)", 1)
