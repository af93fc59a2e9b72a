"""Tests for report sinks K1-K7 and the file-scan / seed-list sources."""

from __future__ import annotations

from pyspark.sql import functions as F

from secretscraper_spark.sinks import reports
from secretscraper_spark.sources.files import read_seed_file, scan_files, scan_secrets


def make_universe(spark):
    return spark.createDataFrame(
        [
            ("http://a.test/", "200", "Home", 100, "text/html"),
            ("http://a.test/x", "404", "", 10, "text/html"),
            ("http://b.test/y", "Unknown", "", -1, ""),
            ("http://sub.b.test/z.js", "302", "", 5, "text/javascript"),
        ],
        "url_norm string, status string, title string, content_length long, content_type string",
    )


def make_edges(spark):
    return spark.createDataFrame(
        [
            ("http://a.test/", "http://a.test/x", "url"),
            ("http://a.test/", "http://b.test/y", "url"),
            ("http://a.test/", "http://sub.b.test/z.js", "js"),
        ],
        "parent_norm string, child_norm string, kind string",
    )


def make_secrets(spark):
    return spark.createDataFrame(
        [
            ("http://a.test/", "Email", "a@b.com"),
            ("http://a.test/", "Phone", "13273487666"),
        ],
        "url_norm string, rule_name string, match string",
    )


def test_csv_rows(spark):
    rows = {r.URL: r for r in reports.csv_rows(make_universe(spark), make_secrets(spark)).collect()}
    assert set(rows) == {
        "http://a.test/", "http://a.test/x", "http://b.test/y", "http://sub.b.test/z.js",
    }
    a = rows["http://a.test/"]
    assert a.Title == "Home" and a["Response Code"] == "200"
    assert a.Secrets == "Email: a@b.com\nPhone: 13273487666"
    assert rows["http://b.test/y"].Secrets == ""


def test_url_hierarchy_filters_404(spark):
    h = reports.url_hierarchy(make_edges(spark), make_universe(spark), kind="url").collect()
    assert len(h) == 1
    row = h[0]
    # 404 child dropped by F12; unknown child kept when no ranges
    assert row.n_children == 1
    assert row.children == ["http://b.test/y [Unknown]"]


def test_js_hierarchy(spark):
    h = reports.url_hierarchy(make_edges(spark), make_universe(spark), kind="js").collect()
    assert h[0].children == ["http://sub.b.test/z.js [302]"]


def test_per_domain_report_other_last(spark):
    rep = reports.per_domain_report(make_universe(spark), ["http://a.test/"]).collect()
    domains = [r.domain for r in rep]
    assert domains[0] == "a.test" and domains[-1] == "Other"
    other = [r for r in rep if r.domain == "Other"][0]
    assert other.n_urls == 2  # b.test/y + sub.b.test/z.js


def test_found_domains(spark):
    found = spark.createDataFrame(
        [("http://a.test/",), ("http://a.test/x",), ("http://b.test:8080/y",)],
        "url_norm string",
    )
    got = [r.netloc for r in reports.found_domains(found).collect()]
    assert got == ["a.test", "b.test:8080"]


def test_secrets_report(spark):
    rep = reports.secrets_report(make_secrets(spark), make_universe(spark)).collect()
    assert len(rep) == 1 and rep[0].n_secrets == 2 and rep[0].status == "200"


def test_scan_files_and_secrets(spark, tmp_path, planted_text):
    d = tmp_path / "corpus" / "sub"
    d.mkdir(parents=True)
    (d / "a.txt").write_text(planted_text)
    (d.parent / "b.txt").write_text("no secrets here")
    files = scan_files(spark, str(tmp_path / "corpus"))
    assert files.count() == 2  # recursive lookup
    sec = scan_secrets(spark, str(tmp_path / "corpus"))
    rows = sec.collect()
    paths = {r.path for r in rows}
    assert len(paths) == 1 and "a.txt" in next(iter(paths))
    assert {r.rule_name for r in rows} >= {"Phone", "Email", "ID Card"}
    rep = reports.local_scan_report(sec.withColumnRenamed("path", "path")).collect()
    assert rep[0].n_secrets == len(rows)


def test_read_seed_file(spark, tmp_path):
    f = tmp_path / "urls.txt"
    f.write_text("http://a.test/\n\nhttp://b.test/\nhttp://a.test/\n")
    assert read_seed_file(spark, str(f)) == ["http://a.test/", "http://b.test/"]
