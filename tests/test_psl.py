"""P9 root domain over the vendored PSL snapshot: kernel cases vs known
tldextract behavior, Column-expr ≡ kernel parity, K3 report bucketing,
and the full-dat-file loader."""

from __future__ import annotations

from pyspark.sql import functions as F

from secretscraper_spark.functions import psl
from secretscraper_spark.functions.exprs import root_domain
from secretscraper_spark.functions.purekit import get_root_domain

KNOWN = {
    # (host, tldextract's domain + '.' + suffix)
    "www.example.com": "example.com",
    "a.b.example.co.uk": "example.co.uk",
    "foo.github.io": "foo.github.io",
    "deep.foo.github.io": "foo.github.io",
    "x.com.ar": "x.com.ar",
    "sub.x.com.ar": "x.com.ar",
    "h3.example.test": "example.test",
    "myapp.blogspot.com": "myapp.blogspot.com",
    "t.co": "t.co",
    "a.gov.uk": "a.gov.uk",
    "shop.co.za": "shop.co.za",
    # wildcard rule *.ck → any x.ck is itself a suffix
    "a.b.ck": "a.b.ck",
    # exception rule !www.ck → suffix is just ck
    "www.ck": "www.ck",
    "sub.www.ck": "www.ck",  # !www.ck exception: www.ck is registrable
    "localhost": "localhost.",
}


class TestKernel:
    def test_known_cases(self):
        for host, want in KNOWN.items():
            assert get_root_domain(host) == want, host

    def test_case_insensitive(self):
        assert get_root_domain("Foo.GitHub.IO") == "foo.github.io"


class TestExprParity:
    def test_expr_matches_kernel(self, spark):
        hosts = list(KNOWN) + [
            "single", "a.b.c.d.e.co.jp", "weird..double", "1.2.3.4",
            "x.appspot.com", "y.herokuapp.com", "no-dot",
        ]
        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        got = {
            r.host: r.root
            for r in df.select(
                "host", root_domain(F.col("host")).alias("root")
            ).collect()
        }
        for h in hosts:
            assert got[h] == get_root_domain(h), h


class TestReportBucketing:
    def test_k3_groups_psl_hosts(self, spark):
        """foo.github.io-style hosts bucket like tldextract (the exact
        failure VERDICT item 9 names)."""
        from secretscraper_spark.sinks import reports

        universe = spark.createDataFrame(
            [
                ("http://foo.github.io/a", "200", "", -1, ""),
                ("http://foo.github.io/b", "200", "", -1, ""),
                ("http://bar.github.io/c", "200", "", -1, ""),
                ("http://h1.example.test/x", "200", "", -1, ""),
            ],
            "url_norm string, status string, title string, "
            "content_length long, content_type string",
        )
        rep = reports.per_domain_report(
            universe, ["http://foo.github.io/", "http://h1.example.test/"]
        )
        rows = {r.domain: r.n_urls for r in rep.collect()}
        # foo.github.io is its own registrable domain; bar.github.io is NOT
        # in the start set → Other (pre-PSL both collapsed into github.io)
        assert rows == {"foo.github.io": 2, "example.test": 1, "Other": 1}


class TestDatLoader:
    def test_load_full_dat(self, tmp_path):
        dat = tmp_path / "public_suffix_list.dat"
        dat.write_text(
            "// comment\n"
            "com\n"
            "madeup.zz\n"
            "*.wild\n"
            "!ok.wild\n"
        )
        before = psl.tables()
        try:
            psl.load_psl_file(str(dat))
            assert get_root_domain("a.madeup.zz") == "a.madeup.zz"
            assert get_root_domain("x.y.wild") == "x.y.wild"  # wildcard
            assert get_root_domain("ok.wild") == "ok.wild"    # exception
        finally:
            psl._tables.update(
                multi=before[0], wild=before[1], exc=before[2],
                maxk=psl._max_rule_labels(*before),
            )
        # snapshot restored
        assert get_root_domain("a.madeup.zz") == "madeup.zz"

    def test_nested_wildcards_and_exceptions(self, tmp_path, spark):
        """The real public_suffix_list.dat has nested wildcard rules
        (*.kawasaki.jp, *.compute.amazonaws.com) and nested exceptions
        (!city.kawasaki.jp): the suffix runs one label PAST a wildcard
        base, and an exception yields its rule minus the leftmost label —
        tldextract parity on exactly these shapes."""
        dat = tmp_path / "psl.dat"
        dat.write_text(
            "jp\n"
            "*.kawasaki.jp\n"
            "!city.kawasaki.jp\n"
            "com\n"
            "amazonaws.com\n"
            "*.compute.amazonaws.com\n"
        )
        cases = {
            "foo.bar.kawasaki.jp": "foo.bar.kawasaki.jp",  # *.kawasaki.jp
            "city.kawasaki.jp": "city.kawasaki.jp",        # exception rule
            "sub.city.kawasaki.jp": "city.kawasaki.jp",
            "vm.x.compute.amazonaws.com": "vm.x.compute.amazonaws.com",
            "plain.example.com": "example.com",
        }
        before = psl.tables()
        try:
            psl.load_psl_file(str(dat))
            for host, want in cases.items():
                assert get_root_domain(host) == want, host
            # Column-expr parity under the loaded tables
            df = spark.createDataFrame([(h,) for h in cases], "host string")
            got = {
                r.host: r.root
                for r in df.select(
                    "host", root_domain(F.col("host")).alias("root")
                ).collect()
            }
            for host, want in cases.items():
                assert got[host] == want, host
        finally:
            psl._tables.update(
                multi=before[0], wild=before[1], exc=before[2],
                maxk=psl._max_rule_labels(*before),
            )


def test_root_domain_of_suffix_host_matches_tldextract_form(spark):
    from pyspark.sql import functions as F

    from secretscraper_spark.functions.exprs import root_domain
    from secretscraper_spark.functions.purekit import get_root_domain

    # a host that IS a known multi-label public suffix: tldextract gives
    # domain '' -> '.github.io' / '.co.uk'; both kernels must agree
    for host, want in [("github.io", ".github.io"), ("co.uk", ".co.uk")]:
        assert get_root_domain(host) == want, host
    df = spark.createDataFrame([("github.io",), ("co.uk",)], "host string")
    got = {r.host: r.root for r in df.select(
        "host", root_domain(F.col("host")).alias("root")).collect()}
    assert got == {"github.io": ".github.io", "co.uk": ".co.uk"}
