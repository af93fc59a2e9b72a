"""Unit tests for the pure semantic kernel — ports of the reference's
test_entity.py / test_filter.py-adjacent invariants and util.py behaviors."""

from __future__ import annotations

from secretscraper_spark.functions import purekit as pk


class TestStaticResource:
    def test_extensions(self):
        assert pk.is_static_resource("/a/b.png")
        assert pk.is_static_resource("style.css")
        assert pk.is_static_resource("mod.vue")
        assert pk.is_static_resource("app.ts")
        assert not pk.is_static_resource("/a/b.html")
        assert not pk.is_static_resource("/a/b.js")

    def test_ext_with_query_marker(self):
        assert pk.is_static_resource("/x.png?v=2")
        # ext+? anywhere in the string (util.py:48 __contains__)
        assert pk.is_static_resource("/x.png?y/z")


class TestSanitize:
    def test_strips_and_keeps(self):
        assert pk.sanitize_url("a b") == "ab"
        assert pk.sanitize_url("\\/path") == "/path"
        assert pk.sanitize_url("http%3A%2F%2Fhost/x") == "http://host/x"

    def test_rejects(self):
        assert pk.sanitize_url("###") == ""           # no word chars
        assert pk.sanitize_url("/node_modules/x") == ""
        assert pk.sanitize_url("http://example.com/x") == ""
        assert pk.sanitize_url("jquery-3.2.1.js") == ""
        assert pk.sanitize_url("javascript:void(0)") == ""
        assert pk.sanitize_url("http://127.0.0.1/x") == ""
        assert pk.sanitize_url("http://localhost:8080/x") == ""
        assert pk.sanitize_url("a<b") == ""
        assert pk.sanitize_url("a\nb") == ""

    def test_accepts_normal(self):
        assert pk.sanitize_url("http://site0.test/p/1") == "http://site0.test/p/1"


class TestHostPort:
    def test_split(self):
        assert pk.to_host_port("example.test") == ("example.test", "")
        assert pk.to_host_port("example.test:8080") == ("example.test", "8080")
        assert pk.to_host_port("a:b:c") == ("", "")


class TestUrlIdentity:
    """Identity = parsed 6-tuple (reference entity.py:21-22,
    tests/test_entity.py:33-42: url+'#..' differing only in raw string but
    same parse is the same node)."""

    def test_fragment_included_in_identity(self):
        a = pk.parse6("http://h/p#frag")
        b = pk.parse6("http://h/p")
        assert a != b

    def test_norm_roundtrip(self):
        for u in [
            "http://h/p;par?q=1#f",
            "https://h:8080/a/b",
            "//h/p",
            "/rel/path?x=1",
            "http://h",
        ]:
            assert pk.url_norm(u) == u
        # equal parses normalize equally
        assert pk.url_norm("http://h/p?") == pk.url_norm("http://h/p")


class TestEvade:
    def test_dangerous(self):
        ev = pk.make_evade_matcher(["logout", "update", "remove", "insert", "delete"])
        assert ev("/logout")
        assert ev("/a/DELETE/x")       # case-insensitive, anywhere
        assert ev("delete1")           # substring semantics (crawler.py:263)
        assert not ev("/safe/page")


class TestExtendGate:
    """Truth table of tests/test_crawler_regressions.py:103-118."""

    def test_table(self):
        assert pk.is_extend("text/html; charset=utf-8")
        assert pk.is_extend("text/plain")
        assert pk.is_extend("application/json")
        assert pk.is_extend("Application/JSON; x=1")
        assert not pk.is_extend("application/octet-stream")
        assert not pk.is_extend("application/pdf")
        assert not pk.is_extend("image/png")
        assert not pk.is_extend("")
        assert not pk.is_extend(None)


class TestJsClassifier:
    def test_js(self):
        assert pk.is_js_path("/a/1.js")
        assert pk.is_js_path("/a/1.js.map")
        assert pk.is_js_path("/a/1.js?v=3")
        assert not pk.is_js_path("/a/1.json")


class TestTitle:
    def test_join_multi(self):
        html = "<title>A\nB</title><p>x</p><title> C </title>"
        assert pk.extract_title(html) == "A B|C"

    def test_none(self):
        assert pk.extract_title("no titles here") == ""


class TestPrefilterGates:
    """The literal/regex gates on RegexExtractor are necessary conditions:
    gated and ungated extraction must be IDENTICAL on any input."""

    def _pair(self, rules):
        gated = pk.RegexExtractor(rules, use_groups=True)
        ungated = pk.RegexExtractor(rules, use_groups=True)
        ungated._lit_gates = [None] * len(ungated.names)
        ungated._re_gates = [None] * len(ungated.names)
        return gated, ungated

    def test_parity_on_hit_strings(self):
        from secretscraper_spark.config import loaded_rules

        gated, ungated = self._pair(loaded_rules())
        samples = [
            "see swagger-ui.html now", '"swagger": 2', "SWAGGER UI",
            'x"127.0.0.1"y', "a 10.1.2.3 b", "192.168.0.1!", "z172.16.0.1",
            "app.js.map", "bundle.JS.MAP", '"foo@bar.com"', "rememberMe=1",
            "=deleteMe", "LTAIabcdef123456", "AccessKeyId=AK",
            '"ey' + "a" * 12 + "." + "b" * 12 + '"',
            "110101199003071234", "1234567890123456789X",
            '"13812345678"', '"' + "a" * 32 + '"',
            "plain text with none of it", "", "ey", "10.", "172.",
        ]
        for s in samples:
            assert gated.extract(s) == ungated.extract(s), s

    def test_parity_random(self):
        import random
        import string

        from secretscraper_spark.config import loaded_rules, url_finder_rules

        rnd = random.Random(42)
        g1, u1 = self._pair(loaded_rules())
        g2, u2 = self._pair(url_finder_rules())
        for _ in range(200):
            s = "".join(rnd.choices(string.printable, k=400))
            assert g1.extract(s) == u1.extract(s)
            assert g2.extract(s) == u2.extract(s)

    def test_user_rule_gets_no_gate(self):
        # a rule whose regex is NOT in the shipped config runs ungated
        ex = pk.RegexExtractor({"custom": r"zebra\d+"}, use_groups=True)
        assert ex._lit_gates == [None] and ex._re_gates == [None]
        assert ex.extract("a zebra42 b") == [("custom", "zebra42")]


def test_link_extractor_survives_malformed_ipv6_href():
    from secretscraper_spark.config import loaded_rules, url_finder_rules
    from secretscraper_spark.functions.purekit import LinkExtractor

    ex = LinkExtractor(url_finder_rules())
    base = ("http", "a.test", "/", "", "", "")
    # urlparse raises ValueError on 'http://[::1' — one hostile page must
    # skip the candidate, not kill the extraction task (and the job)
    text = '<a href="http://[::1">x</a> see http://[broken and /ok.html'
    kids = ex.extract(base, text)
    assert all("[" not in c[1] for c in kids)
