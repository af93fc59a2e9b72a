"""Real-HTTP fetch path: make_http_fetch_fn error-arm semantics
(reference crawler.py:384-421) and a live end-to-end crawl over a local
http.server (the reference's start_local_test_http_server shape,
util.py + tests/test_facade.py:250-266)."""

from __future__ import annotations

import http.server
import threading

import pytest

from secretscraper_spark.plans.fetch_http import make_http_fetch_fn

INDEX_HTML = """<html><head><title>Root</title></head><body>
<a href="/child.html">child</a>
<a href="/missing.html">gone</a>
intranet: 10.0.0.1
</body></html>"""

CHILD_HTML = """<html><head><title>Child</title></head><body>
session: rememberMe=deadbeef
</body></html>"""


class _Handler(http.server.BaseHTTPRequestHandler):
    PAGES = {"/index.html": INDEX_HTML, "/child.html": CHILD_HTML}

    def do_GET(self):  # noqa: N802
        if self.path == "/badlen.html":
            # hostile/broken server: non-integer Content-Length on an
            # error response — must map to a result, never a raised
            # ValueError (which would escape the HTTPError arm entirely)
            self.send_response(404)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", "abc")
            self.end_headers()
            self.wfile.write(b"bad length")
            return
        body = self.PAGES.get(self.path)
        if body is None:
            self.send_response(404)
            payload = b"not here"
        else:
            self.send_response(200)
            payload = body.encode()
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def http_site():
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    httpd.server_close()


class TestFetchFn:
    def test_ok(self, http_site):
        fetch = make_http_fetch_fn(timeout=2)
        page = fetch(f"{http_site}/child.html")
        assert page["status"] == "200"
        assert "rememberMe=deadbeef" in page["caption"]
        assert page["content_type"].startswith("text/html")
        assert page["content_length"] == len(CHILD_HTML.encode())

    def test_http_error_returns_status(self, http_site):
        # httpx returns the response for 4xx/5xx (no raise) — so do we
        page = make_http_fetch_fn(timeout=2)(f"{http_site}/missing.html")
        assert page["status"] == "404"
        assert page["caption"] == "not here"

    def test_connection_error_returns_none(self):
        # closed port → ConnectError arm → None (status stays Unknown)
        assert make_http_fetch_fn(timeout=0.5)("http://127.0.0.1:9/x") is None

    def test_invalid_url_returns_none(self):
        assert make_http_fetch_fn()("not a url at all") is None

    def test_headers_sent(self, http_site):
        captured = {}

        class EchoHandler(_Handler):
            def do_GET(self):  # noqa: N802
                captured.update(self.headers)
                super().do_GET()

        httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), EchoHandler)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            url = f"http://127.0.0.1:{httpd.server_address[1]}/index.html"
            make_http_fetch_fn(
                headers={"User-Agent": "TestUA", "Cookie": "c=1"}, timeout=2
            )(url)
            assert captured.get("User-Agent") == "TestUA"
            assert captured.get("Cookie") == "c=1"
        finally:
            httpd.shutdown()
            httpd.server_close()


class TestLiveCrawl:
    def test_facade_paced_http_crawl(self, spark, http_site):
        """Full live path: CrawlerFacade with no pages store → paced
        executor → urllib fetcher → extraction → results. The dead link
        stays status-Unknown-then-404: /missing.html IS fetched (server
        answers 404), while a url on a closed port stays Unknown."""
        from secretscraper_spark import settings as cfgmod
        from secretscraper_spark.facade import CrawlerFacade

        s = cfgmod.default_settings()
        s["min_request_interval"] = 0.01  # keep the live test quick
        fa = CrawlerFacade(
            s,
            {"url": f"{http_site}/index.html", "max_depth": 1},
            spark=spark,
            print_func=lambda *_: None,
        )
        res = fa.crawler.run(fa.start_urls)
        nodes = {r.url_norm: r.status for r in res.nodes.collect()}
        assert nodes[f"{http_site}/index.html"] == "200"
        assert nodes[f"{http_site}/child.html"] == "200"
        assert nodes[f"{http_site}/missing.html"] == "404"
        secrets = {(r.rule_name, r.match) for r in res.secrets.collect()}
        assert ("Internal IP", "10.0.0.1") in secrets
        assert ("Shiro", "rememberMe=") in secrets

    def test_fetch_failure_stays_unknown(self, spark):
        """Reference crawler.py:277: a failed fetch leaves the node with
        status Unknown and it still counts as processed."""
        from secretscraper_spark.config import CrawlConfig
        from secretscraper_spark.plans.crawler import SparkCrawler
        from secretscraper_spark.schemas import PAGES_SCHEMA

        pages = spark.createDataFrame([], PAGES_SCHEMA)
        crawler = SparkCrawler(
            spark, pages, CrawlConfig(max_depth=1),
            fetch_mode="paced",
            page_fetch_fn=make_http_fetch_fn(timeout=0.5),
        )
        res = crawler.run(["http://127.0.0.1:9/dead"])
        assert res.total_page == 1
        assert res.nodes.count() == 0  # never fetched → no node state row
        assert res.seen.count() == 1


def test_malformed_content_length_does_not_raise(http_site):
    fetch = make_http_fetch_fn(timeout=2)
    page = fetch(f"{http_site}/badlen.html")
    assert page is not None and page["status"] == "404"
    assert page["content_length"] == len(b"bad length")
