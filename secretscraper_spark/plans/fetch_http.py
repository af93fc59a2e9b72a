"""Real HTTP ``page_fetch_fn`` for the paced executor (S2/C4 completed).

Re-expresses the reference's fetch wrapper (``crawler.py:384-421``): an
httpx GET with headers / proxy / timeout / redirect policy where EVERY
error arm returns None — the page's status then stays "Unknown"
(``crawler.py:235-239``), it is never retried within the run, and it
still counts as processed. The reference enumerates 8 arms (TimeoutError,
ConnectError, ClosedResourceError, InvalidURL, TimeoutException,
ReadError, KeyboardInterrupt, Exception); over the stdlib client these
collapse to the equivalent families below, with the same outcome for
each: swallow and return None.

Built on ``urllib.request`` (httpx is not installable here; the stdlib
client is the public equivalent). Each fetching THREAD builds its own
opener — handlers are not thread-safe to share, and the paced executor
runs up to max_concurrent_per_domain threads per host slot. The
reference's GLOBAL connection-pool knobs (``max_connections`` /
``max_keepalive_connections``, C4) are a single-process httpx concept
with no faithful distributed equivalent: the engine's enforced bound is
per-host (max_concurrent_per_domain × concurrently-scheduled hosts),
so total sockets scale with executor count. The facade accepts the
flags for settings.yml parity and warns that only the per-host bound
is enforced.

Returned mapping matches what ``paced_fetch_pages`` expects from a fetch
fn: ``{"status", "content_type", "content_length", "caption"}`` where
``caption`` carries the decoded body text (the engine's text column,
BASELINE.json input_hint).
"""

from __future__ import annotations

import threading
import typing
import urllib.error
import urllib.parse
import urllib.request


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, req, fp, code, msg, headers, newurl):  # noqa: N802
        return None


def make_http_fetch_fn(
    headers: dict[str, str] | None = None,
    timeout: float = 5.0,
    follow_redirects: bool = True,
    proxy: str | None = None,
    max_body_bytes: int = 8 * 1024 * 1024,
) -> typing.Callable[[str], dict | None]:
    """Build a picklable fetch fn for the paced executor.

    The returned callable runs on executors inside applyInPandas workers;
    it constructs its opener lazily per THREAD and caches it —
    ``OpenerDirector.open`` is not documented thread-safe, and the paced
    executor issues up to max_concurrent_per_domain fetches concurrently
    within a host slot (plans/fetch_exec.py:_issue_host).

    Raises ValueError for non-HTTP proxy schemes: urllib's ProxyHandler
    silently treats e.g. ``socks5://`` as a plain HTTP proxy endpoint and
    every fetch would fail into the status-Unknown arm — a SOCKS proxy
    needs a SOCKS-capable ``page_fetch_fn`` instead.
    """
    headers = dict(headers or {})
    if proxy:
        scheme = (urllib.parse.urlparse(proxy).scheme or "http").lower()
        if scheme not in ("http", "https"):
            raise ValueError(
                f"unsupported proxy scheme {scheme!r}: the built-in stdlib "
                "fetcher speaks HTTP(S) proxies only; pass a SOCKS-capable "
                "page_fetch_fn for socks:// proxies"
            )
    state: dict[str, typing.Any] = {}

    def _opener() -> urllib.request.OpenerDirector:
        # threading.local is created lazily (it does not pickle); dict
        # setdefault is atomic under the GIL, so the worst race is one
        # discarded redundant local.
        loc = state.get("local")
        if loc is None:
            loc = state.setdefault("local", threading.local())
        op = getattr(loc, "opener", None)
        if op is None:
            handlers: list[urllib.request.BaseHandler] = []
            if proxy:
                handlers.append(
                    urllib.request.ProxyHandler({"http": proxy, "https": proxy})
                )
            if not follow_redirects:
                handlers.append(_NoRedirect())
            op = urllib.request.build_opener(*handlers)
            loc.opener = op
        return op

    def _result(status: int, hdrs, body: bytes) -> dict:
        ctype = (hdrs.get("Content-Type") or "") if hdrs is not None else ""
        clen = hdrs.get("Content-Length") if hdrs is not None else None
        # a malformed Content-Length ('abc') must never raise: raised
        # from the HTTPError arm it would ESCAPE fetch() entirely (an
        # exception inside an except block skips its siblings), kill the
        # applyInPandas task and abort the crawl on one hostile server
        try:
            length = int(clen) if clen is not None else len(body)
        except (ValueError, TypeError):
            length = len(body)
        return {
            "status": str(status),
            "content_type": ctype,
            "content_length": length,
            "caption": body.decode("utf-8", errors="ignore"),
        }

    def fetch(url: str) -> dict | None:
        req_headers = {k: v for k, v in headers.items() if v}
        try:
            req = urllib.request.Request(url, headers=req_headers, method="GET")
            with _opener().open(req, timeout=timeout) as resp:
                body = resp.read(max_body_bytes)
                return _result(resp.status, resp.headers, body)
        except urllib.error.HTTPError as e:
            # non-2xx/3xx: httpx RETURNS the response (no raise-for-status
            # in the reference) — mirror that: a real status + body
            try:
                body = e.read(max_body_bytes)
            except Exception:
                body = b""
            return _result(e.code, e.headers, body)
        except KeyboardInterrupt:
            return None  # crawler.py:417: ignored, page stays Unknown
        except Exception:
            # timeout / connect / invalid-URL / read arms (crawler.py:405-420)
            return None

    return fetch
