"""Pure-Python semantic kernel shared by the pandas UDFs and the
deterministic reference-semantics simulator (refsim.py).

Each function replicates, bit-for-bit, one reference behavior (cited
file:line below) but is written for vectorized batch use: all regexes are
compiled once at module import and functions avoid per-call allocation.

These run *inside* Arrow-batched pandas UDFs — never as row-at-a-time
Spark Python UDFs.
"""

from __future__ import annotations

import re
from functools import lru_cache
from html import unescape as _html_unescape
from urllib.parse import urlparse

# ---------------------------------------------------------------------------
# F4 static-resource prune — reference util.py:44-50
# ---------------------------------------------------------------------------
# single source of truth with the Catalyst twin (exprs.is_static_resource
# _expr reads the same list) — a private copy here would silently desync
# the Python kernel (links UDF + refsim) from the Column-expression filter
from secretscraper_spark.config import STATIC_EXTS as _CFG_STATIC_EXTS

_STATIC_EXTS = tuple(_CFG_STATIC_EXTS)


def is_static_resource(path: str) -> bool:
    """True if *path* ends with a static extension or contains ``ext?``."""
    for ext in _STATIC_EXTS:
        if path.endswith(ext) or (ext + "?") in path:
            return True
    return False


# ---------------------------------------------------------------------------
# F5 URL sanitizer — reference util.py:70-97 (pure reject gate: the caller
# builds the node from the PRE-sanitize parse; see urlparser.py:58-94)
# ---------------------------------------------------------------------------
_HAS_WORD = re.compile("[a-zA-Z0-9]+")
_GARBAGE = re.compile(
    "\\<|\\>|\\{|\\}|\\[|\\]|\\||\\^|;|/node_modules/|www\\.w3\\.org|"
    "example\\.com|jquery[-\\.\\w]*?\\.js|\\.src|\\.replace|\\.url|\\.att|"
    "\\.href|location\\.href|javascript:|location:|"
    "application/x-www-form-urlencoded|\\.createObject|:location|\\.path|"
    "\\*#__PURE__\\*|\\*\\$0\\*|\\n"
)


def sanitize_url(url: str) -> str:
    """Return cleaned url, or "" if the url is garbage."""
    url = (
        url.replace(" ", "")
        .replace("\\/", "/")
        .replace("%3A", ":")
        .replace("%2F", "/")
    )
    if _HAS_WORD.search(url) is None:
        return ""
    if _GARBAGE.search(url) is not None:
        return ""
    if url.strip().startswith("javascript"):
        return ""
    try:
        netloc = urlparse(url).netloc
        if netloc.startswith("127.0.0.1") or netloc.startswith("localhost"):
            return ""
    except Exception:
        pass
    return url


# ---------------------------------------------------------------------------
# P8 host/port split — reference util.py:53-60
# ---------------------------------------------------------------------------
def to_host_port(netloc: str) -> tuple[str, str]:
    parts = netloc.split(":")
    if len(parts) == 1:
        return parts[0], ""
    if len(parts) == 2:
        return parts[0].strip(), parts[1].strip()
    return "", ""


# ---------------------------------------------------------------------------
# P9 root domain — reference util.py:63-67 (tldextract over the full
# public suffix list). Import-gated like hyperscan/bs4: tldextract when
# the wheel exists (exact parity), else the vendored PSL snapshot
# (functions/psl.py — longest-rule-wins incl. wildcards/exceptions;
# load_psl_file() swaps in a full dat file).
# ---------------------------------------------------------------------------
try:
    import tldextract as _tldextract
except ImportError:
    _tldextract = None

from . import psl as _psl


def get_root_domain(host: str) -> str:
    if _tldextract is not None:
        d = _tldextract.extract(host)
        return d.domain + "." + d.suffix
    labels = host.lower().split(".")
    k = _psl.suffix_label_count(labels)
    if len(labels) > k:
        return ".".join(labels[-(k + 1):])
    if k >= 2:
        # the host IS a known multi-label public suffix ('github.io',
        # 'co.uk'): tldextract gives domain '' -> '.github.io'
        return "." + ".".join(labels)
    if len(labels) >= 2:
        return ".".join(labels[-2:])
    return host + "."  # mirrors tldextract's "domain + '.' + suffix" on bare hosts


# ---------------------------------------------------------------------------
# P11 URL identity — reference entity.py:15-34: URLNode equality/hash derive
# ONLY from the parsed 6-tuple (scheme, netloc, path, params, query,
# fragment).  url_norm is the canonical re-serialization (ParseResult.geturl)
# and is THE dedup key of the engine; url_hash = xxhash64(url_norm) JVM-side.
# ---------------------------------------------------------------------------
def parse6(url: str) -> tuple[str, str, str, str, str, str]:
    o = urlparse(url)
    return (o.scheme, o.netloc, o.path, o.params, o.query, o.fragment)


def unparse6(t: tuple[str, str, str, str, str, str]) -> str:
    """Exact ParseResult.geturl() serialization of a 6-tuple — mirrors
    the installed CPython ``urlunsplit`` line-for-line, including the
    netloc-scheme rule (a ``uses_netloc`` scheme with an EMPTY netloc
    still serializes '//': ``'WS:'`` → ``'ws://'``; hypothesis-found
    parity gap, test_properties.py)."""
    from urllib.parse import uses_netloc

    scheme, netloc, path, params, query, fragment = t
    url = path
    if params:
        url = url + ";" + params
    if netloc or (scheme and scheme in uses_netloc and url[:2] != "//"):
        if url and url[:1] != "/":
            url = "/" + url
        url = "//" + (netloc or "") + url
    if scheme:
        url = scheme + ":" + url
    if query:
        url = url + "?" + query
    if fragment:
        url = url + "#" + fragment
    return url


def url_norm(url: str) -> str:
    return unparse6(parse6(url))


# ---------------------------------------------------------------------------
# F6 dangerous-path evade — reference crawler.py:258-266
# ---------------------------------------------------------------------------
def make_evade_matcher(dangerous_paths: list[str]):
    pats = [re.compile(f"/?{p}", re.IGNORECASE) for p in dangerous_paths]

    def is_evade(path: str) -> bool:
        s = path.strip()
        return any(p.search(s) for p in pats)

    return is_evade


# ---------------------------------------------------------------------------
# F7 content-type extend gate — reference crawler.py:314-323
# ---------------------------------------------------------------------------
def is_extend(content_type: str | None) -> bool:
    ct = (content_type or "").split(";", 1)[0].strip().lower()
    if ct.startswith("text/"):
        return True
    if ct.startswith("application/"):
        return ct not in ("application/octet-stream", "application/pdf")
    return False


# ---------------------------------------------------------------------------
# F11 JS classifier — reference crawler.py:325-330
# ---------------------------------------------------------------------------
def is_js_path(path: str) -> bool:
    return path.endswith(".js") or path.endswith(".js.map") or ".js?" in path


# ---------------------------------------------------------------------------
# P3 secret extraction — reference handler.py:25-61 (ReRegexHandler).
# use_groups=True: findall, tuple matches collapse to group[0] (handler.py:49).
# use_groups=False: first search, whole match.  Compiled re.IGNORECASE.
# ---------------------------------------------------------------------------
def _build_prefilter_gates() -> tuple[dict[str, list[str]], dict[str, re.Pattern]]:
    """Necessary-condition prefilter gates, keyed by the EXACT regex source
    string of the shipped config (so a user-edited rule silently gets no
    gate and simply runs ungated — correctness never depends on this).

    A gate is a set of lowercase literals of which at least one MUST occur
    in lower(text) for the rule to be able to match (every alternation arm
    of the rule contains one of them, and the rules compile IGNORECASE), or
    a cheap regex that is a superset of the rule's matches. Skipping a
    gated rule whose condition fails cannot change the extraction result;
    it only avoids scanning 6 KB of page text with an expensive pattern
    that cannot hit. This is the single-pattern analogue of hyperscan's
    literal-prefilter stage, and it lifts the secrets kernel from
    ~2.6 MB/s to >20 MB/s per thread on crawl pages (see BASELINE.md).
    """
    from ..config import JS_FIND, RULES, URL_FIND

    by_name = {name: rx for name, rx, _ in RULES}
    lits: dict[str, list[str]] = {}
    regexes: dict[str, re.Pattern] = {}

    for name, required in {
        "Swagger": ["swagger"],           # every arm spells 'swagger'
        "JS Map": [".js.map"],
        "Email": ["@"],
        "Internal IP": ["127.0.0.1", "10.", "172.", "192.168."],
        "Cloud Key": ["accesskey", "ltai"],
        "Shiro": ["=deleteme", "rememberme="],
        "Jwt": ["ey"],
    }.items():
        if name in by_name:
            lits[by_name[name]] = required
    if "ID Card" in by_name:
        # both arms require ≥15 consecutive digits (8+2+2+3 / 6+2+2+2+2+3)
        regexes[by_name["ID Card"]] = re.compile(r"\d{15}")

    # urlFind/jsFind (the LinkExtractor's inner RegexExtractor)
    for i, required in {
        0: ["http"], 1: ["http"], 2: ["/"], 3: ["/"], 4: ["href", "action"],
    }.items():
        if i < len(URL_FIND):
            lits[URL_FIND[i]] = required
    for rx in JS_FIND:
        lits[rx] = [".js"]
    return lits, regexes


_GATE_LITERALS, _GATE_REGEXES = _build_prefilter_gates()


class RegexExtractor:
    """Vectorizable equivalent of the reference's ReRegexHandler."""

    def __init__(self, rules: dict[str, str], use_groups: bool = True):
        self.names = list(rules.keys())
        self.patterns = [re.compile(rx, re.IGNORECASE) for rx in rules.values()]
        self.use_groups = use_groups
        self._lit_gates = [_GATE_LITERALS.get(rx) for rx in rules.values()]
        self._re_gates = [_GATE_REGEXES.get(rx) for rx in rules.values()]

    def extract(self, text: str) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        low: str | None = None
        for i, (name, pat) in enumerate(zip(self.names, self.patterns)):
            lits = self._lit_gates[i]
            if lits is not None:
                if low is None:
                    low = text.lower()
                if not any(lit in low for lit in lits):
                    continue
            rgate = self._re_gates[i]
            if rgate is not None and rgate.search(text) is None:
                continue
            if self.use_groups:
                for m in pat.findall(text):
                    out.append((name, m if not isinstance(m, tuple) else m[0]))
            else:
                m = pat.search(text)
                if m is not None:
                    out.append((name, m.group(0)))
        return out


class HyperscanExtractor:
    """Multi-pattern DFA variant of the reference's HyperscanRegexHandler
    (handler.py:72-139: SOM_LEFTMOST|CASELESS, emits whole-text slices, no
    groups). Importable only where the hyperscan wheel exists; construction
    raises ImportError otherwise — see get_extractor for the auto fallback."""

    def __init__(self, rules: dict[str, str]):
        import hyperscan  # noqa: F401 — gated optional dependency

        self.names = list(rules.keys())
        self._db = hyperscan.Database()
        self._db.compile(
            expressions=[rx.encode() for rx in rules.values()],
            ids=list(range(len(rules))),
            flags=[
                hyperscan.HS_FLAG_SOM_LEFTMOST | hyperscan.HS_FLAG_CASELESS
            ] * len(rules),
        )

    def extract(self, text: str) -> list[tuple[str, str]]:
        data = text.encode("utf-8", errors="ignore")
        out: list[tuple[str, str]] = []

        def on_match(rid: int, start: int, end: int, flags: int, ctx=None):
            out.append((self.names[rid], data[start:end].decode("utf-8", "ignore")))

        self._db.scan(data, match_event_handler=on_match)
        return out


def get_extractor(
    rules: dict[str, str], engine: str = "auto", use_groups: bool = True
):
    """P6 handler factory (reference handler.py:165-194): explicit
    're'/'hyperscan', or 'auto' = hyperscan when importable else re.
    The re engine is the semantic reference; hyperscan is a performance
    variant (in Spark the Arrow vectorization is the main win — SURVEY P4)."""
    if engine == "re":
        return RegexExtractor(rules, use_groups=use_groups)
    if engine == "hyperscan":
        return HyperscanExtractor(rules)
    if engine == "auto":
        try:
            return HyperscanExtractor(rules)
        except ImportError:
            return RegexExtractor(rules, use_groups=use_groups)
    raise ValueError(f"unknown engine {engine!r}")


# ---------------------------------------------------------------------------
# P7 title extraction — reference util.py:109-116 joins the text of all
# <title> tags with "|", newlines→spaces, stripped.  bs4 is unavailable here;
# a non-greedy tag regex reproduces its behavior on well-formed documents.
# ---------------------------------------------------------------------------
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_TAG_STRIP = re.compile(r"<[^>]+>")


def extract_title(text: str) -> str:
    # bs4 path (exact util.py:109-116 get_text walk) when the wheel
    # exists; the tag-strip regex reproduces it on well-formed markup.
    # Uses the module-level _BeautifulSoup gate (below) — a failed import
    # is NOT cached by Python, so a per-call try-import would re-run the
    # import machinery for every fetched page in the fused extraction UDF.
    if _BeautifulSoup is not None:
        bs = _BeautifulSoup(text or "", "html.parser")
        return "|".join(
            t.get_text().replace("\n", " ").replace("\r", " ").strip()
            for t in bs.find_all("title")
        )
    titles = []
    for raw in _TITLE_RE.findall(text or ""):
        t = _TAG_STRIP.sub("", raw)
        titles.append(t.replace("\n", " ").replace("\r", " ").strip())
    return "|".join(titles)


# ---------------------------------------------------------------------------
# P1 DOM href harvesting — reference urlparser.py:19-55 collects href of
# every <a> and <link>, and src of every <script> *only if* it ends ".js".
# bs4's html.parser is unavailable; this regex harvester reproduces the same
# attribute set on well-formed markup (quoted or unquoted attributes).
# ---------------------------------------------------------------------------
_A_LINK_TAG = re.compile(r"<(a|link)\b[^>]*?>", re.IGNORECASE | re.DOTALL)
_SCRIPT_TAG = re.compile(r"<script\b[^>]*?>", re.IGNORECASE | re.DOTALL)
_HREF_ATTR = re.compile(
    r"""\bhref\s*=\s*("([^"]*)"|'([^']*)'|([^\s"'>]+))""", re.IGNORECASE
)
_SRC_ATTR = re.compile(
    r"""\bsrc\s*=\s*("([^"]*)"|'([^']*)'|([^\s"'>]+))""", re.IGNORECASE
)


def _attr_value(m: re.Match) -> str:
    return m.group(2) if m.group(2) is not None else (
        m.group(3) if m.group(3) is not None else m.group(4)
    )


try:  # import-gated like hyperscan: bs4 upgrades DOM parity where present
    from bs4 import BeautifulSoup as _BeautifulSoup
except ImportError:  # regex harvester stands in (well-formed-markup parity)
    _BeautifulSoup = None


def harvest_dom_hrefs_regex(text: str) -> set[str]:
    """The href set of urlparser.py:27-54 (a/link href ∪ script src *.js),
    via tag regexes — matches the bs4 tree walk on well-formed markup.
    Attribute values are entity-UNESCAPED (html.unescape) because the
    reference's bs4 walk returns unescaped values: real pages write
    ``?id=1&amp;how=up`` and the crawler must enqueue ``?id=1&how=up`` —
    parity pinned on the reference's HackerNews.html fixture in
    tests/test_urlparser_parity.py."""
    hrefs: set[str] = set()
    for tag in _A_LINK_TAG.finditer(text):
        m = _HREF_ATTR.search(tag.group(0))
        if m is not None:
            hrefs.add(_html_unescape(_attr_value(m)))
    for tag in _SCRIPT_TAG.finditer(text):
        m = _SRC_ATTR.search(tag.group(0))
        if m is not None:
            src = _html_unescape(_attr_value(m))
            if src.endswith(".js"):
                hrefs.add(src)
    return hrefs


def harvest_dom_hrefs_bs4(text: str) -> set[str]:
    """Exact urlparser.py:22-54 tree walk (html.parser handles malformed
    markup — unclosed tags, comments, CDATA — identically to the
    reference). Raises if bs4 is absent; use harvest_dom_hrefs."""
    soup = _BeautifulSoup(text, "html.parser")
    hrefs: set[str] = set()
    for link in soup.find_all("link"):
        try:
            hrefs.add(str(link["href"]))
        except KeyError:
            pass
    for link in soup.find_all("a"):
        try:
            hrefs.add(str(link["href"]))
        except KeyError:
            pass
    for link in soup.find_all("script"):
        try:
            src = str(link["src"])
            if src.endswith(".js"):
                hrefs.add(src)
        except KeyError:
            pass
    return hrefs


def harvest_dom_hrefs(text: str) -> set[str]:
    """P1 href harvest — bs4 tree walk when the wheel exists (full
    malformed-HTML parity), else the regex stand-in."""
    if _BeautifulSoup is not None:
        return harvest_dom_hrefs_bs4(text)
    return harvest_dom_hrefs_regex(text)


class BSElementExtractor:
    """P5 — reference ``BSHandler`` (handler.py:140-160): a user callable
    over the parsed BeautifulSoup tree; a non-None return emits one
    ('HTML Element', result) row. The result is stringified here (the
    reference keeps the raw BSResult list in its in-memory Secret; a
    columnar engine needs a serializable cell). Import-gated: construction
    raises ImportError where the bs4 wheel is absent, mirroring
    HyperscanExtractor."""

    def __init__(self, filter_func):
        if _BeautifulSoup is None:
            raise ImportError("bs4 is required for BSElementExtractor")
        self.filter = filter_func

    def extract(self, text: str) -> list[tuple[str, str]]:
        soup = _BeautifulSoup(text, "html.parser")
        result = self.filter(soup)
        if result is None:
            return []
        return [("HTML Element", str(result))]


# ---------------------------------------------------------------------------
# P1+P2 link extraction — the union parser (reference urlparser.py:98-140
# RegexURLParser.extract_urls = regex pass ∪ DOM pass).  Returns the set of
# child 6-tuples; the caller owns depth bookkeeping.
# ---------------------------------------------------------------------------
# lru_cache bounds entry COUNT, not bytes — the key is the raw candidate
# string, and regex-extracted candidates can be arbitrarily long (data:
# URIs, minified-JS garbage). Candidates above this length bypass the
# cache entirely so an adversarial corpus of unique multi-KB candidates
# can't pin hundreds of MB per long-lived Python worker; nav hrefs (the
# ~9×-repeated rows the memo exists for) are far below it.
_CLASSIFY_CACHE_MAX_LEN = 2048


def _classify_link(link: str) -> tuple[str, str, str, str, str, str] | None:
    if len(link) > _CLASSIFY_CACHE_MAX_LEN:
        return _classify_link_impl(link)
    return _classify_link_cached(link)


def _classify_link_impl(link: str) -> tuple[str, str, str, str, str, str] | None:
    """Per-candidate parse+filter pipeline, memoized on the raw link string.

    Everything here is a pure function of *link* (urlparse, the static-
    resource prune on its path, the sanitizer reject), so the result is
    cacheable across pages and across the regex/DOM passes — real sites
    repeat nav hrefs on every page (≈9× repetition on the bench corpus),
    and each repeated href previously paid urlparse+sanitize twice per
    page. None = rejected. The combination with the page's base 6-tuple
    stays in the caller because it is per-page.

    urlparse raises ValueError on malformed IPv6-looking strings
    ('http://[::1'); on one hostile page the reference would lose a
    thread, but a Spark task crash aborts the whole JOB — reject the
    candidate instead (refsim shares this kernel, so the e2e parity
    compare sees the same skip)."""
    try:
        o = urlparse(link)
    except ValueError:
        return None
    if is_static_resource(o.path):
        return None
    if len(sanitize_url(link)) == 0:
        return None
    return (o.scheme, o.netloc, o.path, o.params, o.query, o.fragment)


_classify_link_cached = lru_cache(maxsize=1 << 17)(_classify_link_impl)


class LinkExtractor:
    def __init__(self, finder_rules: dict[str, str]):
        self._regex = RegexExtractor(finder_rules, use_groups=True)

    def extract(
        self, base6: tuple[str, str, str, str, str, str], text: str
    ) -> set[tuple[str, str, str, str, str, str]]:
        children: set[tuple[str, str, str, str, str, str]] = set()

        # regex pass — urlparser.py:105-137: scheme kept only when
        # http/https (else the base's), netloc from base when empty.
        for _, link in set(self._regex.extract(text)):
            if len(link) == 0:
                continue
            t = _classify_link(link)
            if t is None:
                continue
            children.add((
                t[0] if t[0] in ("http", "https") else base6[0],
                t[1] if t[1] != "" else base6[1],
                t[2], t[3], t[4], t[5],
            ))

        # DOM pass — urlparser.py:19-95 (node built from the PRE-sanitize parse)
        for href in harvest_dom_hrefs(text):
            t = _classify_link(href)
            if t is None:
                continue
            if len(t[0]) > 0 and len(t[1]) > 0:
                children.add(t)
            else:
                # relative: scheme+netloc from base; path kept VERBATIM —
                # deliberately NOT RFC 3986 resolution (urlparser.py:80-94)
                children.add((base6[0], base6[1], t[2], t[3], t[4], t[5]))
        return children
