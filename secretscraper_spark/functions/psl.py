"""Public-suffix snapshot for P9 root-domain (reference ``util.py:63-67``
uses tldextract over the full publicsuffix.org list).

Resolution order:
1. ``tldextract`` when importable (exact reference parity) — import-gated
   like hyperscan/bs4; the wheel is absent in this sandbox.
2. A vendored SNAPSHOT SUBSET of the public suffix list below: the
   multi-label rules a crawl actually meets (country-code second-level
   registrations, common hosting/private domains) plus the list's
   wildcard rules and exceptions. Single-label TLDs need no table — the
   fallback already treats the last label as the suffix.
3. ``load_psl_file(path)`` replaces the tables with a full
   ``public_suffix_list.dat`` (same format publicsuffix.org publishes),
   for deployments that mount the real list.

The tables are plain frozensets broadcast into the Arrow kernels; the
Column-side form (exprs.root_domain) compiles them to Catalyst InSet
literals — a hash probe inside whole-stage codegen, no join, no shuffle.
"""

from __future__ import annotations

# Multi-label public suffixes (snapshot subset of publicsuffix.org).
MULTI_SUFFIXES: frozenset[str] = frozenset({
    # United Kingdom
    "ac.uk", "co.uk", "gov.uk", "judiciary.uk", "ltd.uk", "me.uk", "net.uk",
    "nhs.uk", "org.uk", "plc.uk", "police.uk", "sch.uk",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz", "kiwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    # Japan / Korea / China / Taiwan / Hong Kong / Singapore
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp", "ne.jp",
    "or.jp",
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr", "ms.kr",
    "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw", "idv.tw",
    "mil.tw", "net.tw", "org.tw",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    # India / Indonesia / Thailand / Malaysia / Philippines / Vietnam
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "sch.id", "web.id",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my", "org.my",
    "com.ph", "edu.ph", "gov.ph", "mil.ph", "net.ph", "ngo.ph", "org.ph",
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn", "info.vn",
    "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
    "blog.br", "eco.br", "emp.br", "eng.br", "esp.br", "far.br", "flog.br",
    "imb.br", "ind.br", "inf.br", "jor.br", "med.br", "mus.br", "not.br",
    "ntr.br", "odo.br", "ppg.br", "pro.br", "psc.br", "qsl.br", "rec.br",
    "slg.br", "srv.br", "tmp.br", "tur.br", "tv.br", "vet.br", "wiki.br",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar", "net.ar",
    "org.ar", "tur.ar",
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "co.cr", "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co",
    "org.co",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe", "org.pe",
    "com.ve", "edu.ve", "gob.ve", "mil.ve", "net.ve", "org.ve", "web.ve",
    "gob.cl", "gov.cl", "mil.cl",
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    "com.ec", "edu.ec", "fin.ec", "gob.ec", "gov.ec", "info.ec", "k12.ec",
    "med.ec", "mil.ec", "net.ec", "org.ec", "pro.ec",
    "com.bo", "edu.bo", "gob.bo", "int.bo", "mil.bo", "net.bo", "org.bo",
    "tv.bo", "web.bo",
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py", "org.py",
    "gc.ca", "on.ca", "qc.ca", "bc.ca", "ab.ca",
    "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca", "nt.ca", "nu.ca", "pe.ca",
    "sk.ca", "yk.ca",
    # Europe
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "com.de", "com.se", "co.dk", "co.no", "priv.no",
    "ac.be", "co.nl", "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru",
    "spb.ru",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "mil.pl", "waw.pl",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt", "org.pt",
    "publ.pt",
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    "com.ro", "nom.ro", "nt.ro", "org.ro", "rec.ro", "store.ro", "tm.ro",
    "www.ro",
    "com.tr", "edu.tr", "gen.tr", "gov.tr", "mil.tr", "net.tr", "org.tr",
    "web.tr",
    "co.hu", "org.hu", "priv.hu", "sport.hu", "tm.hu",
    "co.il", "ac.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    "co.ua", "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    # Africa / Middle East
    "co.za", "ac.za", "gov.za", "law.za", "mil.za", "net.za", "nom.za",
    "org.za", "school.za", "web.za",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg", "net.eg",
    "org.eg", "sci.eg",
    "co.ke", "ac.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng", "name.ng",
    "net.ng", "org.ng", "sch.ng",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa", "pub.sa",
    "sch.sa",
    "ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae", "sch.ae",
    # common private/hosting domains (PSL private section)
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "appspot.com", "herokuapp.com", "netlify.app", "vercel.app",
    "pages.dev", "web.app", "firebaseapp.com", "azurewebsites.net",
    "cloudfront.net", "elasticbeanstalk.com", "fastly.net", "fly.dev",
    "glitch.me", "ngrok.io", "onrender.com", "readthedocs.io", "repl.co",
    "s3.amazonaws.com", "surge.sh", "workers.dev", "wordpress.com",
    "dyndns.org", "no-ip.org", "duckdns.org",
})

# Wildcard rule BASES (the part after "*."): any single label directly
# under a base is itself a public suffix — minus the exception rules.
# Bases may be multi-label in a full PSL (*.kawasaki.jp, *.compute.
# amazonaws.com); the vendored snapshot only carries the TLD-level ones.
WILDCARD_TLDS: frozenset[str] = frozenset(
    {"bd", "ck", "er", "fj", "jm", "kh", "mm", "np", "pg"}
)
# Exception rules (``!rule``): the rule is NOT a public suffix — the
# suffix is the rule minus its leftmost label (publicsuffix.org spec).
WILDCARD_EXCEPTIONS: frozenset[str] = frozenset({"www.ck"})


def _max_rule_labels(
    multi: frozenset[str], wild: frozenset[str], exc: frozenset[str]
) -> int:
    return max(
        [s.count(".") + 1 for s in multi]
        + [s.count(".") + 2 for s in wild]  # base labels + the "*" label
        + [s.count(".") + 1 for s in exc]
        + [1]
    )


_tables: dict = {
    "multi": MULTI_SUFFIXES,
    "wild": WILDCARD_TLDS,
    "exc": WILDCARD_EXCEPTIONS,
    "maxk": _max_rule_labels(MULTI_SUFFIXES, WILDCARD_TLDS, WILDCARD_EXCEPTIONS),
}


def tables() -> tuple[frozenset[str], frozenset[str], frozenset[str]]:
    return _tables["multi"], _tables["wild"], _tables["exc"]


def load_psl_file(path: str) -> None:
    """Replace the snapshot tables with a full public_suffix_list.dat
    (publicsuffix.org format: comments ``//``, wildcards ``*.``,
    exceptions ``!``). Single-label exact rules are dropped — the default
    1-label suffix already covers them. Nested wildcards
    (``*.kawasaki.jp``) keep their full base so the suffix is computed
    one label PAST the base, exactly as tldextract does."""
    multi, wild, exc = set(), set(), set()
    with open(path, encoding="utf8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            if line.startswith("!"):
                exc.add(line[1:].lower())
            elif line.startswith("*."):
                wild.add(line[2:].lower())
            elif "." in line:
                multi.add(line.lower())
    _tables.update(
        multi=frozenset(multi),
        wild=frozenset(wild),
        exc=frozenset(exc),
        maxk=_max_rule_labels(multi, wild, exc),  # type: ignore[arg-type]
    )


def suffix_label_count(labels: list[str]) -> int:
    """Number of trailing labels forming the public suffix
    (publicsuffix.org algorithm over the loaded tables: an exception rule
    prevails over everything and yields its label count minus one;
    otherwise the longest exact or wildcard match wins; default 1)."""
    multi, wild, exc = tables()
    n = len(labels)
    top = min(n, _tables["maxk"])
    for k in range(top, 0, -1):
        if ".".join(labels[-k:]) in exc:
            return k - 1
    best = 1
    for k in range(top, 1, -1):
        if ".".join(labels[-k:]) in multi:
            best = k
            break
    # wildcard "*.base": matches when the host ends with base AND has a
    # label left for the "*" — suffix = base labels + 1
    for k in range(top, 1, -1):
        if ".".join(labels[-(k - 1):]) in wild:
            best = max(best, k)
            break
    return best
