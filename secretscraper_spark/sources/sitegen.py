"""Deterministic synthetic web graph + image/caption pages table (seed=42).

One pure function of the row index drives everything (URL, host, children,
caption markup, planted secrets, status, content type, image pixels), so the
reference-semantics simulator (refsim.py) and the Spark engine consume
byte-identical "webs" without sharing state.

Graph shape per FIXTURES.md §4: G host groups (site{g}.test plus
sub{k}.site{g}.test), out-degree ~5, one hot host (~30% of URLs) to exercise
skew, dangerous/static/garbage links, regex-only links, missing links (fetch
→ None), planted secrets in ~10% of captions.

Scale path: generate_pages_spark() builds the table distributed via
mapInPandas over spark.range — no driver materialization, any N.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..operators.imagecodec import encode_image, phash64, pixels_for

SEED = 42

# one exemplar per loaded rule (FIXTURES.md §3) — cycled through captions
PLANTED_SECRETS = [
    "swagger endpoint: /static/swagger-ui.html",
    "identity: 130528200011110000",
    'mobile: "13273487666"',
    "sourcemap hint: /xx/static/asdfaf.js.map",
    'mail: "3333333qqqxxxx@qq.com"',
    "intranet: 10.0.0.1",
    "cloud: Accesskeyid=xxxx AccessKeySecret",
    "session: xxx=deleteme rememberme=true",
    "token: '9c65a3ebabdb448b4476b114ee574a6f'",
    'bearer: "eyJhbGciOiJIUzI1NiJ9.eyJzdWIiOiIxMjM0NTY3ODkwIn0"',
]


def host_for(i: int, n_hosts: int) -> str:
    """Host of page i. Host group 0 is the hot host (~30% of pages)."""
    g = 0 if i % 10 < 3 else 1 + (i % max(n_hosts - 1, 1))
    if i % 19 == 0:
        return f"sub{i % 2}.site{g}.test"
    return f"site{g}.test"


def url_for(i: int, n_hosts: int) -> str:
    return f"http://{host_for(i, n_hosts)}/p/{i}"


def child_ids(i: int, n_pages: int) -> list[int]:
    """~5 deterministic children; collisions across parents are intended
    (shared-child regression, tests/test_crawler_regressions.py:68-100)."""
    out: list[int] = []
    for j in range(1, 6):
        c = (i * 5 + j * j * 7 + 1) % n_pages
        if c != i and c not in out:
            out.append(c)
    return out


def status_for(i: int) -> str:
    if i % 37 == 0:
        return "404"
    if i % 41 == 0:
        return "302"
    return "200"


def content_type_for(i: int) -> str:
    if i % 23 == 0:
        return "application/json"
    if i % 29 == 0:
        return "application/octet-stream"
    if i % 31 == 0:
        return "application/pdf"
    if i % 53 == 0:
        return "image/png"
    if i % 59 == 0:
        return ""
    return "text/html; charset=utf-8"


def _filler(i: int, nbytes: int) -> str:
    """Deterministic secret-free filler text (~nbytes). Real pages are tens
    of KB; the default fixtures keep captions tiny for fast tests, while the
    bench passes filler_bytes≈4-8 KB so the extraction UDFs — the true hot
    path at web scale — dominate per-tier fixed costs."""
    if nbytes <= 0:
        return ""
    base = (
        f" f{i % 9973} lorem ipsum dolor sit amet consectetur adipiscing elit"
        f" sed eiusmod tempor incididunt ut labore et dolore magna aliqua x{i % 89}"
    )
    reps = nbytes // len(base) + 1
    return (base * reps)[:nbytes]


def caption_for(i: int, n_pages: int, n_hosts: int, filler_bytes: int = 0) -> str:
    """Page body: title + link markup + planted secrets + filler."""
    host = host_for(i, n_hosts)
    parts = [f"<title>Page {i}</title>"]
    for j, c in enumerate(child_ids(i, n_pages)):
        c_host = host_for(c, n_hosts)
        if c_host == host:
            parts.append(f'<a href="/p/{c}">k{j}</a>')
        else:
            parts.append(f'<a href="http://{c_host}/p/{c}">k{j}</a>')
    parts.append(f'<script src="/assets/app{i % 7}.js"></script>')
    if i % 3 == 0:
        g2 = (i + 1) % n_hosts
        parts.append(f'var u = "http://site{g2}.test/rx/{i}";')  # regex-only link
    if i % 11 == 0:
        parts.append('<link href="/logout"/>')  # dangerous (evaded at fetch)
    if i % 13 == 0:
        parts.append('<img src="/favicon.ico"/><a href="/x.png">s</a>')  # static
    if i % 17 == 0:
        parts.append('<a href="javascript:void(0)">g</a><a href="http://example.com/x">g2</a>')
    if i % 7 == 0:
        parts.append(f'<a href="/missing/{i}">m</a>')  # not in pages → fetch None
    if i % 10 == 0:
        parts.append(PLANTED_SECRETS[(i // 10) % len(PLANTED_SECRETS)])
    parts.append(f"filler lorem ipsum value {i} data spark batch row scan")
    if filler_bytes:
        parts.append(_filler(i, filler_bytes))
    return "\n".join(parts)


_SIZES = [32, 64, 128]


def page_row(
    i: int, n_pages: int, n_hosts: int, include_images: bool,
    filler_bytes: int = 0,
) -> dict:
    caption = caption_for(i, n_pages, n_hosts, filler_bytes)
    url = url_for(i, n_hosts)
    w = _SIZES[i % 3]
    h = _SIZES[(i // 3) % 3]
    fmt = "png" if i % 2 == 0 else "jpeg"
    if include_images:
        px = pixels_for(SEED + i, w, h)
        data = encode_image(px, fmt)
        ph = phash64(px)
    else:
        data, ph = b"", 0
    title = f"Page {i}"
    return {
        "image_id": f"img_{i:08d}",
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": ph,
        "url": url,
        "url_norm": url,  # url_for emits canonical form already
        "status": status_for(i),
        "content_type": content_type_for(i),
        "content_length": len(caption),
        "title": title,
    }


def generate_pages_pandas(
    n_pages: int, n_hosts: int = 4, include_images: bool = False,
    filler_bytes: int = 0,
) -> pd.DataFrame:
    df = pd.DataFrame(
        [page_row(i, n_pages, n_hosts, include_images, filler_bytes) for i in range(n_pages)]
    )
    df["w"] = df["w"].astype(np.int32)
    df["h"] = df["h"].astype(np.int32)
    df["phash"] = df["phash"].astype(np.int64)
    df["content_length"] = df["content_length"].astype(np.int64)
    return df


def generate_pages_spark(
    spark, n_pages: int, n_hosts: int = 4, include_images: bool = False,
    partitions: int | None = None, filler_bytes: int = 0,
):
    """Distributed generation — scales to any N (mapInPandas over range)."""
    from ..schemas import PAGES_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = [
                page_row(int(i), n_pages, n_hosts, include_images, filler_bytes)
                for i in batch["id"]
            ]
            yield pd.DataFrame(rows)

    rng = spark.range(0, n_pages, numPartitions=partitions or max(n_pages // 50_000, 8))
    return rng.mapInPandas(gen, PAGES_SCHEMA)


def seeds_for(n_hosts: int = 4) -> list[str]:
    """Seed list: pages on distinct hosts + one duplicate
    (dedup check, reference facade.py:176-192)."""
    seeds = [url_for(i, n_hosts) for i in (5, 7, 10)]  # two cold hosts + hot host
    seeds.append(seeds[0])  # duplicate
    return seeds


# ---------------------------------------------------------------------------
# Catalyst twins: the SAME page arithmetic as pure Column expressions, so a
# scale leg can run fetch as an in-plan projection — zero pages storage, zero
# Python in the fetch path. The 10^9-site leg cannot materialize its pages
# table (a 10^8 site is 9.3 GB parquet; 10^9 exceeds the sandbox volume), and
# production's equivalent is a fetch that computes/looks up the page without
# a 100 TB broadcast anyway. Bit-identity with the mapInPandas generator is
# pinned per field in tests/test_plans.py and end-to-end by crawl digest
# parity (synthetic fetch ≡ join vs a generated site).
# ---------------------------------------------------------------------------


def _host_expr(i, n_hosts: int):
    from pyspark.sql import functions as F

    g = F.when(F.pmod(i, F.lit(10)) < 3, F.lit(0).cast("long")).otherwise(
        F.lit(1) + F.pmod(i, F.lit(max(n_hosts - 1, 1)))
    )
    base = F.concat(F.lit("site"), g.cast("string"), F.lit(".test"))
    return F.when(
        F.pmod(i, F.lit(19)) == 0,
        F.concat(F.lit("sub"), F.pmod(i, F.lit(2)).cast("string"), F.lit("."), base),
    ).otherwise(base)


def url_expr(i, n_hosts: int):
    """Catalyst twin of url_for(i, n_hosts)."""
    from pyspark.sql import functions as F

    return F.concat(
        F.lit("http://"), _host_expr(i, n_hosts), F.lit("/p/"), i.cast("string")
    )


def status_expr(i):
    from pyspark.sql import functions as F

    return (
        F.when(F.pmod(i, F.lit(37)) == 0, F.lit("404"))
        .when(F.pmod(i, F.lit(41)) == 0, F.lit("302"))
        .otherwise(F.lit("200"))
    )


def content_type_expr(i):
    from pyspark.sql import functions as F

    return (
        F.when(F.pmod(i, F.lit(23)) == 0, F.lit("application/json"))
        .when(F.pmod(i, F.lit(29)) == 0, F.lit("application/octet-stream"))
        .when(F.pmod(i, F.lit(31)) == 0, F.lit("application/pdf"))
        .when(F.pmod(i, F.lit(53)) == 0, F.lit("image/png"))
        .when(F.pmod(i, F.lit(59)) == 0, F.lit(""))
        .otherwise(F.lit("text/html; charset=utf-8"))
    )


def caption_expr(i, n_pages: int, n_hosts: int, filler_bytes: int = 0):
    """Catalyst twin of caption_for — byte-identical output (concat_ws
    skips the NULLs the conditional arms produce, exactly like Python's
    conditional append; array_distinct/filter preserve first-occurrence
    order, matching the `c not in out` dedup)."""
    from pyspark.sql import functions as F

    istr = i.cast("string")
    host = _host_expr(i, n_hosts)
    child_cols = [
        F.pmod(i * 5 + F.lit(j * j * 7 + 1), F.lit(n_pages)) for j in range(1, 6)
    ]
    children = F.array_distinct(
        F.filter(F.array(*child_cols), lambda x: x != i)
    )

    def link(c, j):
        c_host = _host_expr(c, n_hosts)
        rel = F.concat(
            F.lit('<a href="/p/'), c.cast("string"), F.lit('">k'),
            j.cast("string"), F.lit("</a>"),
        )
        absu = F.concat(
            F.lit('<a href="http://'), c_host, F.lit("/p/"), c.cast("string"),
            F.lit('">k'), j.cast("string"), F.lit("</a>"),
        )
        return F.when(c_host == host, rel).otherwise(absu)

    links = F.transform(children, link)
    secret = F.element_at(
        F.array(*[F.lit(s) for s in PLANTED_SECRETS]),
        (F.pmod(F.floor(i / 10), F.lit(len(PLANTED_SECRETS))) + 1).cast("int"),
    )
    parts = [
        F.concat(F.lit("<title>Page "), istr, F.lit("</title>")),
        F.when(F.size(children) > 0, F.array_join(links, "\n")),
        F.concat(
            F.lit('<script src="/assets/app'), F.pmod(i, F.lit(7)).cast("string"),
            F.lit('.js"></script>'),
        ),
        F.when(
            F.pmod(i, F.lit(3)) == 0,
            F.concat(
                F.lit('var u = "http://site'),
                F.pmod(i + 1, F.lit(n_hosts)).cast("string"),
                F.lit(".test/rx/"), istr, F.lit('";'),
            ),
        ),
        F.when(F.pmod(i, F.lit(11)) == 0, F.lit('<link href="/logout"/>')),
        F.when(
            F.pmod(i, F.lit(13)) == 0,
            F.lit('<img src="/favicon.ico"/><a href="/x.png">s</a>'),
        ),
        F.when(
            F.pmod(i, F.lit(17)) == 0,
            F.lit(
                '<a href="javascript:void(0)">g</a>'
                '<a href="http://example.com/x">g2</a>'
            ),
        ),
        F.when(
            F.pmod(i, F.lit(7)) == 0,
            F.concat(F.lit('<a href="/missing/'), istr, F.lit('">m</a>')),
        ),
        F.when(F.pmod(i, F.lit(10)) == 0, secret),
        F.concat(
            F.lit("filler lorem ipsum value "), istr,
            F.lit(" data spark batch row scan"),
        ),
    ]
    if filler_bytes:
        base = F.concat(
            F.lit(" f"), F.pmod(i, F.lit(9973)).cast("string"),
            F.lit(
                " lorem ipsum dolor sit amet consectetur adipiscing elit"
                " sed eiusmod tempor incididunt ut labore et dolore magna"
                " aliqua x"
            ),
            F.pmod(i, F.lit(89)).cast("string"),
        )
        reps = (
            F.floor(F.lit(filler_bytes) / F.length(base)) + 1
        ).cast("int")
        parts.append(F.substring(F.repeat(base, reps), 1, filler_bytes))
    return F.concat_ws("\n", *parts)


def synthetic_fetch_map(n_pages: int, n_hosts: int = 8, filler_bytes: int = 0):
    """SparkCrawler fetch_mode='mapped' hook: frontier → fetched rows via
    the Catalyst page expressions. Join-miss semantics preserved exactly:
    a URL resolves iff it parses as /p/{i} with 0 ≤ i < n_pages AND
    round-trips through url_expr (the host test folded into one string
    equality) — /missing/, /rx/, static and malformed URLs drop, same as
    the inner fetch join against a generated site."""
    from pyspark.sql import DataFrame, functions as F

    def fetch(to_process: DataFrame) -> DataFrame:
        s = F.regexp_extract("url_norm", r"^http://[a-z0-9.]+/p/([0-9]+)$", 1)
        # length guard keeps the ANSI long cast total
        i = F.when((s != "") & (F.length(s) <= 12), s.cast("long"))
        valid = (
            to_process.withColumn("__i", i)
            .filter(
                F.col("__i").isNotNull()
                & (F.col("__i") < F.lit(n_pages))
                & (F.col("url_norm") == url_expr(F.col("__i"), n_hosts))
            )
        )
        return (
            valid.withColumn(
                "caption",
                caption_expr(F.col("__i"), n_pages, n_hosts, filler_bytes),
            )
            .withColumn("status", status_expr(F.col("__i")))
            .withColumn("content_type", content_type_expr(F.col("__i")))
            .withColumn("content_length", F.length("caption").cast("long"))
            .drop("__i")
        )

    return fetch


def seed_urls_spark(spark, n_pages: int, stride: int, n_hosts: int = 8):
    """Distributed seed table (ord, url) for run_from_urls — the stride-
    seeded scale legs' seed list is 10^7+ rows at a 10^9 site and must
    never transit the driver as a Python list."""
    from pyspark.sql import functions as F

    return spark.range(0, n_pages, step=stride).select(
        F.col("id").alias("ord"),
        url_expr(F.col("id"), n_hosts).alias("url"),
    )
