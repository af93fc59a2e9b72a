"""DUST parameter-rule mining — learn which query params never matter.

`operators/urlnorm.canonical_url` strips a HARDCODED tracking-param list
(utm_*, fbclid, …); at web scale every large site also has its own
content-irrelevant parameters (session ids, cache busters, pagination
tokens of mirrored views) that no static list can know. This module
LEARNS them from fetched evidence, following the DustBuster idea
("Do Not Crawl in the DUST: Different URLs with Similar Text",
Bar-Yossef, Keidar & Schonfeld, WWW 2007): a rewrite rule is valid when
applying it never lands two URLs with different content on the same
rewritten form. Here the rule class is "drop query parameter *p* on host
*h*", validated against content fingerprints:

- for each (host, param) and EVERY URL on the host — carriers and
  non-carriers alike — compute the RESIDUAL: the URL's rewritten form
  with every ``param=…`` pair removed (a no-op for non-carriers;
  remaining params sorted so order never splits a group). Including
  non-carriers is what makes the invariant sound: a carrier rewrites
  onto the bare/other-params form, so that form's content must sit in
  the same validation group (``/x?sid=1`` with content A must not
  collapse onto a bare ``/x`` whose content is B);
- a rule is SAFE when every residual group that actually collapses
  URLs (>1 distinct URL) holds exactly ONE distinct content, and at
  least *min_evidence* such collapsing groups exist (rules with no
  collapsing evidence are unproven, not safe). Residuals keep the
  fragment — this repo's URL identity does (SURVEY §7), so two URLs
  differing only in fragment must not count as collapsing evidence;
- finally the JOINT rewrite is re-validated: individually-safe rules
  compose (``apply_param_rules`` drops all of a host's rules at once),
  and dropping {a} and {b} separately proving safe does NOT prove
  dropping {a, b} together is — so the corpus is rewritten through the
  exact consumer and any host whose composed rewrite collapses two
  contents has its whole rule set revoked (conservative but sound:
  what ships is exactly what was validated).

The reference has no counterpart (single-site, crawl-once —
`crawler.py` never revisits enough to learn rules); this is the
web-scale complement to its hardcoded `settings.yml` filters, exactly
like `plans/traps.py` complements its `max_page_num` budget.

Plan shape (100 TB): one map-only projection (regex decomposition +
HOF filter over the split query — no UDF), one fan-out join against
the (host × param) candidate dim (bounded by distinct params per
host), then two hash aggregations that share the ``(host, param)``
grouping prefix. Content identity is ``md5(content)``
(same convention as `plans/traps.py` — distinct-count of the digest
equals distinct-count of the content, and any engine can recompute it).
The rule table is (host × param)-sized — a broadcastable dim; the
consumer :func:`apply_param_rules` broadcasts it so the frontier (the
big side) never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from secretscraper_spark.operators.urlnorm import URL_PARTS_PATTERN

#: one decomposition shared with operators/urlnorm (single source of
#: truth): groups 1=scheme 2=host(authority) 3=path 4=query(no '?'/'#')
_URL_RE = URL_PARTS_PATTERN


def _kv_name(kv: F.Column) -> F.Column:
    """Parameter name of a ``k=v`` (or bare ``k``) query pair."""
    return F.element_at(F.split(kv, "=", 2), 1)


def param_rules(
    pages: DataFrame,
    url_col: str = "url_norm",
    content_col: str = "caption",
    min_evidence: int = 1,
) -> DataFrame:
    """Mine safe drop-this-param rules from a fetched-pages table.

    Returns ``(host, param, n_urls, n_groups, n_multi_groups)`` for every
    rule that passed validation: *n_urls* distinct URLs on the host were
    checked against the rule (carriers AND the non-carrier forms they
    rewrite onto), spread over *n_groups* residual groups of which
    *n_multi_groups* collapse >1 distinct URL — and NONE of the
    collapsing groups mixes two distinct contents. Hosts with no
    parameterized URL contribute no candidate params and drop out."""
    url = F.col(url_col)
    kvs = F.filter(
        F.split(F.regexp_extract(url, _URL_RE, 4), "&"), lambda p: p != ""
    )
    base = pages.select(
        F.regexp_extract(url, _URL_RE, 2).alias("host"),
        F.regexp_extract(url, _URL_RE, 3).alias("path"),
        kvs.alias("kvs"),
        F.regexp_extract(url, r"(#.*)$", 1).alias("frag"),
        url.alias("u"),
        F.md5(F.coalesce(F.col(content_col), F.lit(""))).alias("c"),
    )
    # candidate rules: every DISTINCT param name seen on the host
    # (a=1&a=2 contributes once)
    host_params = (
        base.select(
            "host",
            F.explode(
                F.array_distinct(F.transform(F.col("kvs"), _kv_name))
            ).alias("param"),
        )
        .distinct()
    )
    # fan-out: every URL of the host is validated against every candidate
    # param — this is what puts a carrier and the bare/other-params form
    # it rewrites onto into the SAME residual group (see module doc)
    exploded = base.join(host_params, "host")
    residual = F.concat(
        F.col("path"),
        F.lit("?"),
        F.array_join(
            F.array_sort(
                F.filter(
                    F.col("kvs"), lambda p: _kv_name(p) != F.col("param")
                )
            ),
            "&",
        ),
        F.col("frag"),  # fragment is part of this repo's URL identity
    )
    grp = (
        exploded.select("host", "param", residual.alias("residual"), "u", "c")
        .groupBy("host", "param", "residual")
        .agg(
            F.count_distinct("u").alias("g_urls"),
            F.count_distinct("c").alias("g_content"),
        )
    )
    multi = F.col("g_urls") > 1
    single = (
        grp.groupBy("host", "param")
        .agg(
            F.sum("g_urls").cast("long").alias("n_urls"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(multi, 1).otherwise(0))
            .cast("long")
            .alias("n_multi_groups"),
            F.sum(F.when(multi & (F.col("g_content") > 1), 1).otherwise(0))
            .cast("long")
            .alias("_violations"),
        )
        .filter(
            (F.col("_violations") == 0)
            & (F.col("n_multi_groups") >= int(min_evidence))
        )
        .drop("_violations")
    )
    # joint re-validation (see module doc): rewrite the corpus through the
    # exact consumer with ALL of each host's surviving rules at once; a
    # host whose composed rewrite collapses two distinct contents loses
    # its whole rule set. The rule table is aggregate-sized, so its reuse
    # below costs one small recompute, not a corpus rescan per reference.
    rewritten = apply_param_rules(
        pages.select(
            F.col(url_col).alias("_u_orig"),
            F.col(url_col).alias("_u_rw"),
            F.md5(F.coalesce(F.col(content_col), F.lit(""))).alias("_c"),
        ),
        single,
        url_col="_u_rw",
    )
    bad_hosts = (
        rewritten.groupBy("_u_rw")
        .agg(
            F.count_distinct("_u_orig").alias("j_urls"),
            F.count_distinct("_c").alias("j_content"),
        )
        .filter((F.col("j_urls") > 1) & (F.col("j_content") > 1))
        .select(
            F.regexp_extract(F.col("_u_rw"), _URL_RE, 2).alias("host")
        )
        .distinct()
    )
    return single.join(F.broadcast(bad_hosts), "host", "left_anti")


def apply_param_rules(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url_norm",
) -> DataFrame:
    """Rewrite *url_col* by dropping every (host, param) the mined *rules*
    dim flags — the frontier-side consumer, shaped like
    `plans/traps.prune_trapped`: the rule table rolls up to one
    param-array per host and BROADCASTS, so the big side never shuffles.
    A URL is rewritten ONLY when it actually carries a dropped param —
    URLs on hosts with no rules, with no query, or carrying none of the
    host's dropped params pass through byte-identical (a bare trailing
    ``?`` or empty ``&&`` segment is NOT normalized away: in this repo
    the verbatim string is the crawl identity). A query emptied by the
    rewrite loses its ``?``. All other columns are preserved."""
    url = F.col(url_col)
    per_host = F.broadcast(
        rules.groupBy("host")
        .agg(F.collect_set("param").alias("_drop"))
        .select(F.col("host").alias("_rule_host"), "_drop")
    )
    tagged = urls.withColumn(
        "_host", F.regexp_extract(url, _URL_RE, 2)
    ).join(
        per_host, F.col("_host") == F.col("_rule_host"), "left"
    ).drop("_rule_host")
    kept = F.filter(
        F.filter(F.split(F.regexp_extract(url, _URL_RE, 4), "&"),
                 lambda p: p != ""),
        lambda p: ~F.array_contains(F.col("_drop"), _kv_name(p)),
    )
    q = F.array_join(kept, "&")
    rebuilt = F.concat(
        F.regexp_extract(url, _URL_RE, 1),
        F.lit("://"),
        F.col("_host"),
        F.regexp_extract(url, _URL_RE, 3),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        F.regexp_extract(url, r"(#.*)$", 1),  # crawl identity keeps fragments
    )
    carries_dropped = F.exists(
        F.split(F.regexp_extract(url, _URL_RE, 4), "&"),
        lambda p: (p != "") & F.array_contains(F.col("_drop"), _kv_name(p)),
    )
    rewrite = (
        F.col("_drop").isNotNull() & url.rlike(_URL_RE) & carries_dropped
    )
    return tagged.withColumn(
        url_col, F.when(rewrite, rebuilt).otherwise(url)
    ).drop("_host", "_drop")
