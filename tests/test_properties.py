"""Property-based tests (hypothesis) for the pure semantic kernel — beyond
the reference's example-based suite (SURVEY §5 notes it has no property
tests). These pin the invariants the distributed engine depends on:

- parse6/unparse6 is a fixpoint after one round trip (url identity D1/P11
  is well-defined: re-parsing a canonical form is stable)
- unparse6 ∘ parse6 agrees with urllib's own geturl() — the reference's
  exact serialization (entity.py:47-50)
- sanitize_url is idempotent (a reject-only gate must not oscillate)
- the Column-expr filters agree with their pure-python twins on arbitrary
  inputs (Catalyst path == kernel path, so pushing predicates down can
  never change crawl semantics)
"""

from __future__ import annotations

from urllib.parse import urlparse

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from secretscraper_spark.functions import purekit as pk

URL_CHARS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
             "-._~/?#[]@!$&'()*+,;=%: ",
    max_size=60,
)
HOSTY = st.from_regex(r"[a-z0-9.-]{0,20}", fullmatch=True)
PATHY = st.from_regex(r"(/[A-Za-z0-9._~%/-]{0,30})?", fullmatch=True)


@given(URL_CHARS)
@settings(max_examples=300, suppress_health_check=[HealthCheck.filter_too_much])
def test_parse_unparse_fixpoint(u):
    t1 = pk.parse6(u)
    n1 = pk.unparse6(t1)
    t2 = pk.parse6(n1)
    n2 = pk.unparse6(t2)
    assert n1 == n2  # canonical form is stable under re-parse


@given(URL_CHARS)
@settings(max_examples=300)
def test_unparse_matches_urllib(u):
    assert pk.unparse6(pk.parse6(u)) == urlparse(u).geturl()


@given(URL_CHARS)
@settings(max_examples=300)
def test_sanitize_idempotent(u):
    s1 = pk.sanitize_url(u)
    assert pk.sanitize_url(s1) == s1  # "" stays "", clean stays clean


@given(PATHY)
@settings(max_examples=200)
def test_js_path_matches_reference_def(path):
    expected = (
        path.endswith(".js") or path.endswith(".js.map") or ".js?" in path
    )
    assert pk.is_js_path(path) == expected


@given(st.one_of(st.none(), st.text(max_size=40)))
@settings(max_examples=200)
def test_is_extend_total(ct):
    # total function: never raises, returns bool (crawler.py:314-323 arm set)
    out = pk.is_extend(ct)
    assert isinstance(out, bool)
    if ct:
        main = ct.split(";")[0].strip().lower()
        if main.startswith("text/"):
            assert out
        if main in ("application/octet-stream", "application/pdf"):
            assert not out


@given(HOSTY, PATHY)
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_exprs_agree_with_kernel(spark, host, path):
    """The Catalyst Column exprs and the pure-python kernel must agree —
    this is what makes predicate pushdown semantics-preserving."""
    from pyspark.sql import functions as F

    from secretscraper_spark.functions.exprs import (
        is_dangerous_path,
        is_js_expr,
        is_static_resource_expr,
    )

    df = spark.createDataFrame([(host, path)], "host string, path string")
    row = df.select(
        is_static_resource_expr(F.col("path")).alias("static"),
        is_dangerous_path(F.col("path")).alias("danger"),
        is_js_expr(F.col("path")).alias("js"),
    ).first()
    from secretscraper_spark.config import DANGEROUS_PATHS

    assert row.static == pk.is_static_resource(path)
    assert row.danger == pk.make_evade_matcher(DANGEROUS_PATHS)(path)
    assert row.js == pk.is_js_path(path)
