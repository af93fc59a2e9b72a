"""DUST parameter-rule mining tests (plans/dust.py)."""

from __future__ import annotations

from secretscraper_spark.plans.dust import apply_param_rules, param_rules


def _pages(spark):
    rows = []
    # a.example: sid is content-irrelevant (content depends on page only),
    # page is content-RELEVANT. 2 pages x 3 sids = 6 URLs.
    for page in range(2):
        for sid in range(3):
            rows.append(
                (
                    f"http://a.example/x?page={page}&sid={sid}",
                    f"page body {page}",
                )
            )
    # b.example: v appears on ONE url only -> no collapsing evidence
    rows.append(("http://b.example/y?v=1", "solo"))
    # c.example: t collapses two urls onto one residual with EQUAL
    # content -> safe rule with exactly one multi group
    rows.append(("http://c.example/z?t=0&q=k", "same"))
    rows.append(("http://c.example/z?t=1&q=k", "same"))
    # and q on c.example: removing q leaves t=0 / t=1 residuals, one URL
    # each -> no evidence
    return spark.createDataFrame(rows, "url_norm string, caption string")


def test_param_rules_mines_safe_params_only(spark):
    rules = {
        (r.host, r.param): r for r in param_rules(_pages(spark)).collect()
    }
    assert set(rules) == {("a.example", "sid"), ("c.example", "t")}
    sid = rules[("a.example", "sid")]
    # 6 urls carry sid, in 2 residual groups (one per page), both multi
    assert (sid.n_urls, sid.n_groups, sid.n_multi_groups) == (6, 2, 2)
    t = rules[("c.example", "t")]
    assert (t.n_urls, t.n_groups, t.n_multi_groups) == (2, 1, 1)


def test_param_rules_violation_rejects(spark):
    # page: removing it groups (sid=s) residuals holding 2 distinct
    # contents each -> violation -> must NOT be a rule (checked above via
    # the exact rule-set equality; here the stronger min_evidence screen)
    rules = param_rules(_pages(spark), min_evidence=2).collect()
    assert {(r.host, r.param) for r in rules} == {("a.example", "sid")}


def test_param_rules_bare_form_blocks_unsafe_rule(spark):
    # the DustBuster invariant on the REWRITTEN form: carriers of sid
    # rewrite onto the bare /x, whose content differs -> sid must NOT
    # mine as safe even though the carriers agree among themselves
    df = spark.createDataFrame(
        [
            ("http://e.example/x?sid=1", "A"),
            ("http://e.example/x?sid=2", "A"),
            ("http://e.example/x", "B"),
        ],
        "url_norm string, caption string",
    )
    assert param_rules(df).collect() == []


def test_param_rules_bare_form_joins_evidence(spark):
    # same shape but the bare form AGREES -> the rule is safe and the
    # bare URL counts into the collapsing group's evidence
    df = spark.createDataFrame(
        [
            ("http://e.example/x?sid=1", "A"),
            ("http://e.example/x?sid=2", "A"),
            ("http://e.example/x", "A"),
        ],
        "url_norm string, caption string",
    )
    r = param_rules(df).collect()[0]
    assert (r.host, r.param) == ("e.example", "sid")
    assert (r.n_urls, r.n_groups, r.n_multi_groups) == (3, 1, 1)


def test_param_rules_joint_composition_revokes(spark):
    # a and b are each individually safe (their own carriers never
    # collapse, and /y resp. /z provide clean evidence), but dropping
    # BOTH — which apply_param_rules does — collapses /x?a=1&b=1 (A)
    # and /x?a=2&b=2 (B) onto one form. The joint re-validation must
    # revoke the host's rules.
    df = spark.createDataFrame(
        [
            ("http://h.example/y?a=1", "E"),
            ("http://h.example/y", "E"),
            ("http://h.example/z?b=1", "F"),
            ("http://h.example/z", "F"),
            ("http://h.example/x?a=1&b=1", "A"),
            ("http://h.example/x?a=2&b=2", "B"),
        ],
        "url_norm string, caption string",
    )
    assert param_rules(df).collect() == []


def test_param_rules_fragment_is_identity(spark):
    # two URLs differing only in fragment are DISTINCT identities in this
    # repo — they must not manufacture collapsing evidence for an
    # unrelated param ('sid' has one carrier and no real evidence here)
    df = spark.createDataFrame(
        [
            ("http://f.example/x#a", "A"),
            ("http://f.example/x#b", "A"),
            ("http://f.example/q?sid=9", "C"),
        ],
        "url_norm string, caption string",
    )
    assert param_rules(df).collect() == []


def test_apply_rewrites_only_carriers(spark):
    # on a ruled host, URLs carrying NONE of the dropped params pass
    # through byte-identical — a bare '?' or an empty '&&' segment is
    # crawl identity here, not noise to normalize
    pages = _pages(spark)
    rules = param_rules(pages)  # a.example: drop sid
    frontier = spark.createDataFrame(
        [
            ("http://a.example/x?",),
            ("http://a.example/x?page=1&&page=2",),
            ("http://a.example/x?page=1&&sid=9",),  # carrier: rewritten
        ],
        "url_norm string",
    )
    got = sorted(
        r.url_norm for r in apply_param_rules(frontier, rules).collect()
    )
    assert got == sorted(
        [
            "http://a.example/x?",
            "http://a.example/x?page=1&&page=2",
            "http://a.example/x?page=1",  # '&&' collapses only on rewrite
        ]
    )


def test_param_rules_duplicate_param_name_explodes_once(spark):
    # a=1&a=2 on one URL: param 'a' contributes ONE exploded row per URL
    df = spark.createDataFrame(
        [
            ("http://d.example/p?a=1&a=2", "c1"),
            ("http://d.example/p?a=3&a=4", "c1"),
        ],
        "url_norm string, caption string",
    )
    rules = param_rules(df).collect()
    assert len(rules) == 1
    r = rules[0]
    assert (r.host, r.param, r.n_urls, r.n_multi_groups) == (
        "d.example",
        "a",
        2,
        1,
    )


def test_apply_param_rules_rewrites(spark):
    pages = _pages(spark)
    rules = param_rules(pages)
    frontier = spark.createDataFrame(
        [
            # rule host: sid dropped, page kept (order preserved among kept)
            ("http://a.example/x?page=1&sid=9",),
            # rewrite empties the query: '?' must go; fragment survives
            ("http://c.example/z?t=5#frag",),
            # no rules for this host: unchanged
            ("http://e.example/w?sid=1",),
            # rule host but no query: unchanged
            ("http://a.example/x",),
            # garbage: unchanged
            ("not a url",),
        ],
        "url_norm string",
    )
    got = [r.url_norm for r in apply_param_rules(frontier, rules).collect()]
    assert sorted(got) == sorted(
        [
            "http://a.example/x?page=1",
            "http://c.example/z#frag",
            "http://e.example/w?sid=1",
            "http://a.example/x",
            "not a url",
        ]
    )


def test_apply_preserves_other_columns(spark):
    pages = _pages(spark)
    rules = param_rules(pages)
    frontier = spark.createDataFrame(
        [("http://a.example/x?sid=3&page=0", 7)], "url_norm string, depth int"
    )
    row = apply_param_rules(frontier, rules).collect()[0]
    assert row.url_norm == "http://a.example/x?page=0"
    assert row.depth == 7
