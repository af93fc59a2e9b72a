"""Redirect-chain resolution (plans/redirects.py)."""

from __future__ import annotations

from secretscraper_spark.plans.redirects import resolve_redirects


def test_chains_cycles_and_caps(spark):
    rows = [
        # 3-hop chain a->b->c->T
        ("a", "b"), ("b", "c"), ("c", "T"),
        # single hop
        ("x", "Y"),
        # 2-cycle
        ("p", "q"), ("q", "p"),
        # self-loop
        ("s", "s"),
    ]
    df = spark.createDataFrame(rows, "src string, dst string")
    got = {
        r.url: (r.final_url, r.n_hops, r.unresolved)
        for r in resolve_redirects(df, max_hops=32).collect()
    }
    assert got == {
        "a": ("T", 3, False),
        "b": ("T", 2, False),
        "c": ("T", 1, False),
        "x": ("Y", 1, False),
        "p": ("-", -1, True),
        "q": ("-", -1, True),
        "s": ("-", -1, True),
    }


def test_long_chain_within_and_over_cap(spark):
    # 20-node chain n0->n1->...->n20 (terminal n20)
    rows = [(f"n{i}", f"n{i+1}") for i in range(20)]
    df = spark.createDataFrame(rows, "src string, dst string")
    got = {
        r.url: (r.final_url, r.n_hops, r.unresolved)
        for r in resolve_redirects(df, max_hops=32).collect()
    }
    assert got["n0"] == ("n20", 20, False)
    assert got["n19"] == ("n20", 1, False)
    # cap below the chain length: head flagged unresolved, tail resolves
    capped = {
        r.url: r.unresolved
        for r in resolve_redirects(df, max_hops=8).collect()
    }
    assert capped["n19"] is False
    assert capped["n0"] is True


def test_non_power_of_two_cap(spark):
    """max_hops=10: doubling rounds cover 16 hops, but chains needing
    11-16 must still be flagged over-cap (the contract is max_hops, not
    2^ceil(log2(max_hops)))."""
    rows = [(f"n{i}", f"n{i+1}") for i in range(12)]
    df = spark.createDataFrame(rows, "src string, dst string")
    got = {
        r.url: (r.n_hops, r.unresolved)
        for r in resolve_redirects(df, max_hops=10).collect()
    }
    assert got["n2"] == (10, False)   # exactly at the cap
    assert got["n1"][1] is True       # needs 11 -> over cap
    assert got["n0"][1] is True       # needs 12 -> over cap


def test_early_exit_all_short_chains(spark):
    """All 1-hop chains resolve in round one; the fixpoint probe must not
    change results."""
    df = spark.createDataFrame(
        [("a", "T1"), ("b", "T2")], "src string, dst string"
    )
    got = {
        r.url: (r.final_url, r.n_hops, r.unresolved)
        for r in resolve_redirects(df, max_hops=32).collect()
    }
    assert got == {"a": ("T1", 1, False), "b": ("T2", 1, False)}
