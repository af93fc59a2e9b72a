"""Docs/contract consistency: the coverage map and the driver contract
must not drift apart as operators are added."""

from __future__ import annotations

import os

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_entry_is_documented():
    cov = open(f"{REPO}/COVERAGE.md").read()
    missing = [k for k in entrymod.queries() if k not in cov]
    assert not missing, f"queries() entries absent from COVERAGE.md: {missing}"


def test_oracle_keys_are_query_keys():
    qs = set(entrymod.queries())
    extra = set(entrymod.oracle_sql()) - qs
    assert not extra, f"oracle_sql() keys with no queries() entry: {extra}"


def test_oracle_coverage_ratio_documented():
    """Entries WITHOUT an oracle get only the weaker rows-only driver
    check — keep them a small, justified minority."""
    qs = set(entrymod.queries())
    no_oracle = qs - set(entrymod.oracle_sql())
    assert len(no_oracle) / len(qs) < 0.25, sorted(no_oracle)
