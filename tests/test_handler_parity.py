"""Port of the reference handler tests (tests/test_handler.py:25-30 and the
use_groups truth) against our RegexExtractor kernel."""

from __future__ import annotations

from secretscraper_spark.config import loaded_rules, url_finder_rules
from secretscraper_spark.functions.purekit import RegexExtractor


def test_every_loaded_rule_matches(planted_text):
    """Key invariant: every loaded rule fires ≥1 time on the corpus
    (reference tests/test_handler.py:25-30: len(types)==len(regex_dict))."""
    rules = loaded_rules()
    extractor = RegexExtractor(rules, use_groups=True)
    types = {t for t, _ in extractor.extract(planted_text)}
    assert types == set(rules.keys())


def test_unloaded_rule_absent(planted_text):
    """'URL as a Value' has loaded: false (settings.yml:55) and must not
    participate (util.py:35-36)."""
    assert "URL as a Value" not in loaded_rules()


def test_group_collapse_semantics():
    """Tuple matches collapse to group[0] (handler.py:49)."""
    ex = RegexExtractor({"r": r"(a(b))c"}, use_groups=True)
    assert ex.extract("abc") == [("r", "ab")]


def test_use_groups_false_whole_match():
    """search + group(0), first match only (handler.py:53-59)."""
    ex = RegexExtractor({"r": r"ab"}, use_groups=False)
    assert ex.extract("xxabyyab") == [("r", "ab")]


def test_case_insensitive():
    """All rules compiled with re.IGNORECASE (handler.py:38)."""
    ex = RegexExtractor({"Shiro": r"(=deleteMe|rememberMe=)"}, use_groups=True)
    assert ("Shiro", "=deleteme") in ex.extract("xxx=deleteme")


def test_expected_values(planted_text):
    rules = loaded_rules()
    got = set(RegexExtractor(rules, use_groups=True).extract(planted_text))
    assert ("Phone", "13273487666") in got
    assert ("Email", "3333333qqqxxxx@qq.com") in got
    assert ("Suspicious API Key", "'9c65a3ebabdb448b4476b114ee574a6f'") in got
    assert ("Internal IP", "10.0.0.1") in got
    assert ("ID Card", "130528200011110000") in got
    # quoting required: unquoted phone must NOT match
    got2 = set(RegexExtractor(rules, use_groups=True).extract("phone 13273487666 x"))
    assert not any(t == "Phone" for t, _ in got2)


def test_url_finder_rules_count():
    """5 urlFind + 3 jsFind patterns keyed urlFinder_{i}
    (facade.py:302-306, settings.yml:22-31)."""
    r = url_finder_rules()
    assert len(r) == 8
    assert set(r) == {f"urlFinder_{i}" for i in range(8)}


def test_engine_factory(regex_dict_loaded=None):
    """P6 factory (handler.py:165-194): explicit 're' works; 'hyperscan'
    raises here (wheel absent); 'auto' falls back to re."""
    import pytest as _pytest

    from secretscraper_spark.config import loaded_rules
    from secretscraper_spark.functions.purekit import (
        RegexExtractor,
        get_extractor,
    )

    rules = loaded_rules()
    assert isinstance(get_extractor(rules, engine="re"), RegexExtractor)
    assert isinstance(get_extractor(rules, engine="auto"), RegexExtractor)
    with _pytest.raises(ImportError):
        get_extractor(rules, engine="hyperscan")
    with _pytest.raises(ValueError):
        get_extractor(rules, engine="nope")
