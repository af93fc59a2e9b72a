"""External configuration loading — S5 completed.

Mirrors the reference's Dynaconf setup (``config/__init__.py:14-33``) at
the granularity the engine consumes:

    shipped defaults  ◄─ user YAML file  ◄─ SECRETSCRAPER_* env vars

- The shipped defaults are the verbatim values of the reference's
  ``config/settings.yml`` (already captured as constants in
  :mod:`secretscraper_spark.config`); :func:`default_settings` renders
  them in the same document shape the YAML file uses.
- A user file loaded with ``settings.load_file(path)`` replaces keys at
  the TOP level (Dynaconf's default, no ``dynaconf_merge``): providing
  ``rules:`` replaces the whole rule list, providing ``headers:``
  replaces the whole header map.
- Environment variables override both, Dynaconf-style:
  ``SECRETSCRAPER_MAX_DEPTH=3`` sets ``max_depth``;
  ``SECRETSCRAPER_HEADERS__COOKIE=x`` sets the nested key
  (case-insensitive at every level, ``_``→``-`` folded so
  ``...__USER_AGENT`` reaches ``User-Agent``). Values are coerced like
  Dynaconf's toml parsing (bool/int/float/JSON, else raw string).

The merged settings dict feeds :func:`loaded_rules_from` (the
``loaded: true`` gate of ``util.read_rules_from_setting``,
``util.py:22-41``) and :func:`crawl_config_from`, so a rule added in a
user YAML extracts end-to-end with no code change.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping

from .config import (
    DANGEROUS_PATHS,
    JS_FIND,
    RULES,
    URL_FIND,
    CrawlConfig,
)

ENV_PREFIX = "SECRETSCRAPER_"

DEFAULT_UA = (
    "Mozilla/5.0 (Windows NT 10.0; WOW64) AppleWebKit/537.36 (KHTML, like "
    "Gecko) Chrome/80.0.3987.87 Safari/537.36 SE 2.X MetaSr 1.0"
)


def default_settings() -> dict[str, Any]:
    """The shipped configuration (reference ``config/settings.yml:1-73``)."""
    return {
        "verbose": False,
        "debug": False,
        "loglevel": "critical",
        "logpath": "log",
        "handler_type": "regex",
        "proxy": "",
        "max_depth": 1,
        "max_page_num": 1000,
        "timeout": 5,
        "follow_redirects": True,
        "workers_num": 1000,
        "max_connections": 100,
        "max_keepalive_connections": 50,
        "max_concurrent_per_domain": 5,
        "min_request_interval": 0.2,
        "headers": {"Accept": "*/*", "Cookie": "", "User-Agent": DEFAULT_UA},
        "urlFind": list(URL_FIND),
        "jsFind": list(JS_FIND),
        "dangerousPath": list(DANGEROUS_PATHS),
        "rules": [
            {"name": n, "regex": r, "loaded": loaded} for n, r, loaded in RULES
        ],
    }


def _coerce(raw: str) -> Any:
    """Dynaconf-style scalar coercion: bool/int/float/JSON, else string."""
    low = raw.strip().lower()
    if low in ("true", "false"):
        return low == "true"
    for cast in (int, float):
        try:
            return cast(raw)
        except ValueError:
            pass
    if raw[:1] in "[{\"":
        try:
            return json.loads(raw)
        except ValueError:
            pass
    return raw


def _resolve_key(node: Mapping[str, Any], part: str) -> str:
    """Match an env path segment against a dict's existing keys the way
    Dynaconf does — case-insensitively — plus an ``_``→``-`` fold so keys
    like ``User-Agent`` (unreachable verbatim: env names cannot contain
    ``-``) can be set via ``SECRETSCRAPER_HEADERS__USER_AGENT``."""
    if part in node:
        return part
    fold = {k.lower(): k for k in node}
    low = part.lower()
    if low in fold:
        return fold[low]
    dashed = low.replace("_", "-")
    if dashed in fold:
        return fold[dashed]
    return part  # genuinely new key: keep the segment verbatim


def apply_env_overrides(
    settings: dict[str, Any], env: Mapping[str, str] | None = None
) -> dict[str, Any]:
    """Overlay ``SECRETSCRAPER_*`` variables (case-insensitive key match
    against existing settings at EVERY level; ``__`` descends into nested
    dicts, with ``_``→``-`` folding for header-style keys)."""
    env = os.environ if env is None else env
    lower_map = {k.lower(): k for k in settings}
    for name, raw in env.items():
        if not name.startswith(ENV_PREFIX):
            continue
        path = name[len(ENV_PREFIX):].split("__")
        key = lower_map.get(path[0].lower(), path[0].lower())
        if len(path) == 1:
            settings[key] = _coerce(raw)
        else:
            node = settings.setdefault(key, {})
            for part in path[1:-1]:
                if not isinstance(node, dict):
                    break
                node = node.setdefault(_resolve_key(node, part), {})
            if isinstance(node, dict):
                node[_resolve_key(node, path[-1])] = _coerce(raw)
    return settings


def load_settings(
    config_path: str | None = None, env: Mapping[str, str] | None = None
) -> dict[str, Any]:
    """defaults ◄ user YAML ◄ SECRETSCRAPER_* env (reference
    ``cmdline.py:143-152`` + ``config/__init__.py:23-33``)."""
    settings = default_settings()
    if config_path is not None:
        import yaml

        with open(config_path, "r", encoding="utf8") as f:
            user = yaml.safe_load(f) or {}
        if not isinstance(user, dict):
            raise ValueError(f"config file must be a YAML mapping: {config_path}")
        settings.update(user)  # top-level replacement = Dynaconf default
    return apply_env_overrides(settings, env)


def loaded_rules_from(settings: Mapping[str, Any]) -> dict[str, str]:
    """``loaded: true`` gate (reference ``util.py:22-41``)."""
    out: dict[str, str] = {}
    for rule in settings.get("rules", []):
        if rule.get("loaded") is True:
            out[rule.get("name")] = rule.get("regex")
    return out


def url_finder_rules_from(settings: Mapping[str, Any]) -> dict[str, str]:
    """urlFind + jsFind keyed ``urlFinder_{i}`` (reference
    ``facade.py:302-306``)."""
    pats = list(settings.get("urlFind", [])) + list(settings.get("jsFind", []))
    return {f"urlFinder_{i}": p for i, p in enumerate(pats)}


def crawl_config_from(settings: Mapping[str, Any]) -> CrawlConfig:
    """Project the merged settings onto the engine's CrawlConfig."""
    return CrawlConfig(
        max_depth=int(settings.get("max_depth", 1)),
        max_page_num=int(settings.get("max_page_num", 1000)),
        max_concurrent_per_domain=int(settings.get("max_concurrent_per_domain", 5)),
        min_request_interval=float(settings.get("min_request_interval", 0.2)),
        dangerous_paths=list(settings.get("dangerousPath", DANGEROUS_PATHS)),
    )
