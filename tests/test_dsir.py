"""DSIR importance-resampling tests (operators/dsir.py)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from secretscraper_spark.operators.dsir import (
    dsir_select,
    fit_log_ratio,
    hashed_gram_buckets,
    importance_weights,
)


def _phash(s: str, seed: int | None = None) -> int:
    if seed is not None:
        s = f"{s}\x01{seed}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gram_buckets_multiplicity_and_bigrams(spark):
    df = _docs(spark, [(1, "a b a"), (2, "solo"), (3, "")])
    out = [
        (r.doc_id, r.bucket)
        for r in hashed_gram_buckets(
            df, n_buckets=100, mode="portable", seed=11
        ).collect()
    ]
    exp = []
    for did, text in [(1, "a b a"), (2, "solo"), (3, "")]:
        for g in _grams(text):
            exp.append((did, _phash(g, 11) % 100))
    assert sorted(out) == sorted(exp)
    # doc 1: 3 unigrams + 2 bigrams; doc 2: 1; doc 3 (empty): 0
    assert len([x for x in out if x[0] == 1]) == 5


def _py_ratio(target_texts, raw_texts, n_buckets, seed):
    tc, rc = {}, {}
    for texts, c in [(target_texts, tc), (raw_texts, rc)]:
        for t in texts:
            for g in _grams(t):
                b = _phash(g, seed) % n_buckets
                c[b] = c.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    out = {}
    for b in set(tc) | set(rc):
        lr = math.log((tc.get(b, 0) + 1.0) / (tt + n_buckets)) - math.log(
            (rc.get(b, 0) + 1.0) / (rt + n_buckets)
        )
        out[b] = round(lr * 1e6)
    return out


def test_fit_log_ratio_matches_python(spark):
    target = ["apple pie", "apple tart apple"]
    raw = ["apple pie", "apple tart apple", "stock market crash", "market dip"]
    dim = fit_log_ratio(
        _docs(spark, list(enumerate(target))),
        _docs(spark, list(enumerate(raw))),
        n_buckets=50,
        mode="portable",
        seed=11,
    )
    got = {r.bucket: r.ratio_micro for r in dim.collect()}
    exp = _py_ratio(target, raw, 50, 11)
    assert got == exp


def test_importance_weights_sum_grams(spark):
    target = ["apple pie apple"]
    raw = ["apple pie apple", "stock market"]
    rawdf = _docs(spark, list(enumerate(raw)))
    dim = fit_log_ratio(
        _docs(spark, list(enumerate(target))), rawdf,
        n_buckets=50, mode="portable", seed=11,
    )
    w = {r.doc_id: r.logw_micro for r in importance_weights(
        rawdf, dim, n_buckets=50, mode="portable", seed=11
    ).collect()}
    ratios = _py_ratio(target, raw, 50, 11)
    for did, text in enumerate(raw):
        exp = sum(ratios[_phash(g, 11) % 50] for g in _grams(text))
        assert w[did] == exp
    # target-like doc outweighs off-target doc
    assert w[0] > w[1]


def test_dsir_select_prefers_target_like(spark):
    # 30 finance-ish docs, 30 recipe-ish docs; target = recipes
    raw_rows = [(i, "flour butter sugar bake oven") for i in range(30)] + [
        (100 + i, "stock bond yield market trade") for i in range(30)
    ]
    raw = _docs(spark, raw_rows)
    target = _docs(spark, [(0, "flour sugar oven bake"), (1, "butter flour")])
    dim = fit_log_ratio(target, raw, n_buckets=200, mode="portable", seed=11)
    w = importance_weights(raw, dim, n_buckets=200, mode="portable", seed=11)
    picked = {r.doc_id for r in dsir_select(w, k=20, mode="portable").collect()}
    assert len(picked) == 20
    # Gumbel noise is bounded here vs the huge weight gap: all picks recipes
    assert all(d < 100 for d in picked)


def test_dsir_select_deterministic(spark):
    raw = _docs(spark, [(i, f"w{i % 7} w{i % 3}") for i in range(40)])
    dim = fit_log_ratio(raw.filter("doc_id % 2 = 0"), raw,
                        n_buckets=64, mode="portable", seed=11)
    w = importance_weights(raw, dim, n_buckets=64, mode="portable", seed=11)
    a = [tuple(r) for r in dsir_select(w, k=10, mode="portable").collect()]
    b = [tuple(r) for r in dsir_select(w, k=10, mode="portable").collect()]
    assert a == b and len(a) == 10


def test_select_plan_is_top_k(spark):
    raw = _docs(spark, [(i, "x y") for i in range(10)])
    dim = fit_log_ratio(raw, raw, n_buckets=16, mode="portable", seed=11)
    w = importance_weights(raw, dim, n_buckets=16, mode="portable", seed=11)
    plan = (
        dsir_select(w, k=5, mode="portable")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
