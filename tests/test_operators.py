"""Tests for the training-data pipeline operators: dedup (exact, minhash
LSH, simhash), similarity (brute force + LSH), text stats, multimodal."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from secretscraper_spark.operators import dedup, imagecodec, multimodal, similarity
from secretscraper_spark.operators.textstats import (
    fingerprint,
    lang_id,
    quality_features,
    token_count,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
    (3, "el perro grande corre por la calle de la ciudad con el gato"),
    (4, "completely different content about spark query engines and shuffles"),
    (5, "another unrelated document mentioning joins aggregates and windows"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0].n_docs == 2 and groups[0].canonical_id == 0


def test_minhash_lsh_finds_near_dup(docs):
    sh = dedup.shingles(docs, "doc_id", "text", k=3)
    sig = dedup.minhash_signatures(sh, num_hashes=64)
    pairs = dedup.lsh_candidate_pairs(sig, num_hashes=64, bands=16)
    got = {(r.doc_a, r.doc_b): r.est_jaccard for r in pairs.collect()}
    assert (0, 1) in got and got[(0, 1)] == 1.0  # exact dup: all minhashes agree
    assert (0, 2) in got and got[(0, 2)] > 0.4   # near dup caught by banding
    assert (4, 5) not in got                      # unrelated docs not candidates


def test_ngram_jaccard_exact_verification(docs):
    sh = dedup.shingles(docs, "doc_id", "text", k=3)
    sig = dedup.minhash_signatures(sh, num_hashes=64)
    cand = dedup.lsh_candidate_pairs(sig, num_hashes=64, bands=16)
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in dedup.ngram_jaccard_pairs(sh, cand).collect()}
    assert exact[(0, 1)] == 1.0
    # est_jaccard should approximate exact jaccard for the near-dup pair
    est = {(r.doc_a, r.doc_b): r.est_jaccard for r in cand.collect()}
    assert abs(est[(0, 2)] - exact[(0, 2)]) < 0.25


def _sd_expected(vecs: dict[int, np.ndarray], threshold: float) -> dict[int, int]:
    """Independent union-find over the exact cosine graph."""
    parent = {i: i for i in vecs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(vecs)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            a, b = vecs[i], vecs[j]
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            if cos >= threshold:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_semantic_dedup_one_cell_matches_exact(spark):
    """n_centroids=1 ⇒ the exact all-pairs answer (what the oracle entry
    gates); compare clusters and keep flags against independent numpy
    union-find."""
    rng = np.random.default_rng(5)
    base = {k: rng.normal(size=8) for k in range(4)}
    vecs: dict[int, np.ndarray] = {}
    for i in range(16):
        v = base[i % 4] + rng.normal(scale=0.02 if i < 12 else 3.0, size=8)
        vecs[i] = v
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: (r.cluster, r.keep)
           for r in similarity.semantic_dedup(df, 0.95, n_centroids=1).collect()}
    expect = _sd_expected(vecs, 0.95)
    assert {i: c for i, (c, _) in got.items()} == expect
    assert all(k == (c == i) for i, (c, k) in got.items())
    assert len({c for c, _ in got.values()}) < 16  # clusters actually formed


def test_semantic_dedup_partitioned_finds_planted_dups(spark):
    """k>1: identical vectors always share a cell, so planted exact
    duplicates must cluster; every vec appears exactly once."""
    rng = np.random.default_rng(9)
    rows = []
    for i in range(20):
        v = rng.normal(size=6)
        rows.append((i, [float(x) for x in v]))
    rows.append((100, rows[3][1]))  # exact dup of 3
    rows.append((101, rows[7][1]))  # exact dup of 7
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: (r.cluster, r.keep)
           for r in similarity.semantic_dedup(df, 0.9999, n_centroids=4).collect()}
    assert len(out) == 22
    assert out[100] == (3, False) and out[3] == (3, True)
    assert out[101] == (7, False) and out[7] == (7, True)


def test_png_text_chunks_roundtrip():
    px = imagecodec.pixels_for(3, 8, 8)
    blob = imagecodec.encode_png(px, {"Comment": "hello there", "Author": "x y"})
    # encoder sorts by keyword; decoder preserves chunk order
    assert imagecodec.png_text_chunks(blob) == [
        ("Author", "x y"), ("Comment", "hello there"),
    ]
    np.testing.assert_array_equal(imagecodec.decode_png(blob), px)
    assert imagecodec.png_text_chunks(imagecodec.encode_png(px)) == []
    import pytest as _pytest

    with _pytest.raises(ValueError):
        imagecodec.png_text_chunks(b"not a png")


def test_png_duplicate_keyword_chunks_all_kept():
    """PNG 1.2 permits repeated tEXt keywords — every value must survive
    (a dict would keep only the last and miss planted secrets)."""
    import struct as _struct
    import zlib as _zlib

    px = imagecodec.pixels_for(3, 4, 4)
    blob = imagecodec.encode_png(px, {"Comment": "second"})
    payload = b"Comment\x00first '13012345678'"
    extra = (
        _struct.pack(">I", len(payload)) + b"tEXt" + payload
        + _struct.pack(">I", _zlib.crc32(b"tEXt" + payload) & 0xFFFFFFFF)
    )
    idat_at = blob.index(b"tEXt")  # splice BEFORE the existing chunk
    spliced = blob[:idat_at - 4] + extra + blob[idat_at - 4:]
    assert imagecodec.png_text_chunks(spliced) == [
        ("Comment", "first '13012345678'"), ("Comment", "second"),
    ]


def test_secrets_from_image_metadata(spark):
    """North-rule path: the SHIPPED secret rules over decoded PNG tEXt
    metadata — planted Phone and Swagger markers must surface; non-PNG,
    metadata-less, and corrupt payloads must contribute nothing."""
    px = imagecodec.pixels_for(1, 4, 4)
    rows = [
        ("img_0",
         imagecodec.encode_png(px, {
             "Comment": "call '13012345678' for access",
             "Software": "x/swagger-ui.html exporter",
         }), "png"),
        ("img_1", imagecodec.encode_png(px), "png"),
        ("img_2", b"\x89PNG garbage", "png"),
        ("img_3", imagecodec.encode_fake_jpeg(px), "jpeg"),
        ("img_4", None, "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    meta = multimodal.image_text_metadata(df).collect()
    assert {(r.image_id, r.key) for r in meta} == {("img_0", "Comment"), ("img_0", "Software")}
    # non-default column names must work (regression: closure read id_col
    # from the already-aliased batch)
    renamed = df.withColumnRenamed("image_id", "iid").withColumnRenamed("bytes", "payload")
    meta2 = multimodal.image_text_metadata(
        renamed, id_col="iid", bytes_col="payload"
    ).collect()
    assert {(r.image_id, r.key) for r in meta2} == {("img_0", "Comment"), ("img_0", "Software")}
    got = {(r.image_id, r.rule_name, r.match)
           for r in multimodal.secrets_from_image_metadata(df).collect()}
    assert ("img_0", "Phone", "13012345678") in got
    assert ("img_0", "Swagger", "swagger-ui.html") in got
    assert all(i == "img_0" for i, _, _ in got)


def test_hash_embed_matches_python(spark):
    """Portable-mode hash embedding ≡ an independent hashlib/python
    recompute (token split, seeded md5-prefix hash, [0,1) map, mean)."""
    import hashlib

    texts = ["The quick Brown fox", "  spaced   out  ", "one"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r.i: r.emb
        for r in df.select(
            "i", multimodal.hash_embed(F.col("text"), dim=4, mode="portable").alias("emb")
        ).collect()
    }

    def phash64(s: str, seed: int) -> int:
        return int(hashlib.md5((s + "\x01" + str(seed)).encode()).hexdigest()[:15], 16)

    for i, t in enumerate(texts):
        toks = [x for x in t.lower().split() if x]
        for j in range(4):
            vals = [(phash64(tok, j) % 1000) / 1000.0 for tok in toks]
            acc = 0.0
            for v in vals:
                acc += v
            assert got[i][j] == acc / max(len(toks), 1)


def test_alignment_gate_matches_numpy(spark):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(20):
        a = rng.normal(size=8).tolist()
        b = rng.normal(size=8).tolist()
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "i long, ea array<double>, eb array<double>")
    out = {r.i: (r.alignment, r.keep) for r in
           multimodal.alignment_gate(df, "ea", "eb", threshold=0.1).collect()}
    for i, a, b in rows:
        a, b = np.array(a), np.array(b)
        cos = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 3)
        assert abs(out[i][0] - cos) < 1e-9
        assert out[i][1] == (cos >= 0.1)
    # a prior gate's verdict must not be silently clobbered
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already exists"):
        multimodal.alignment_gate(
            df.withColumn("keep", F.lit(True)), "ea", "eb", 0.1
        )


def test_source_reputation_hand_computed(spark):
    from secretscraper_spark.operators.textstats import (
        gate_by_reputation,
        source_reputation,
    )

    rows = [
        (0, "hello world foo", "A"),
        (1, "spark query engine", "A"),
        (2, "buy now!!!", "B"),
        (3, "buy now!!!", "B"),
        (4, "buy now!!!", "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rep = {r.source: r for r in source_reputation(df).collect()}
    a, b = rep["A"], rep["B"]
    assert (a.n_docs, a.n_unique_fp, a.dup_frac) == (2, 2, 0.0)
    assert a.rep_score == round(6 / 33, 6)
    assert (b.n_docs, b.n_unique_fp) == (3, 1)
    assert b.dup_frac == round(2 / 3, 6)
    # (tokens/chars) * (1 - punct/chars) * (1 - dup) = 0.2 * 0.7 * 1/3
    assert b.rep_score == round((6 / 30) * (1 - 9 / 30) * (1 - (1 - 1 / 3)), 6)
    kept = gate_by_reputation(df, source_reputation(df), min_score=0.1)
    assert {r.doc_id for r in kept.collect()} == {0, 1}
    # the dim side must broadcast — the corpus scan never shuffles
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        kept.explain()
    assert "BroadcastHashJoin" in buf.getvalue()


def test_incremental_lsh_matches_full_self_join(docs):
    """Incremental (batch vs index) candidates must equal the full
    self-join's pairs restricted to pairs touching the batch, with the
    batch doc in the doc_new slot — and must emit no index-index pairs."""
    new_ids = {1, 2}
    sh = dedup.shingles(docs, "doc_id", "text", k=3)
    sig = dedup.minhash_signatures(sh, num_hashes=64)
    full = dedup.lsh_candidate_pairs(sig, num_hashes=64, bands=16).collect()
    expect = {}
    for r in full:
        in_a, in_b = r.doc_a in new_ids, r.doc_b in new_ids
        if not (in_a or in_b):
            continue
        if in_a and in_b:
            expect[(r.doc_a, r.doc_b)] = ("new", r.est_jaccard)
        elif in_a:
            expect[(r.doc_a, r.doc_b)] = ("index", r.est_jaccard)
        else:
            expect[(r.doc_b, r.doc_a)] = ("index", r.est_jaccard)
    new_sig = sig.filter(F.col("doc_id").isin(list(new_ids)))
    idx_sig = sig.filter(~F.col("doc_id").isin(list(new_ids)))
    inc = dedup.incremental_lsh_pairs(new_sig, idx_sig, num_hashes=64, bands=16)
    got = {
        (r.doc_new, r.doc_match): (r.match_side, r.est_jaccard)
        for r in inc.collect()
    }
    assert got == expect
    assert expect  # the fixture guarantees cross and within-batch pairs


def test_incremental_keep_ids(docs):
    """Doc 1 (exact dup of index doc 0) is dropped; doc 2's fate depends on
    the threshold: at 0.95 its near-dup links fall away and it is kept."""
    new_ids = [1, 2]
    sh = dedup.shingles(docs, "doc_id", "text", k=3)
    sig = dedup.minhash_signatures(sh, num_hashes=64)
    new_sig = sig.filter(F.col("doc_id").isin(new_ids))
    idx_sig = sig.filter(~F.col("doc_id").isin(new_ids))
    pairs = dedup.incremental_lsh_pairs(new_sig, idx_sig, num_hashes=64, bands=16)
    kept_strict = {r.doc_id for r in dedup.incremental_keep_ids(new_sig, pairs, 0.95).collect()}
    assert kept_strict == {2}
    est = {(r.doc_new, r.doc_match): r.est_jaccard for r in pairs.collect()}
    lo = min(est[(2, 0)], est[(1, 2)])
    kept_loose = {r.doc_id for r in dedup.incremental_keep_ids(new_sig, pairs, lo).collect()}
    assert kept_loose == set()


def test_simhash_near_dups(docs):
    sim = dedup.simhash64(docs, "doc_id", "text")
    rows = {r.doc_id: r.simhash for r in sim.collect()}
    assert rows[0] == rows[1]  # identical text → identical simhash
    pairs = dedup.simhash_near_dups(sim, max_hamming=10).collect()
    keys = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 1) in keys


def test_repetition_features(spark):
    from secretscraper_spark.operators.textstats import repetition_features

    df = spark.createDataFrame(
        [
            (1, "a a a a"),                  # 4 words, 1 distinct, all dup
            (2, "one two three four"),       # no repetition
            (3, "x y x z"),                  # x twice
            (4, "   "),                      # no words -> no row
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_features(df).collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[1].n_words, rows[1].distinct_word_frac,
            rows[1].top_word_frac, rows[1].dup_word_frac) == (4, 0.25, 1.0, 1.0)
    assert (rows[2].distinct_word_frac, rows[2].top_word_frac,
            rows[2].dup_word_frac) == (1.0, 0.25, 0.0)
    assert (rows[3].n_words, rows[3].distinct_word_frac,
            rows[3].top_word_frac, rows[3].dup_word_frac) == (4, 0.75, 0.5, 0.5)


def test_bigram_lm_scores(spark):
    import math
    from collections import Counter

    from secretscraper_spark.operators.textstats import bigram_lm_scores

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the cat"),
        (3, "zq zq zq"),            # repetitive gibberish
        (4, "single"),              # <2 tokens -> no row
        (5, "  "),                  # no tokens -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # independent python reference (add-k bigram LM, self-trained)
    k = 0.5
    toks = {i: t.lower().split() for i, t in rows}
    uni = Counter(w for ws in toks.values() for w in ws)
    bigs = Counter(
        (ws[i], ws[i + 1]) for ws in toks.values() for i in range(len(ws) - 1)
    )
    v = len(uni)

    def ref(ws):
        lps = [
            math.log((bigs[(a, b)] + k) / (uni[a] + k * v))
            for a, b in zip(ws, ws[1:])
        ]
        return round(sum(lps) / len(lps), 6)

    got = {r.doc_id: r for r in bigram_lm_scores(df, k=k).collect()}
    assert set(got) == {1, 2, 3}
    for i in (1, 2, 3):
        assert got[i].n_bigrams == len(toks[i]) - 1
        assert got[i].avg_logprob == pytest.approx(ref(toks[i]), abs=1e-6)
        # ppl is round-6 of exp(-rounded avg): tolerance is the rounding
        # granularity, not float ulp
        assert got[i].ppl == pytest.approx(
            math.exp(-got[i].avg_logprob), abs=1e-6
        )
    # scoring against an external model corpus: unseen bigrams get the
    # smoothed floor, so a disjoint-vocabulary doc scores strictly worse
    model = spark.createDataFrame(rows[:2], "doc_id long, text string")
    ext = {r.doc_id: r for r in bigram_lm_scores(df, k=k, model_df=model).collect()}
    assert ext[3].avg_logprob < ext[1].avg_logprob


def test_epoch_mix(spark):
    from secretscraper_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, "books" if i % 2 == 0 else "web") for i in range(200)],
        "doc_id long, source string",
    )
    out = sampling.epoch_mix(
        df, "source", {"books": 2.5, "web": 0.0}, key_col="doc_id"
    ).collect()
    per = {}
    for r in out:
        assert r.source == "books"          # web weight 0 -> dropped
        per.setdefault(r.doc_id, []).append(r.copy)
    # every books row appears floor(2.5)=2 or 3 times, copies 1..n dense
    assert set(per) == {i for i in range(200) if i % 2 == 0}
    counts = {len(v) for v in per.values()}
    assert counts <= {2, 3} and counts == {2, 3}  # both arms hit at n=100
    for v in per.values():
        assert sorted(v) == list(range(1, len(v) + 1))
    # ~half the keys get the extra epoch (hash-fraction 0.5); generous band
    n3 = sum(1 for v in per.values() if len(v) == 3)
    assert 25 <= n3 <= 75
    # deterministic under rerun
    again = sampling.epoch_mix(
        df, "source", {"books": 2.5, "web": 0.0}, key_col="doc_id"
    ).collect()
    assert sorted((r.doc_id, r.copy) for r in again) == sorted(
        (r.doc_id, r.copy) for r in out
    )
    # weight 1.0 (default) = identity with copy=1
    ident = sampling.epoch_mix(df, "source", {}, key_col="doc_id").collect()
    assert len(ident) == 200 and all(r.copy == 1 for r in ident)


def test_dedup_lines(spark):
    df = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nreal content one\nFOOTER"),
            (2, "COOKIE BANNER\nreal content two\nFOOTER"),
            (3, "unique doc\nwith no shared lines"),
            (4, "COOKIE BANNER\nFOOTER"),          # all lines boilerplate
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dedup.dedup_lines(df, min_df=2).collect()}
    assert got[1].text == "real content one" and got[1].n_removed == 2
    assert got[2].text == "real content two" and (got[2].n_lines, got[2].n_removed) == (3, 2)
    assert got[3].text == "unique doc\nwith no shared lines" and got[3].n_removed == 0
    assert got[4].text == "" and (got[4].n_lines, got[4].n_removed) == (2, 2)
    # duplicate lines WITHIN one doc don't count toward min_df (distinct docs)
    solo = spark.createDataFrame(
        [(1, "same\nsame\nother"), (2, "different\nstuff")],
        "doc_id long, text string",
    )
    got2 = {r.doc_id: r.text for r in dedup.dedup_lines(solo, min_df=2).collect()}
    assert got2[1] == "same\nsame\nother"


def test_redact_text(spark):
    from secretscraper_spark.config import loaded_rules
    from secretscraper_spark.operators.textstats import redact_text

    df = spark.createDataFrame(
        [(1, "call 555 then see secret 7 stuff"), (2, "no digits here")],
        "doc_id long, text string",
    )
    pats = {"num": r"[0-9]+", "sword": r"\b(s[a-z]+)\b"}
    got = {r.doc_id: r.red
           for r in df.select("doc_id",
                              redact_text(F.col("text"), pats).alias("red")
                              ).collect()}
    assert got[1] == "call [NUM] then [SWORD] [SWORD] [NUM] [SWORD]"
    assert got[2] == "no digits here"

    # the shipped secret rules run through the same path: a 32-char quoted
    # token (the 'Suspicious API Key' rule's shape) gets masked
    key = "1234567890abcdefghijklmnopqrstuv"
    txt = f'x = "{key}"; y = 2'
    row = spark.createDataFrame([(1, txt)], "doc_id long, text string").select(
        redact_text(F.col("text"), loaded_rules()).alias("red")
    ).first()
    assert key not in row.red and "[SUSPICIOUS API KEY]" in row.red


def test_contamination_pairs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),       # leaks bench 100
            (2, "zeta eta theta iota kappa"),            # clean
            (3, "common words here alpha beta gamma"),   # 1 shared shingle
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon extra")],
        "doc_id long, text string",
    )
    hits = {(r.doc_id, r.bench_id): r.n_shared
            for r in dedup.contamination_pairs(corpus, bench, k=3,
                                               min_overlap=2).collect()}
    # doc 1 shares shingles 'alpha beta gamma', 'beta gamma delta',
    # 'gamma delta epsilon' (3); doc 3 only 'alpha beta gamma' (1 < 2)
    assert hits == {(1, 100): 3}
    all_hits = {(r.doc_id, r.bench_id): r.n_shared
                for r in dedup.contamination_pairs(corpus, bench, k=3,
                                                   min_overlap=1).collect()}
    assert all_hits == {(1, 100): 3, (3, 100): 1}
    # max_df drops benchmark shingles common across bench items
    bench2 = bench.union(spark.createDataFrame(
        [(101, "alpha beta gamma unrelated tail words")],
        "doc_id long, text string",
    ))
    capped = {(r.doc_id, r.bench_id): r.n_shared
              for r in dedup.contamination_pairs(
                  corpus, bench2, k=3, min_overlap=1, max_df=1).collect()}
    # 'alpha beta gamma' appears in both bench items -> dropped by max_df=1
    assert capped == {(1, 100): 2}


def test_weighted_sample_matches_python_reference(spark):
    """A-ES exactness in portable hash mode against an independent python
    implementation of the same draw (md5-prefix hash -> u -> u^(1/w),
    top-k with id tiebreak); zero/negative/NULL weights excluded."""
    import hashlib

    from secretscraper_spark.operators import sampling

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(200)]
    rows += [(900, 0.0), (901, -2.0), (902, None)]
    df = spark.createDataFrame(rows, "doc_id long, quality double")

    def pref(i, seed=3):
        h = int(
            hashlib.md5(f"{i}\x01{seed}".encode()).hexdigest()[:15], 16
        )
        return (h % (1 << 31) + 1) / float(1 << 31)

    want = sorted(
        ((pref(i) ** (1.0 / w), i, w) for i, w in rows if w and w > 0),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = sampling.weighted_sample(
        df, 10, "quality", "doc_id", hash_mode="portable", seed=3,
        round_to=None,
    ).collect()
    assert [(r.id, r.weight) for r in got] == [(i, w) for _, i, w in want]
    for r, (key, _, _) in zip(got, want):
        assert r.sample_key == pytest.approx(key, abs=1e-12)


def test_weighted_sample_plan_is_topk_no_shuffle(spark):
    """The A-ES top-k compiles to TakeOrderedAndProject over the scan —
    per-partition top-k + k-row driver merge, never a corpus sort or
    shuffle (the documented 100 TB shape)."""
    from secretscraper_spark.operators import sampling

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).cast("double").alias("q")
    )
    out = sampling.weighted_sample(df, 5, "q", "doc_id", round_to=None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_weighted_sample_weight_dominance(spark):
    """A row whose weight dwarfs everything else is effectively always
    selected (u^(1/w) -> 1 as w -> inf), regardless of its hash draw."""
    from secretscraper_spark.operators import sampling

    rows = [(i, 1e-6) for i in range(500)] + [(999, 1e9)]
    df = spark.createDataFrame(rows, "doc_id long, quality double")
    got = {r.id for r in sampling.weighted_sample(df, 5, "quality", "doc_id").collect()}
    assert 999 in got
    with pytest.raises(ValueError, match="k >= 1"):
        sampling.weighted_sample(df, 0, "quality", "doc_id")


def test_assign_split_properties(spark):
    from secretscraper_spark.operators import sampling

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = sampling.assign_split(
        df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {r.split: r.cnt for r in
              out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {"train", "val", "test"}          # exhaustive
    assert sum(counts.values()) == 2000                      # disjoint
    assert 0.75 <= counts["train"] / 2000 <= 0.85            # ≈ weights
    # deterministic & partition-independent: same assignment after shuffle
    again = sampling.assign_split(
        df.repartition(13), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in again.collect()}
    assert a == b
    # a different seed reshuffles membership
    seeded = sampling.assign_split(
        df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=1
    )
    c = {r.doc_id: r.split for r in seeded.collect()}
    assert c != a
    with pytest.raises(ValueError):
        sampling.assign_split(df, "doc_id", {"train": 0.5, "val": 0.1})


def test_stratified_sample_and_group_cap(spark):
    from secretscraper_spark.operators import sampling

    rows = [(i, ["en", "fr"][i % 2], f"src{i % 5}") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    kept = sampling.stratified_sample(
        df, "lang", {"en": 0.25}, key_col="doc_id"
    )
    by_lang = {r.lang: r.cnt for r in
               kept.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert by_lang["fr"] == 500                       # unlisted stratum intact
    assert 75 <= by_lang["en"] <= 175                 # ≈ 25% of 500
    # survivors are a subset chosen by key hash: rerun identical
    k2 = sampling.stratified_sample(
        df.repartition(7), "lang", {"en": 0.25}, key_col="doc_id"
    )
    assert {r.doc_id for r in kept.collect()} == {r.doc_id for r in k2.collect()}

    capped = sampling.cap_per_group(df, "source", 30, key_col="doc_id")
    per_src = {r.source: r.cnt for r in
               capped.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert all(v == 30 for v in per_src.values())     # every group at quota
    c2 = sampling.cap_per_group(df.repartition(11), "source", 30, key_col="doc_id")
    assert {r.doc_id for r in capped.collect()} == {r.doc_id for r in c2.collect()}


def test_connected_components_known_graph(spark):
    pairs = spark.createDataFrame(
        # chain 1-2-3-4, isolated pair (10,11), pair given in both orders
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "doc_a long, doc_b long",
    )
    cc = {r.doc_id: r.component_id
          for r in dedup.connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}
    # refusing a silently-unconverged result: a 9-hop chain cannot finish
    # in 3 min-propagation rounds
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iter=3)


def test_connected_components_matches_union_find(spark):
    rng = np.random.default_rng(3)
    edges = {tuple(sorted(p)) for p in rng.integers(0, 60, size=(50, 2))
             if p[0] != p[1]}
    parent = list(range(60))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    # union-find roots are component minima only after path compression to
    # the true min — recompute each node's component min explicitly
    comp_min: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    expected = {n: comp_min[find(n)] for n in nodes}

    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in sorted(edges)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.component_id
           for r in dedup.connected_components(pairs).collect()}
    assert got == expected


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[0]]
    got = [r.vec_id for r in similarity.cosine_topk(df, q, k=5).collect()]
    sims = (vecs @ vecs[0]) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    expected = list(np.argsort(-sims)[:5])
    assert got == expected
    assert got[0] == 0  # self is nearest


def test_rp_lsh_topk_recall(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[3]]
    planes = similarity.make_planes(16, n_planes=8, seed=42)
    exact = {r.vec_id for r in similarity.cosine_topk(df, q, k=5).collect()}
    approx = {r.vec_id for r in similarity.rp_lsh_topk(df, q, planes, k=5, probe_hamming=1).collect()}
    assert 3 in approx                       # finds the identical vector
    assert len(exact & approx) >= 2          # reasonable recall with 1-probe


def test_textstats(spark):
    df = spark.createDataFrame(
        [(0, "the cat and the dog, of course!"), (1, "el perro y la calle de que")],
        "doc_id long, text string",
    )
    feats = quality_features(df).collect()
    f0 = [r for r in feats if r.doc_id == 0][0]
    assert f0.n_tokens == 7
    assert f0.n_punct == 2  # comma + bang
    assert f0.en_stopwords == 4  # the, and, the, of
    langs = {r.doc_id: r.lang for r in df.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert langs[0] == "en" and langs[1] == "es"
    fps = df.select(fingerprint(F.col("text")).alias("fp")).collect()
    assert all(len(r.fp) == 32 for r in fps)


def test_token_count_empty(spark):
    df = spark.createDataFrame([("",), ("a b",)], "text string")
    got = [r.n for r in df.select(token_count(F.col("text")).alias("n")).collect()]
    assert got == [1, 2]  # split('', ' ') → [''] — matches DuckDB string_split


def test_imagecodec_roundtrip():
    px = imagecodec.pixels_for(99, 32, 16)
    assert imagecodec.decode_png(imagecodec.encode_png(px)).tobytes() == px.tobytes()
    lossy = imagecodec.decode_fake_jpeg(imagecodec.encode_fake_jpeg(px))
    p = imagecodec.psnr(px, lossy)
    assert 40.0 <= p < 60.0  # lossy but above the 40 dB invariant


def test_verify_pixels_invariant(spark):
    from secretscraper_spark.sources.sitegen import SEED, generate_pages_pandas

    pdf = generate_pages_pandas(30, 4, include_images=True)
    pages = spark.createDataFrame(pdf)
    res = multimodal.verify_pixels(pages, SEED).collect()
    assert len(res) == 30
    assert all(r.pixels_ok for r in res)
    assert all(r.phash_ok for r in res)
    pngs = [r for r in res if r.fmt == "png"]
    jpgs = [r for r in res if r.fmt == "jpeg"]
    assert pngs and all(r.psnr_db >= 1e8 for r in pngs)   # lossless → inf (capped)
    assert jpgs and all(40.0 <= r.psnr_db < 60.0 for r in jpgs)


def _block_image(seed: int, w: int = 32, h: int = 32) -> np.ndarray:
    """Image whose 8×8 block means sit ≥27 away from the global mean (half
    the blocks in [0,100], half in [155,255]) so small pixel noise cannot
    flip a phash bit — structured like real photos, unlike uniform noise."""
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 101, size=(8, 8))
    high = rng.random((8, 8)) < 0.5
    blocks = np.where(high, vals + 155, vals)
    px = np.repeat(np.repeat(blocks, h // 8, axis=0), w // 8, axis=1)
    return np.stack([px] * 3, axis=2).astype(np.uint8)


def test_phash_near_dups_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    imgs: dict[str, np.ndarray] = {}
    for i in range(8):
        imgs[f"img_{i}"] = _block_image(i)
    # planted near-dups: tiny pixel noise on two of the bases
    for i in (0, 3):
        base = imgs[f"img_{i}"].astype(np.int16)
        noisy = np.clip(base + rng.integers(-2, 3, size=base.shape), 0, 255)
        imgs[f"img_{i}_noisy"] = noisy.astype(np.uint8)
    hashes = {k: imagecodec.phash64(v) for k, v in imgs.items()}
    ids = sorted(hashes)
    # mask to 64 bits: phashes are signed int64 and bin() of a negative
    # xor counts the bits of the absolute value, not the two's-complement
    # pattern Spark's bit_count sees
    expected = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    assert ("img_0", "img_0_noisy") in expected
    assert ("img_3", "img_3_noisy") in expected

    pages = spark.createDataFrame(
        [(k, v) for k, v in hashes.items()], "image_id string, phash long"
    )
    got = {
        (r.image_a, r.image_b)
        for r in multimodal.phash_near_dups(pages, max_hamming=3).collect()
    }
    assert got == expected

    # hot-block skew guard: 20 placeholder images sharing ONE phash form a
    # degenerate bucket; max_block_df drops it, the real pairs survive
    blanks = [(f"blank_{i}", hashes["img_5"] ^ 0) for i in range(20)]
    all_pages = pages.union(
        spark.createDataFrame(blanks, "image_id string, phash long")
    )
    capped = {
        (r.image_a, r.image_b)
        for r in multimodal.phash_near_dups(
            all_pages, max_hamming=3, max_block_df=5
        ).collect()
    }
    assert not any(a.startswith("blank") and b.startswith("blank") for a, b in capped)
    assert expected - capped == set()  # pairs not touching the hot value survive


def test_image_features(spark):
    from secretscraper_spark.sources.sitegen import generate_pages_pandas

    pages = spark.createDataFrame(generate_pages_pandas(10, 4, include_images=True))
    feats = multimodal.image_features(pages).collect()
    assert len(feats) == 10
    for r in feats:
        assert 100.0 < r.mean_r < 160.0  # uniform-random pixels ≈ 127.5


def test_exact_jaccard_pairs_vs_bruteforce(docs):
    sh = dedup.shingles(docs, "doc_id", "text", k=3)
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in dedup.exact_jaccard_pairs(sh, min_jaccard=0.0).collect()}

    def pysh(text, k=3):
        toks = text.lower().split()
        return {" ".join(toks[i:i + k]) for i in range(max(len(toks) - k, 0) + 1)}

    sets = {i: pysh(t) for i, t in DOCS}
    for (a, b), j in got.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert abs(j - inter / union) < 1e-6, (a, b)  # operator rounds to 6dp
    assert got[(0, 1)] == 1.0
    # pairs sharing no shingle are absent (inverted index emits only overlaps)
    assert (3, 4) not in got


def test_exact_jaccard_max_df_guard(docs):
    sh = dedup.shingles(docs, "doc_id", "text", k=3)
    capped = dedup.exact_jaccard_pairs(sh, min_jaccard=0.0, max_df=1).collect()
    assert capped == []  # every shared shingle has df>=2, all dropped


def _neardup_fixture(spark, n=40, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs[7] = vecs[3] + 0.01 * rng.standard_normal(dim).astype(np.float32)  # plant a near dup
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    return df, sims


def test_cosine_neardup_pairs_exact_vs_numpy(spark):
    df, sims = _neardup_fixture(spark)
    got = {(r.vec_a, r.vec_b): r.cosine
           for r in similarity.cosine_neardup_pairs_exact(df, threshold=0.9).collect()}
    expected = {(a, b) for a in range(40) for b in range(a + 1, 40) if sims[a, b] >= 0.9}
    assert set(got) == expected
    assert (3, 7) in got and got[(3, 7)] > 0.99


def test_cosine_neardup_exact_row_guard(spark):
    df, _ = _neardup_fixture(spark)
    with pytest.raises(ValueError, match="max_rows"):
        similarity.cosine_neardup_pairs_exact(df, threshold=0.9, max_rows=10)


def test_cosine_neardup_banded_exhaustive_equals_exact(spark):
    """band_bits=0 (one shared bucket) makes the banded operator's
    candidate set provably all pairs — the q_embedding_neardup oracle
    contract — through the equi-join machinery, with NO CartesianProduct
    or nested-loop join in the plan."""
    df, sims = _neardup_fixture(spark)
    banded = similarity.cosine_neardup_pairs(df, threshold=0.9, band_bits=0)
    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    got = {(r.vec_a, r.vec_b): r.cosine for r in banded.collect()}
    expected = {(a, b) for a in range(40) for b in range(a + 1, 40) if sims[a, b] >= 0.9}
    assert set(got) == expected


def test_cosine_neardup_banded_finds_planted_dup(spark):
    """Real banding (the production default): the planted cosine≈0.999
    pair must surface (per-pair miss probability ≲1e-5 at 8 bands × 8
    bits), every emitted pair must be a TRUE pair (exact verify — no
    false positives by construction), and the plan stays equi-join."""
    df, sims = _neardup_fixture(spark)
    banded = similarity.cosine_neardup_pairs(df, threshold=0.9)
    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    got = {(r.vec_a, r.vec_b): r.cosine for r in banded.collect()}
    expected = {(a, b) for a in range(40) for b in range(a + 1, 40) if sims[a, b] >= 0.9}
    assert (3, 7) in got and got[(3, 7)] > 0.99
    assert set(got) <= expected  # verify step admits no false positives


def test_cosine_neardup_banded_max_bucket_cap(spark):
    """max_bucket drops hotter-than-cap buckets: with a cap of 1 no
    bucket can pair anything — empty output, not an explosion."""
    df, _ = _neardup_fixture(spark)
    capped = similarity.cosine_neardup_pairs(df, threshold=0.9, max_bucket=1)
    assert capped.count() == 0


def test_ivf_full_probe_equals_bruteforce(spark):
    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((120, 12)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[9]]
    cents = similarity.ivf_centroids(df, n_centroids=4, iters=1)
    assert len(cents) == 4 and all(len(v) == 12 for _, v in cents)
    exact = [r.vec_id for r in similarity.cosine_topk(df, q, k=5).collect()]
    full = [r.vec_id for r in similarity.ivf_topk(df, q, cents, k=5, n_probe=4).collect()]
    assert full == exact  # probing every cell = brute force
    partial = {r.vec_id for r in similarity.ivf_topk(df, q, cents, k=5, n_probe=1).collect()}
    assert 9 in partial  # query's own cell always probed first


def test_ivf_assign_is_nearest(spark):
    rng = np.random.default_rng(17)
    vecs = rng.standard_normal((30, 6)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    cents = [(0, [1.0] * 6), (1, [-1.0] * 6)]
    got = {r.vec_id: r.centroid_id for r in similarity.ivf_assign(df, cents).collect()}
    for i in range(30):
        d0 = float(((vecs[i] - 1.0) ** 2).sum())
        d1 = float(((vecs[i] + 1.0) ** 2).sum())
        assert got[i] == (0 if d0 <= d1 else 1)


def test_resize_images(spark):
    from secretscraper_spark.operators.imagecodec import decode_image, pixels_for
    from secretscraper_spark.sources.sitegen import SEED, generate_pages_pandas

    pages = spark.createDataFrame(generate_pages_pandas(8, 4, include_images=True))
    out = {r.image_id: r for r in multimodal.resize_images(pages, 16, 16).collect()}
    assert len(out) == 8
    for i in range(8):
        r = out[f"img_{i:08d}"]
        assert (r.w, r.h) == (16, 16)
        px = decode_image(bytes(r.bytes), r.fmt)
        assert px.shape == (16, 16, 3)
        # nearest-neighbor invariant: every resized pixel exists in the source
        src = pixels_for(SEED + i, *_wh(i))
        if r.fmt == "png":  # lossless round-trip: compare exact gather
            yi = (np.arange(16) * src.shape[0] // 16)
            xi = (np.arange(16) * src.shape[1] // 16)
            assert (px == src[yi[:, None], xi[None, :], :]).all()


def _wh(i):
    sizes = [32, 64, 128]
    return sizes[i % 3], sizes[(i // 3) % 3]


def test_verify_resized_gate_has_teeth(spark):
    """verify_resized (the q_image_resize value gate) must pass on the
    production resize output and FAIL loudly on corrupted outputs — a
    wrong gather index (pixel corruption) flips resize_ok, a wrong phash
    flips phash_ok."""
    from pyspark.sql import functions as F

    from secretscraper_spark.sources.sitegen import SEED, generate_pages_pandas

    pages = spark.createDataFrame(generate_pages_pandas(8, 4, include_images=True))
    resized = multimodal.resize_images(pages, 16, 16).localCheckpoint()
    ok = multimodal.verify_resized(pages, resized, 16, 16, seed_base=SEED)
    rows = ok.collect()
    assert len(rows) == 8
    assert all(r.resize_ok and r.phash_ok for r in rows)
    assert all((r.dec_w, r.dec_h) == (16, 16) for r in rows)
    # corrupt the phash column → every phash_ok goes false, pixels untouched
    bad_phash = resized.withColumn(
        "phash", F.col("phash").bitwiseXOR(F.lit((1 << 40) - 1))
    )
    got = multimodal.verify_resized(pages, bad_phash, 16, 16, seed_base=SEED).collect()
    assert all(not r.phash_ok for r in got)
    assert all(r.resize_ok for r in got)
    # corrupt the bytes (swap rows' payloads pairwise) → resize_ok false
    swapped = resized.withColumn(
        "__i", F.expr("cast(substring(image_id, 5) as int)")
    )
    partner = swapped.select(
        F.col("__i").alias("__j"), F.col("bytes").alias("other_bytes"),
        F.col("fmt").alias("other_fmt"),
    )
    bad_bytes = (
        swapped.join(
            partner,
            swapped["__i"].bitwiseXOR(F.lit(1)) == partner["__j"],
        )
        # keep same-fmt pairs only (png↔png, jpeg↔jpeg is impossible under
        # xor-1 parity flip, so these are cross-fmt swaps; decode follows
        # the fmt column, so feed it the partner's fmt too)
        .select(
            "image_id", F.col("other_bytes").alias("bytes"),
            F.col("other_fmt").alias("fmt"), "phash",
        )
    )
    got2 = multimodal.verify_resized(pages, bad_bytes, 16, 16, seed_base=SEED).collect()
    assert got2 and all(not r.resize_ok for r in got2)


def test_bpe_token_count(spark):
    from secretscraper_spark.operators.textstats import bpe_token_count

    df = spark.createDataFrame(
        [(0, "hello world42, don't!"), (1, ""), (2, "a-b c")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n for r in df.select(
        "doc_id", bpe_token_count(F.col("text")).alias("n")).collect()}
    # hello|world|42|,|don|'|t|! = 8 ; "" = 0 ; a|-|b|c = 4
    assert got == {0: 8, 1: 0, 2: 4}


def test_pages_io_roundtrip(spark, tmp_path):
    from secretscraper_spark.sources.pages_io import read_pages, write_pages
    from secretscraper_spark.sources.sitegen import generate_pages_pandas

    pdf = generate_pages_pandas(12, 4, include_images=True)
    pages = spark.createDataFrame(pdf)
    for fmt in ("parquet", "json", "csv"):
        p = str(tmp_path / f"pages_{fmt}")
        write_pages(pages, p, fmt)
        back = read_pages(spark, p, fmt)
        assert back.schema == pages.schema or [f.name for f in back.schema.fields] == [
            f.name for f in pages.schema.fields
        ]
        a = {r.image_id: (bytes(r.bytes), r.caption, r.phash) for r in back.collect()}
        b = {r.image_id: (bytes(r.bytes), r.caption, r.phash) for r in pages.collect()}
        assert a == b, fmt


def test_pages_io_roundtrip_no_images(spark, tmp_path):
    """NULL bytes (pages generated without images) must round-trip as NULL
    through the text formats, not collapse to b'' (ADVICE r01)."""
    from secretscraper_spark.sources.pages_io import read_pages, write_pages
    from secretscraper_spark.sources.sitegen import generate_pages_pandas

    pdf = generate_pages_pandas(12, 4, include_images=False)
    # no-image pages carry NULL binary (sitegen's pandas path emits b"" only
    # because all-None columns defeat createDataFrame type inference)
    pages = spark.createDataFrame(pdf).withColumn(
        "bytes", F.lit(None).cast("binary")
    )
    assert pages.filter(F.col("bytes").isNull()).count() == 12
    for fmt in ("parquet", "json", "csv"):
        p = str(tmp_path / f"pages_ni_{fmt}")
        write_pages(pages, p, fmt)
        back = read_pages(spark, p, fmt)
        rows = back.collect()
        assert all(r.bytes is None for r in rows), fmt
        a = {r.image_id: (r.caption, r.phash) for r in rows}
        b = {r.image_id: (r.caption, r.phash) for r in pages.collect()}
        assert a == b, fmt


def test_winnowing_fingerprints(spark):
    """Winnowing guarantees: shared substrings >= k+w-1 chars produce a
    shared fingerprint; verified against a pure-python reference."""
    from secretscraper_spark.operators.textstats import winnowing_fingerprints

    def py_winnow(text, k=8, w=4):
        import re as _re
        t = _re.sub(r"\s+", " ", text).lower()
        if len(t) < k:
            grams = [t]
        else:
            grams = [t[i:i + k] for i in range(len(t) - k + 1)]
        # xxhash64 unavailable in pure python — compare via Spark's own
        # hashes by round-tripping gram hashing through a tiny df
        gdf = spark.createDataFrame([(g,) for g in grams], "g string")
        hs = [r.h for r in gdf.select(F.xxhash64("g").alias("h")).collect()]
        wins = [min(hs[j:j + w]) for j in range(max(len(hs) - w, 0) + 1)]
        out, seen = [], set()
        for v in wins:
            if v not in seen:
                seen.add(v)
                out.append(v)
        return out

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "a completely different sentence with other words entirely"),
        (2, "prefix prefix the quick brown fox jumps over the lazy dog"),
        (3, "tiny"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: list(r.fp) for r in df.select(
        "doc_id", winnowing_fingerprints(F.col("text")).alias("fp")).collect()}
    for i, t in texts:
        assert got[i] == py_winnow(t), i
    # docs 0 and 2 share a long substring -> overlapping fingerprints
    assert set(got[0]) & set(got[2])
    # unrelated docs share nothing
    assert not (set(got[0]) & set(got[1]))


def _py_h60(s: str) -> int:
    """Python reference of dedup.portable_hash64 (md5-prefix 60-bit)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf8")).hexdigest()[:15], 16)


def test_portable_hash64_matches_python(spark):
    vals = ["hello", "a b c", "", "Wé üñí", "0"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r.h for r in df.select(dedup.portable_hash64("s").alias("h")).collect()]
    assert got == [_py_h60(v) for v in vals]
    seeded = [
        r.h
        for r in df.select(dedup.portable_hash64("s", seed=7).alias("h")).collect()
    ]
    assert seeded == [_py_h60(v + "\x01" + "7") for v in vals]


def _py_shingles(text: str, k: int = 3) -> list[str]:
    import re

    toks = re.split(r"\s+", text.lower())
    grams = [" ".join(toks[i:i + k]) for i in range(max(len(toks) - k, 0) + 1)]
    out, seen = [], set()
    for g in grams:
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def test_minhash_portable_matches_python(docs):
    sh = dedup.shingles(docs, "doc_id", "text", k=3)
    sig = {
        r.doc_id: (r.mh0, r.mh1, r.mh2, r.mh3)
        for r in dedup.minhash_signatures(sh, num_hashes=4, hash_mode="portable").collect()
    }
    for doc_id, text in DOCS:
        grams = _py_shingles(text)
        want = tuple(
            min(_py_h60(g + "\x01" + str(i)) for g in grams) for i in range(4)
        )
        assert sig[doc_id] == want, doc_id


def _py_simhash60(text: str) -> int:
    toks = [t for t in __import__("re").split(r"\s+", text.lower()) if t]
    hs = [_py_h60(t) for t in toks]
    sh = 0
    for j in range(60):
        v = sum(1 if (h >> j) & 1 else -1 for h in hs)
        if v > 0:
            sh |= 1 << j
    return sh


def test_simhash_catalyst_matches_python(docs):
    sim = dedup.simhash_catalyst(docs, "doc_id", "text", bits=60)
    got = {r.doc_id: r.simhash for r in sim.collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_simhash60(text), doc_id
    # identical docs collide; the 15-bit-block banding finds them
    assert got[0] == got[1]
    pairs = dedup.simhash_near_dups(sim, max_hamming=10, block_bits=15).collect()
    assert (0, 1) in {(r.doc_a, r.doc_b) for r in pairs}


def test_winnowing_portable_mode_matches_python(spark):
    """Portable-hash winnowing ≡ the same python reference with the
    md5-prefix hash (the xxhash64 mode is pinned in
    test_winnowing_fingerprints)."""
    from secretscraper_spark.operators.textstats import winnowing_fingerprints

    k, w = 8, 4
    texts = [(0, "the quick brown fox jumps over the lazy dog"), (1, "tiny")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: list(r.fp)
        for r in df.select(
            "doc_id",
            winnowing_fingerprints(F.col("text"), hash_mode="portable").alias("fp"),
        ).collect()
    }
    import re

    for doc_id, text in texts:
        t = re.sub(r"\s+", " ", text.lower())
        grams = [t] if len(t) < k else [t[i:i + k] for i in range(len(t) - k + 1)]
        hs = [_py_h60(g) for g in grams]
        wins = [min(hs[j:j + w]) for j in range(max(len(hs) - w, 0) + 1)]
        out, seen = [], set()
        for v in wins:
            if v not in seen:
                seen.add(v)
                out.append(v)
        assert got[doc_id] == out, doc_id


def test_normalize_text(spark):
    """Control-char strip + whitespace collapse + trim, hand-computed."""
    from secretscraper_spark.operators.textstats import normalize_text

    rows = [
        (0, "  hello\x00 world\x07!  "),
        (1, "tabs\tand\nnewlines\r\nhere"),
        (2, "vertical\x0btab\x0cformfeed"),
        (3, "already clean"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.norm
        for r in df.select(
            "doc_id", normalize_text(F.col("text")).alias("norm")
        ).collect()
    }
    assert got[0] == "hello world!"
    assert got[1] == "tabs and newlines here"
    # \x0b and \x0c are stripped as controls (not whitespace-collapsed)
    assert got[2] == "verticaltabformfeed"
    assert got[3] == "already clean"
    assert got[4] == ""


def test_vocab_table(spark):
    """tf/df counts vs a hand-computed vocabulary; min_df filter."""
    from secretscraper_spark.operators.textstats import vocab_table

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat"),
        (2, "a cat and a dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.word: (r.tf, r.df) for r in vocab_table(df, min_df=1).collect()
    }
    assert got["the"] == (3, 2)
    assert got["cat"] == (2, 2)
    assert got["sat"] == (2, 2)
    assert got["a"] == (2, 1)
    assert got["mat"] == (1, 1)
    high = {r.word for r in vocab_table(df, min_df=2).collect()}
    assert high == {"the", "cat", "sat", "dog"}


def test_tfidf_top_terms(spark):
    """Top-k terms per doc vs an independent python TF-IDF with the same
    smoothing and (rounded-score, term) tiebreak."""
    import math
    from collections import Counter

    from secretscraper_spark.operators.textstats import tfidf_top_terms

    rows = [
        (0, "spark spark shuffle join"),
        (1, "shuffle join join window"),
        (2, "spark window window window curious"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.doc_id, r.term, r.tf, r.score, r.rk)
        for r in tfidf_top_terms(df, k=2).orderBy("doc_id", "rk").collect()
    ]

    toks = {i: t.lower().split() for i, t in rows}
    dfreq = Counter()
    for ws in toks.values():
        dfreq.update(set(ws))
    n = len(rows)
    want = []
    for i in sorted(toks):
        tf = Counter(toks[i])
        scored = [
            (term, c, round(c * (math.log((n + 1) / (dfreq[term] + 1)) + 1), 6))
            for term, c in tf.items()
        ]
        scored.sort(key=lambda x: (-x[2], x[0]))
        for rk, (term, c, s) in enumerate(scored[:2], 1):
            want.append((i, term, c, s, rk))
    assert got == want


def test_filter_images(spark):
    """Every curation gate fires on its crafted row; keep-row passes."""
    from secretscraper_spark.operators.multimodal import filter_images

    rows = [
        # image_id, w, h, payload, caption
        ("ok", 200, 200, b"x" * 8000, "a fine photograph of a dog"),
        ("tiny", 16, 16, b"x" * 2000, "small but captioned image"),
        ("banner", 1000, 100, b"x" * 90000, "very wide banner strip"),
        ("blank", 400, 400, b"x" * 100, "solid color placeholder"),
        ("nocap", 300, 300, b"x" * 30000, "   "),
        ("nullcap", 300, 300, b"x" * 30000, None),
        ("multi", 8, 300, b"x" * 10, ""),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, bytes binary, caption string"
    )
    out = {
        r.image_id: (r.keep, r.reject_reason)
        for r in filter_images(df).collect()
    }
    assert out["ok"] == (True, None)
    assert out["tiny"] == (False, "small")
    assert out["banner"] == (False, "aspect")
    assert out["blank"] == (False, "low_bpp")
    assert out["nocap"] == (False, "caption")
    assert out["nullcap"] == (False, "caption")
    assert out["multi"] == (False, "small+aspect+low_bpp+caption")


# --- ExactSubstr-style duplicate spans --------------------------------------

SPAN_SHARED = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
SPAN_DOCS = [
    (0, f"unique zero opening words {SPAN_SHARED} and a unique zero tail"),
    (1, f"{SPAN_SHARED} then document one diverges with its own material"),
    (2, "entirely distinct text with no overlap against any other document here"),
    (3, f"padding up front {SPAN_SHARED} middle padding {SPAN_SHARED} rear pad"),
]


def _spans_bruteforce(docs, k, min_df):
    toks = {i: t.lower().split() for i, t in docs}
    where: dict[str, set[int]] = {}
    for i, tk in toks.items():
        for p in range(len(tk) - k + 1):
            where.setdefault(" ".join(tk[p : p + k]), set()).add(i)
    dup = {g for g, s in where.items() if len(s) >= min_df}
    out = set()
    for i, tk in toks.items():
        spans: list[list[int]] = []
        for p in range(len(tk) - k + 1):
            if " ".join(tk[p : p + k]) not in dup:
                continue
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k)
            else:
                spans.append([p, p + k])
        out |= {(i, s, e) for s, e in spans}
    return out


def test_duplicate_spans_matches_bruteforce(spark):
    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    for k in (4, 6):
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in dedup.duplicate_spans(df, k=k, min_df=2).collect()
        }
        assert got == _spans_bruteforce(SPAN_DOCS, k, 2)
    # the shared 10-token phrase is one maximal span per occurrence
    got4 = dedup.duplicate_spans(df, k=4, min_df=2)
    by_doc = {
        r.doc_id: (r.span_start, r.span_end)
        for r in got4.filter(F.col("doc_id").isin(0, 1)).collect()
    }
    assert by_doc[0] == (4, 14) and by_doc[1] == (0, 10)


def test_duplicate_spans_irregular_whitespace(spark):
    # leading/doubled whitespace must not shift token coordinates
    df = spark.createDataFrame(
        [(0, "  a b  c d e f tail0"), (1, "a b c\td e f tail1")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dedup.duplicate_spans(df, k=6, min_df=2).collect()
    }
    assert got == {(0, 0, 6), (1, 0, 6)}


def test_strip_spans_removes_marked_tokens(spark):
    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    spans = dedup.duplicate_spans(df, k=4, min_df=2)
    out = {r.doc_id: r for r in dedup.strip_spans(df, spans).collect()}
    shared = SPAN_SHARED.split()
    # doc 2 untouched (re-tokenized form)
    assert out[2].text == SPAN_DOCS[2][1] and out[2].n_removed == 0
    # doc 0: the shared phrase is gone, flanks remain in order
    assert out[0].text == "unique zero opening words and a unique zero tail"
    assert out[0].n_removed == len(shared)
    # doc 3 loses both occurrences
    assert out[3].text == "padding up front middle padding rear pad"
    assert out[3].n_removed == 2 * len(shared)
    for r in out.values():
        assert r.n_tokens == len(SPAN_DOCS[r.doc_id][1].split())


def test_duplicate_spans_max_gram_df_guard(spark):
    # a gram in EVERY doc is boilerplate; the guard drops it
    docs = [(i, f"common boiler plate text here unique{i} word{i}") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    all_spans = dedup.duplicate_spans(df, k=5, min_df=2)
    assert all_spans.count() == 5
    guarded = dedup.duplicate_spans(df, k=5, min_df=2, max_gram_df=4)
    assert guarded.count() == 0


# --- PageRank ---------------------------------------------------------------

def _pagerank_numpy(edges, n_iter, d=0.85):
    import numpy as np

    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    idx = {n: i for i, n in enumerate(nodes)}
    deg = {u: sum(1 for a, _ in e if a == u) for u, _ in e}
    r = np.ones(len(nodes))
    for _ in range(n_iter):
        nxt = np.full(len(nodes), 1.0 - d)
        for u, v in e:
            nxt[idx[v]] += d * r[idx[u]] / deg[u]
        r = nxt
    return {n: r[idx[n]] for n in nodes}


def test_pagerank_matches_numpy(spark):
    from secretscraper_spark.operators import graph

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (1, 2)]  # dup edge + dangling 4
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.pagerank for r in graph.pagerank(df, n_iter=12, round_to=None).collect()}
    want = _pagerank_numpy(edges, 12)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9
    # 3 receives from three sources -> highest rank; dangling 4 gets base only
    assert got[3] == max(got.values())
    assert abs(got[4] - 0.15) < 1e-12


def _trustrank_python(edges, seeds, n_iter, d=0.85):
    nodes = sorted({s for s, _ in edges} | {x for _, x in edges})
    e = sorted(set(edges))
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    tele = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    rank = dict(tele)
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for s, t in e:
            contrib[t] += rank[s] / deg[s]
        rank = {v: (1 - d) * tele[v] + d * contrib[v] for v in nodes}
    return rank


def test_trustrank_matches_python_reference(spark):
    from secretscraper_spark.operators import graph

    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (1, 4)]
    seeds = {1}
    df = spark.createDataFrame(edges, "src long, dst long")
    sd = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.trustrank
        for r in graph.trustrank(df, sd, n_iter=6, round_to=None).collect()
    }
    want = _trustrank_python(edges, seeds, 6)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # every node here is reachable from the seed -> strictly positive trust
    assert all(v > 0 for v in got.values())


def test_trustrank_empty_seeds_raises(spark):
    """An empty trusted-seed set would divide by zero per row under ANSI
    mode — reject it loudly instead."""
    from secretscraper_spark.operators import graph

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    none = spark.createDataFrame([], "node long")
    with pytest.raises(ValueError, match="non-empty seeds"):
        graph.trustrank(edges, none, n_iter=2)


def test_opic_empty_graph_returns_empty(spark):
    """A zero-edge graph yields an empty result, not an ANSI
    divide-by-zero at constant folding (1.0/0 nodes)."""
    from secretscraper_spark.operators import graph

    empty = spark.createDataFrame([], "src long, dst long")
    out = graph.opic_rounds(empty, n_rounds=2)
    assert out.columns == ["node", "cash", "history", "importance"]
    assert out.count() == 0


def test_trustrank_unreachable_island_scores_zero(spark):
    from secretscraper_spark.operators import graph

    # island {10,11} has no in-path from the seed: zero trust
    edges = [(1, 2), (2, 1), (10, 11), (11, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    sd = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.trustrank
        for r in graph.trustrank(df, sd, n_iter=8).collect()
    }
    assert got[10] == 0.0 and got[11] == 0.0
    assert got[1] > 0.0 and got[2] > 0.0


def _hits_python(edges, n_iter):
    import math

    nodes = sorted({s for s, _ in edges} | {x for _, x in edges})
    e = sorted(set(edges))
    hub = {v: 1.0 for v in nodes}
    auth = {v: 0.0 for v in nodes}
    for _ in range(n_iter):
        auth = {v: 0.0 for v in nodes}
        for s, t in e:
            auth[t] += hub[s]
        nrm = math.sqrt(sum(a * a for a in auth.values()))
        if nrm > 0:
            auth = {v: a / nrm for v, a in auth.items()}
        hub = {v: 0.0 for v in nodes}
        for s, t in e:
            hub[s] += auth[t]
        nrm = math.sqrt(sum(h * h for h in hub.values()))
        if nrm > 0:
            hub = {v: h / nrm for v, h in hub.items()}
    return hub, auth


def test_hits_matches_python_reference(spark):
    from secretscraper_spark.operators import graph

    edges = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.hub, r.authority)
        for r in graph.hits(df, n_iter=3, round_to=None).collect()
    }
    hub, auth = _hits_python(edges, 3)
    assert set(got) == set(hub)
    for v in hub:
        assert got[v][0] == pytest.approx(hub[v], abs=1e-12)
        assert got[v][1] == pytest.approx(auth[v], abs=1e-12)
    # 3 has three distinct in-links -> top authority; 1 links to 2,3 -> top hub
    assert max(got, key=lambda v: got[v][1]) == 3
    assert max(got, key=lambda v: got[v][0]) == 1


def _opic_python(edges, n_rounds):
    """Straight-line OPIC reference: synchronous rounds, dangling cash to
    the virtual root, redistributed uniformly."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out = {}
    for s, d in set(edges):
        out.setdefault(s, set()).add(d)
    n = len(nodes)
    cash = {v: 1.0 / n for v in nodes}
    hist = {v: 0.0 for v in nodes}
    for _ in range(n_rounds):
        recv = {v: 0.0 for v in nodes}
        dang = 0.0
        for v in nodes:
            if v in out:
                share = cash[v] / len(out[v])
                for d in out[v]:
                    recv[d] += share
            else:
                dang += cash[v]
        for v in nodes:
            hist[v] += cash[v]
            cash[v] = recv[v] + dang / n
    return {v: (cash[v], hist[v]) for v in nodes}


def test_opic_matches_python_reference(spark):
    from secretscraper_spark.operators import graph

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (1, 2)]  # dup + dangling 4
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.cash, r.history, r.importance)
        for r in graph.opic_rounds(df, n_rounds=4, round_to=None).collect()
    }
    want = _opic_python(edges, 4)
    assert set(got) == set(want)
    for v, (c, h) in want.items():
        assert got[v][0] == pytest.approx(c, abs=1e-12)
        assert got[v][1] == pytest.approx(h, abs=1e-12)
        assert got[v][2] == pytest.approx(c + h, abs=1e-12)
    # conservation: cash sums to 1, history to rounds_run
    assert sum(c for c, _, _ in got.values()) == pytest.approx(1.0, abs=1e-12)
    assert sum(h for _, h, _ in got.values()) == pytest.approx(4.0, abs=1e-12)
    # node 3 receives from three in-links -> most important
    assert max(got, key=lambda v: got[v][2]) == 3


def test_opic_all_dangling_uniform(spark):
    """A graph whose only edges lead to sinks: dangling cash cycles through
    the virtual root and stays uniform in the limit symmetry case."""
    from secretscraper_spark.operators import graph

    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {
        r.node: (r.cash, r.history)
        for r in graph.opic_rounds(df, n_rounds=3, round_to=6).collect()
    }
    # perfectly symmetric 2-cycle: cash stays 0.5/0.5, history accumulates
    assert got[1] == (0.5, 1.5) and got[2] == (0.5, 1.5)


def test_pagerank_star_graph_known_values(spark):
    from secretscraper_spark.operators import graph

    # hub <- spokes: closed form after 1 iter from uniform init
    edges = [(i, 0) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.pagerank for r in graph.pagerank(df, n_iter=1, round_to=6).collect()}
    assert got[0] == pytest.approx(0.15 + 0.85 * 4, abs=1e-6)
    for i in range(1, 5):
        assert got[i] == pytest.approx(0.15, abs=1e-6)


def test_duplicate_spans_hash_join_matches_exact(spark):
    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    exact = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dedup.duplicate_spans(df, k=4, min_df=2).collect()
    }
    hashed = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dedup.duplicate_spans(df, k=4, min_df=2, join_on_hash=True).collect()
    }
    assert hashed == exact


# --- Gopher-style quality gate ----------------------------------------------

def test_quality_gate_each_gate_fires(spark):
    from secretscraper_spark.operators.textstats import quality_gate

    rows = [
        ("keep", "the quick brown fox jumps over the lazy dog today"),
        ("short", "tiny text"),
        ("wordlen", "a b c d e f"),
        ("symbols", "@@@@ #### $$$$ %%%% ^^^^ the end"),
        ("stopless", "zebra yonder xylophone wombat velvet umbrella"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r.doc_id: r for r in quality_gate(df, id_col="doc_id").collect()}

    assert out["keep"].keep and out["keep"].reject_reason == "-"
    assert out["keep"].n_tokens == 10
    assert out["keep"].mean_word_len == 4.0

    assert not out["short"].keep
    assert out["short"].reject_reason == "short+stopwords"

    assert not out["wordlen"].keep
    assert out["wordlen"].reject_reason == "word_len"  # 'a' is a stopword hit

    assert not out["symbols"].keep
    assert out["symbols"].reject_reason == "symbols"
    assert out["symbols"].symbol_ratio == 0.625

    assert not out["stopless"].keep
    assert out["stopless"].reject_reason == "stopwords"


def test_quality_gate_long_and_empty(spark):
    from secretscraper_spark.operators.textstats import quality_gate

    df = spark.createDataFrame(
        [("long", "the of and to a " * 4), ("empty", "")],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in quality_gate(df, id_col="doc_id", max_tokens=8).collect()}
    assert out["long"].n_tokens == 20 and "long" in out["long"].reject_reason
    e = out["empty"]
    assert e.n_tokens == 0 and not e.keep
    assert e.mean_word_len == 0.0 and e.reject_reason == "short+word_len+stopwords"


def test_host_pagerank_collapses_urls(spark):
    from secretscraper_spark.operators import graph

    edges = spark.createDataFrame(
        [
            ("http://a.ex/1", "http://b.ex/x", "url"),
            ("http://a.ex/2", "http://b.ex/y", "url"),   # same host pair
            ("http://b.ex/x", "http://c.ex/z", "url"),
            ("http://c.ex/z", "http://a.ex/1", "url"),
            ("http://a.ex/1", "http://a.ex/3", "url"),   # intra-host: dropped
        ],
        "parent_norm string, child_norm string, kind string",
    )
    got = {r.host: r.pagerank for r in graph.host_pagerank(edges, n_iter=8).collect()}
    want = _pagerank_numpy([("a", "b"), ("b", "c"), ("c", "a")], 8)
    assert set(got) == {"a.ex", "b.ex", "c.ex"}
    for h, n in (("a.ex", "a"), ("b.ex", "b"), ("c.ex", "c")):
        assert abs(got[h] - round(want[n], 6)) < 1e-6


def test_prioritize_frontier_orders_by_score(spark):
    from secretscraper_spark.operators import graph

    frontier = spark.createDataFrame(
        [(f"http://h{i % 3}.ex/p{i}", f"h{i % 3}.ex", i) for i in range(12)],
        "url_norm string, netloc string, discovery_seq long",
    )
    scores = spark.createDataFrame(
        [("h0.ex", 0.5), ("h2.ex", 3.0)], "host string, pagerank double"
    )
    out = graph.prioritize_frontier(frontier, scores)
    rows = out.collect()
    assert len(rows) == 12
    got = {r.url_norm: r.priority for r in rows}
    assert got["http://h2.ex/p2"] == 3.0
    assert got["http://h0.ex/p0"] == 0.5
    assert got["http://h1.ex/p1"] == 0.0  # unknown host -> default
    # within every partition: non-increasing priority, seq ascending inside ties
    for part in out.rdd.glom().collect():
        keys = [(-r.priority, r.discovery_seq) for r in part]
        assert keys == sorted(keys)


def test_canonical_by_quality(spark):
    comps = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 200), (5, 200), (9, 300)],
        "doc_id long, component_id long",
    )
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.1), (9, 0.7)],
        "doc_id long, score double",
    )
    got = {
        r.component_id: (r.canonical_id, r.n_docs)
        for r in dedup.canonical_by_quality(comps, scores).collect()
    }
    assert got[100] == (2, 3)  # score tie 2 vs 3 -> smallest id
    assert got[200] == (4, 2)  # tie at 0.1 -> smallest id
    assert got[300] == (9, 1)  # singleton cluster


def test_bm25_search_matches_python(spark):
    """BM25 top-k vs an independent python implementation with the same
    rounding contract (idf→6dp, fixed-point contribution sum)."""
    import math
    from collections import Counter

    from secretscraper_spark.operators.retrieval import bm25_search

    rows = [
        (0, "spark shuffle join broadcast join"),
        (1, "shuffle shuffle window state"),
        (2, "broadcast hash join probe side"),
        (3, "window window window function"),
        (4, "arrow batch python worker"),
    ]
    qrows = [(100, "broadcast join"), (101, "window shuffle"), (102, "zebra")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = spark.createDataFrame(qrows, "query_id long, qtext string")

    got = [
        (r.query_id, r.doc_id, r.score, r.rk)
        for r in bm25_search(docs, queries, top_k=3)
        .orderBy("query_id", "rk")
        .collect()
    ]

    k1, b = 1.2, 0.75
    toks = {i: t.lower().split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(ws) for ws in toks.values()) / n
    dfreq = Counter()
    for ws in toks.values():
        dfreq.update(set(ws))
    want = []
    for qid, qt in qrows:
        per_doc = {}
        for i, ws in toks.items():
            tf = Counter(ws)
            c = 0
            for term in set(qt.lower().split()):
                if term not in tf:
                    continue
                idf = round(
                    math.log(1 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5)), 6
                )
                tfnorm = (tf[term] * (k1 + 1)) / (
                    tf[term] + k1 * (1 - b + b * len(ws) / avgdl)
                )
                c += int(round(idf * tfnorm * 1_000_000, 0))
            if c:
                per_doc[i] = c
        ranked = sorted(per_doc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rk, (i, c) in enumerate(ranked, 1):
            want.append((qid, i, c / 1_000_000, rk))
    assert got == want
    assert not any(g[0] == 102 for g in got)  # no-match query yields no rows


def test_bm25_search_deterministic_and_capped(spark):
    """Rankings are partition-layout independent; max_df drops stopword-
    grade terms from scoring entirely."""
    from secretscraper_spark.operators.retrieval import bm25_search

    rows = [(i, f"common term{i % 7} term{i % 3} tail{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "common term2"), (1, "tail5 common")], "query_id long, qtext string"
    )
    base = [
        tuple(r)
        for r in bm25_search(docs, queries, top_k=5)
        .orderBy("query_id", "rk")
        .collect()
    ]
    shuffled = [
        tuple(r)
        for r in bm25_search(docs.repartition(7), queries.repartition(3), top_k=5)
        .orderBy("query_id", "rk")
        .collect()
    ]
    assert base == shuffled

    # 'common' appears in every doc; with max_df=20 it stops contributing,
    # so the 'tail5 common' query matches exactly one doc (tail5).
    capped = bm25_search(docs, queries, top_k=5, max_df=20)
    got = [(r.query_id, r.doc_id) for r in capped.filter("query_id = 1").collect()]
    assert got == [(1, 5)]


def test_quantize_matches_numpy(spark):
    """SQ8 codes and reconstruction error vs an independent numpy
    implementation; codes are partition-layout independent."""
    import numpy as np

    from secretscraper_spark.operators import quantize as qz

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((20, 6)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    mins, maxs = qz.dim_stats(df)
    assert mins == [float(x) for x in vecs.min(axis=0)]
    assert maxs == [float(x) for x in vecs.max(axis=0)]

    got = {
        r.vec_id: r.codes
        for r in qz.quantize_embeddings(df, mins, maxs).collect()
    }
    steps = [(mx - mn) / 255 if mx > mn else 1.0 for mn, mx in zip(mins, maxs)]
    for i, v in enumerate(vecs):
        want = [
            min(max(int(np.round((float(x) - mn) / st)), 0), 255)
            for x, mn, st in zip(v, mins, steps)
        ]
        assert got[i] == want, i

    # reconstruction error bounded by half a quantization step per dim
    deq = df.select(
        "vec_id",
        qz.dequantize_expr(
            qz.quantize_expr(F.col("embedding"), mins, maxs), mins, maxs
        ).alias("deq"),
    )
    for r in deq.collect():
        for x, xr, st in zip(vecs[r.vec_id], r.deq, steps):
            assert abs(float(x) - xr) <= st / 2 + 1e-9

    shuffled = {
        r.vec_id: r.codes
        for r in qz.quantize_embeddings(df.repartition(5), mins, maxs).collect()
    }
    assert shuffled == got


def test_quantized_ann_full_refine_equals_bruteforce(spark):
    """With refine covering the whole corpus the asymmetric path re-ranks
    every row exactly — equal to brute-force cosine_topk, scores included.
    With a small refine, the top hit on well-separated data survives."""
    import numpy as np

    from secretscraper_spark.operators import quantize as qz
    from secretscraper_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    qv = [float(x) for x in vecs[3]]
    mins, maxs = qz.dim_stats(df)

    full = [
        (r.vec_id, r.cosine)
        for r in qz.quantized_cosine_topk(
            df, qv, mins, maxs, k=5, refine=12
        ).collect()
    ]
    brute = [(r.vec_id, r.cosine) for r in cosine_topk(df, qv, k=5).collect()]
    assert full == brute

    narrow = qz.quantized_cosine_topk(df, qv, mins, maxs, k=3, refine=2)
    assert narrow.first().vec_id == 3  # the query vector itself survives


def test_hard_negatives_excludes_positives_and_renumbers(spark):
    """Positives vanish from the negative set; neg_rank renumbers the
    survivors contiguously; skip_top drops the best negatives."""
    from secretscraper_spark.operators.retrieval import (
        bm25_search,
        hard_negatives,
    )

    rows = [
        (0, "broadcast join broadcast join"),
        (1, "broadcast join hash probe"),
        (2, "broadcast join shuffle"),
        (3, "broadcast side table"),
        (4, "join order"),
        (5, "arrow python worker"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(100, "broadcast join")], "query_id long, qtext string"
    )
    full = [
        (r.doc_id, r.rk)
        for r in bm25_search(docs, queries, top_k=6)
        .orderBy("rk").collect()
    ]
    ranked_ids = [d for d, _ in full]
    # label the top-2 ranked docs positive
    pos = spark.createDataFrame(
        [(100, ranked_ids[0]), (100, ranked_ids[1])],
        "query_id long, doc_id long",
    )
    negs = [
        (r.doc_id, r.neg_rank)
        for r in hard_negatives(docs, queries, pos, top_k=2)
        .orderBy("neg_rank").collect()
    ]
    # negatives = next ranked docs after the positives, renumbered 1..2
    assert negs == [(ranked_ids[2], 1), (ranked_ids[3], 2)]

    skipped = [
        (r.doc_id, r.neg_rank)
        for r in hard_negatives(docs, queries, pos, top_k=2, skip_top=1)
        .orderBy("neg_rank").collect()
    ]
    assert skipped == [(ranked_ids[3], 2), (ranked_ids[4], 3)]


def test_hard_negatives_window_survives_positive_stuffing(spark):
    """Even when every top slot is a positive, the widened retrieval
    window still yields top_k negatives."""
    from secretscraper_spark.operators.retrieval import hard_negatives

    rows = [(i, "term " * (10 - i) + f"filler{i}") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(1, "term")], "query_id long, qtext string"
    )
    pos = spark.createDataFrame(
        [(1, 0), (1, 1), (1, 2)], "query_id long, doc_id long"
    )
    out = hard_negatives(docs, queries, pos, top_k=3).collect()
    assert len(out) == 3
    assert {r.doc_id for r in out}.isdisjoint({0, 1, 2})


def test_crossmodal_near_dups_joint_gates(spark):
    """Pairs must pass BOTH the phash hamming gate and the caption
    jaccard gate; each gate alone is insufficient."""
    from secretscraper_spark.operators.multimodal import crossmodal_near_dups

    rows = [
        (0, 0x0, "red cat sits on mat"),
        (1, 0x1, "red cat sits on mat"),      # near 0 visually + textually
        (2, 0x3, "totally unrelated words entirely"),  # near visually only
        (3, 0x00FF00FF00FF00FF, "red cat sits on mat"),  # textual only
        (4, 0x2, "red cat sits on rug"),      # near visually, jaccard 0.5
    ]
    pages = spark.createDataFrame(
        rows, "image_id long, phash long, caption string"
    )
    out = {
        (r.image_a, r.image_b): (r.hamming, r.jaccard)
        for r in crossmodal_near_dups(
            pages, max_hamming=2, min_caption_jaccard=0.4
        ).collect()
    }
    # captions "…mat" vs "…rug" share 2 of 4 distinct 3-shingles -> 0.5
    assert out == {
        (0, 1): (1, 1.0),
        (0, 4): (1, 0.5),
        (1, 4): (2, 0.5),
    }


def test_crossmodal_short_captions_score_zero_not_dropped(spark):
    """A phash-candidate pair whose captions are shorter than shingle_k
    (or share no shingle) must appear with jaccard 0 under threshold
    0.0 — not silently vanish from the audit output."""
    from secretscraper_spark.operators.multimodal import crossmodal_near_dups

    rows = [
        (0, 0x0, "cat"),                      # < shingle_k tokens
        (1, 0x1, ""),                         # empty caption
        (2, 0x3, "totally different words here"),  # no shared shingle
    ]
    pages = spark.createDataFrame(
        rows, "image_id long, phash long, caption string"
    )
    out = {
        (r.image_a, r.image_b): (r.hamming, r.jaccard)
        for r in crossmodal_near_dups(
            pages, max_hamming=2, min_caption_jaccard=0.0
        ).collect()
    }
    assert out == {(0, 1): (1, 0.0), (0, 2): (2, 0.0), (1, 2): (1, 0.0)}
    # and the positive-threshold path still drops them
    from secretscraper_spark.operators.multimodal import crossmodal_near_dups as c2
    assert c2(pages, max_hamming=2, min_caption_jaccard=0.1).count() == 0


def test_token_budget_zero_budget_drops_zero_token_rows(spark):
    """A 0-budget source must drop ALL its rows — including n_tokens=0
    docs whose inclusive cum equals the prior prefix (0 at the head)."""
    from secretscraper_spark.operators import sampling

    df = spark.createDataFrame(
        [(1, "keep", 5), (2, "drop", 0), (3, "drop", 7), (4, "keep", 0)],
        "doc_id long, source string, n_tokens long",
    )
    out = sampling.token_budget_fill(
        df, "source", "n_tokens", "doc_id", {"keep": 100},
        mode="portable", default_budget=0,
    )
    assert sorted(r.doc_id for r in out.collect()) == [1, 4]


def test_curriculum_order_stages_and_interleave(spark):
    """Stages cut the score ranking into near-equal quarters; the
    training sequence walks stages in order; within a stage the order is
    the hash interleave, not the score order."""
    import hashlib

    from secretscraper_spark.operators.sampling import curriculum_order

    rows = [(i, "x" * (i + 1)) for i in range(20)]  # score = id + 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curriculum_order(
        df.withColumn("score", F.length("text")),
        "score", n_stages=4, mode="portable", seed=3,
    ).collect()
    by_id = {r.doc_id: r for r in out}
    # rank == doc_id here; stage = floor(rank*4/20)
    for i in range(20):
        assert by_id[i].stage == (i * 4) // 20, i
    # seq covers 0..19 exactly; stages appear in blocks
    seqs = sorted((r.curriculum_seq, r.stage) for r in out)
    assert [s for s, _ in seqs] == list(range(20))
    assert [st for _, st in seqs] == sorted(st for _, st in seqs)
    # within stage 0, order follows the portable hash of doc_id
    def h(i):
        return int(hashlib.md5(f"{i}\x013".encode()).hexdigest()[:15], 16) % 1_000_000

    stage0 = sorted(
        (r.curriculum_seq, r.doc_id) for r in out if r.stage == 0
    )
    assert [d for _, d in stage0] == sorted(range(5), key=lambda i: (h(i), i))


def test_curriculum_order_deterministic_under_repartition(spark):
    from pyspark.sql import functions as F

    from secretscraper_spark.operators.sampling import curriculum_order

    df = spark.createDataFrame(
        [(i, (i * 37) % 101) for i in range(50)], "doc_id long, score long"
    )
    a = sorted(tuple(r) for r in curriculum_order(df, "score", mode="portable").collect())
    b = sorted(
        tuple(r)
        for r in curriculum_order(df.repartition(7), "score", mode="portable").collect()
    )
    assert a == b


def test_grouped_quantiles_exact(spark):
    """Type-1 quantiles vs numpy's 'lower' interpolation, incl. ties,
    singleton groups, and duplicate q-targets."""
    import numpy as np

    from secretscraper_spark.operators.stats import grouped_quantiles

    rows = (
        [("a", v) for v in [5, 1, 9, 3, 3, 7, 2]]
        + [("b", v) for v in [10, 20]]
        + [("c", 42)]
    )
    df = spark.createDataFrame(rows, "src string, v long")
    got = {
        (r.group, r.q): r.value
        for r in grouped_quantiles(df, "src", "v", qs=(0.0, 0.25, 0.5, 1.0)).collect()
    }
    vals = {"a": [5, 1, 9, 3, 3, 7, 2], "b": [10, 20], "c": [42]}
    exp = {
        (g, q): int(np.quantile(np.array(v), q, method="lower"))
        for g, v in vals.items()
        for q in (0.0, 0.25, 0.5, 1.0)
    }
    assert got == exp
    # every (group, q) present exactly once
    assert len(grouped_quantiles(df, "src", "v", qs=(0.0, 0.25, 0.5, 1.0)).collect()) == 12


def test_script_profile_counts_and_dominant(spark):
    from secretscraper_spark.operators.textstats import (
        SCRIPT_RANGES,
        script_profile,
    )

    rows = [
        (0, "hello world"),                      # pure latin
        (1, "привет мир"),                       # cyrillic
        (2, "日本語のテキスト"),                   # cjk (kana + han)
        (3, "مرحبا بالعالم"),                     # arabic
        (4, "αβγ δε"),                            # greek
        (5, "नमस्ते दुनिया"),                      # devanagari
        (6, "hello мир mixed привет text"),       # latin-majority mix
        (7, "1234 .,!? \t"),                      # no script chars
        (8, "abcde абвгд"),                       # 5-5 tie -> latin (order)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in script_profile(df).collect()}

    def ref_counts(t):
        return {
            name: sum(
                1 for ch in t
                if any(lo <= ord(ch) <= hi for lo, hi in rng)
            )
            for name, rng in SCRIPT_RANGES.items()
        }

    for i, t in rows:
        want = ref_counts(t)
        for name, cnt in want.items():
            assert got[i][f"n_{name}"] == cnt, (i, name)
        best = max(want.values())
        if best == 0:
            assert got[i]["script"] == "unknown"
            assert got[i]["script_frac"] == 0.0
        else:
            winners = [n for n, c in want.items() if c == best]
            first = next(n for n in SCRIPT_RANGES if n in winners)
            assert got[i]["script"] == first, (i, winners)
            assert got[i]["script_frac"] == round(
                best / sum(want.values()), 6
            )


def test_char_entropy_matches_reference(spark):
    import math
    from collections import Counter

    from secretscraper_spark.operators.textstats import char_entropy

    rows = [
        (0, "aaaaaaaa"),                 # zero entropy
        (1, "abcdefgh"),                 # maximal for n=8: ln(8)
        (2, "hello world, hello"),
        (3, "日本語 mixed текст"),        # multi-byte chars count once each
        (4, ""),                         # no chars -> no row
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in char_entropy(df).collect()}
    assert 4 not in got
    for i, t in rows:
        if not t:
            continue
        counts = Counter(t)
        n = len(t)
        s_fp = sum(c * round(math.log(c) * 1e6) for c in counts.values())
        want = round(math.log(n) - s_fp / (n * 1e6), 6)
        assert got[i]["n_chars"] == n
        assert got[i]["n_distinct_chars"] == len(counts)
        assert got[i]["char_entropy"] == want, (i, got[i], want)
    assert got[0]["char_entropy"] == 0.0
    assert got[1]["char_entropy"] == round(math.log(8), 6)
    # partition-layout invariance (the fixed-point sum's whole point)
    again = {
        r["doc_id"]: r["char_entropy"]
        for r in char_entropy(df.repartition(7)).collect()
    }
    assert again == {k: v["char_entropy"] for k, v in got.items()}


def test_funnel_counts_chaining(spark):
    from pyspark.sql import functions as F

    from secretscraper_spark.operators.curation import funnel_counts

    rows = [(i, i % 2 == 0, i % 3 == 0, None if i == 6 else i < 8)
            for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "a", "b", "c"])
    out = funnel_counts(
        df,
        [
            ("a", F.col("a")),
            ("b", F.col("b")),
            ("c", F.coalesce(F.col("c"), F.lit(False))),
        ],
    ).collect()
    got = [(r["stage_idx"], r["stage"], r["n_in"], r["n_kept"]) for r in out]
    # a: evens -> 6; b: evens & %3 -> {0,6} -> 2; c: <8, 6 is NULL->False -> {0}
    assert got == [(0, "a", 12, 6), (1, "b", 6, 2), (2, "c", 2, 1)]
    # chaining invariant holds by construction
    for (_, _, n_in, _), (_, _, _, prev_kept) in zip(got[1:], got[:-1]):
        assert n_in == prev_kept


def test_ngram_repetition_matches_reference(spark):
    import re as _re
    from collections import Counter

    from secretscraper_spark.operators.textstats import ngram_repetition

    rows = [
        (0, "the cat sat on the cat sat on the cat"),
        (1, "a b a b a b a b"),
        (2, "all words unique here today friend"),
        (3, "x y"),                      # < n tokens -> no row
        (4, "Spam spam SPAM spam spam"),  # case folding
    ]
    n = 3
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in ngram_repetition(df, n=n).collect()}
    assert 3 not in got
    for i, t in rows:
        toks = [w for w in _re.split(r"[ \t\n\r\f]+", t.lower()) if w]
        if len(toks) < n:
            continue
        grams = [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)]
        c = Counter(grams)
        total = sum(len(w) for w in toks) + max(len(toks) - 1, 0)
        top_gram = min(c, key=lambda g: (-c[g], g))
        top_frac = round(c[top_gram] * len(top_gram) / total, 6)
        dup_frac = round(
            sum(k * len(g) for g, k in c.items() if k > 1) / total, 6
        )
        r = got[i]
        assert r["n_grams"] == len(grams)
        assert r["total_chars"] == total
        assert (r["top_gram"], r["top_cnt"]) == (top_gram, c[top_gram])
        assert r["top_frac"] == top_frac, (i, r, top_frac)
        assert r["dup_frac"] == dup_frac, (i, r, dup_frac)
    # sanity: templated doc scores high, unique doc scores 0 dup mass
    assert got[1]["dup_frac"] > 1.0  # overlapping counts can exceed 1
    assert got[2]["dup_frac"] == 0.0


def test_payload_entropy_matches_reference(spark):
    import math
    from collections import Counter

    from secretscraper_spark.operators.multimodal import payload_entropy

    rows = [
        ("a", bytes([0] * 64)),                    # solid -> 0 entropy
        ("b", bytes(range(256))),                  # uniform -> ln(256)
        ("c", b"\x89PNG\r\n\x1a\n" + bytes([7, 7, 9]) * 5),
        ("d", b""),                                # empty -> no row
        ("e", None),                               # NULL -> no row
    ]
    df = spark.createDataFrame(rows, ["image_id", "bytes"])
    got = {r["image_id"]: r.asDict() for r in payload_entropy(df).collect()}
    assert set(got) == {"a", "b", "c"}
    for iid, payload in rows:
        if not payload:
            continue
        counts = Counter(payload)
        n = len(payload)
        s_fp = sum(c * round(math.log(c) * 1e6) for c in counts.values())
        want = round(math.log(n) - s_fp / (n * 1e6), 6)
        r = got[iid]
        assert (r["n_bytes"], r["n_distinct_bytes"]) == (n, len(counts))
        assert r["byte_entropy"] == want, (iid, r, want)
    assert got["a"]["byte_entropy"] == 0.0
    assert got["b"]["byte_entropy"] == round(math.log(256), 6)
    # string stand-in column hexes its UTF-8 bytes (the oracle path)
    sdf = spark.createDataFrame([("s", "aab")], ["image_id", "bytes"])
    r = payload_entropy(sdf).head()
    assert (r["n_bytes"], r["n_distinct_bytes"]) == (3, 2)


def test_line_features_matches_reference(spark):
    import re as _re

    from secretscraper_spark.operators.textstats import line_features

    rows = [
        (0, "- one\n- two\n- three"),                      # bullet wall
        (1, "intro\nresult one...\nresult two…\nend"),     # ellipses
        (2, "a\n\n   \nb"),                                # blanks
        (3, "plain single line"),
        (4, "\t* starred\n  • dotted\nnormal... \nx"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in line_features(df).collect()}
    for i, t in rows:
        ls = t.split("\n")
        n = len(ls)
        want = {
            "n_lines": n,
            "bullet_frac": round(
                sum(bool(_re.match(r"^[ \t]*[-*•]", x)) for x in ls) / n, 6),
            "ellipsis_frac": round(
                sum(bool(_re.search(r"(\.\.\.|…)[ \t]*$", x)) for x in ls) / n, 6),
            "blank_frac": round(
                sum(bool(_re.match(r"^[ \t]*$", x)) for x in ls) / n, 6),
        }
        r = got[i]
        for k, v in want.items():
            assert r[k] == v, (i, k, r[k], v)
    assert got[0]["bullet_frac"] == 1.0
    assert got[1]["ellipsis_frac"] == 0.5
    assert got[2]["blank_frac"] == 0.5


def test_mirror_hosts_exact_jaccard(spark):
    from secretscraper_spark.operators.dedup import mirror_hosts

    # h1 {1,2,3,4}, h2 {3,4,5,6}, h3 {1,2,3,4} (full mirror of h1),
    # h4 {9} (disjoint); fp 3 appears on 3 hosts (max_df target)
    rows = [
        ("h1", 1), ("h1", 2), ("h1", 3), ("h1", 4),
        ("h2", 3), ("h2", 4), ("h2", 5), ("h2", 6),
        ("h3", 1), ("h3", 2), ("h3", 3), ("h3", 4),
        ("h4", 9),
        ("h1", 1),  # duplicate posting must collapse
    ]
    df = spark.createDataFrame(rows, ["host", "fpk"])
    got = {
        (r["host_a"], r["host_b"]): r.asDict()
        for r in mirror_hosts(
            df, host_col="host", fp_col="fpk", min_jaccard=0.0
        ).collect()
    }
    assert got[("h1", "h3")]["jaccard"] == 1.0
    assert got[("h1", "h2")]["jaccard"] == round(2 / 6, 6)
    assert got[("h2", "h3")]["jaccard"] == round(2 / 6, 6)
    assert ("h1", "h4") not in got  # zero intersection yields no row
    assert got[("h1", "h3")]["n_inter"] == 4
    # threshold filters
    hi = mirror_hosts(df, host_col="host", fp_col="fpk", min_jaccard=0.9)
    assert [(r["host_a"], r["host_b"]) for r in hi.collect()] == [("h1", "h3")]
    # max_df=2 drops fps 3 AND 4 (each on 3 hosts); sizes shrink with
    # the prune so jaccard stays exact over the pruned universe
    pruned = {
        (r["host_a"], r["host_b"]): r.asDict()
        for r in mirror_hosts(
            df, host_col="host", fp_col="fpk", min_jaccard=0.0, max_df=2
        ).collect()
    }
    assert pruned[("h1", "h3")]["jaccard"] == 1.0
    assert pruned[("h1", "h3")]["n_a"] == 2
    assert ("h1", "h2") not in pruned  # shared fps were all boilerplate


def test_html_to_text_extraction(spark):
    from pyspark.sql import functions as F

    from secretscraper_spark.operators.textstats import html_to_text

    cases = [
        ('<html><head><style>b{x}</style><script a="b">var x=1;'
         '</script></head><body><!-- c --><p>Hi &amp; bye &lt;3</p>'
         '</body></html>',
         'Hi & bye <3'),
        ('<div>multi\n  line\t text</div>', 'multi line text'),
        ('no markup at all', 'no markup at all'),
        ('&amp;lt; decodes once', '&lt; decodes once'),
        ('<SCRIPT>UPPER.case()</SCRIPT>kept', 'kept'),
        ('a&nbsp;b&quot;c&#39;d&gt;e', 'a b"c\'d>e'),
        ('<p class="x">attr</p><br/>tail', 'attr tail'),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], ["i", "html"]
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("html")).alias("t")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_canonical_url_rules(spark):
    from pyspark.sql import functions as F

    from secretscraper_spark.operators.urlnorm import canonical_url

    cases = [
        ("HTTP://Example.COM:80/Path?utm_source=tw&b=2&a=1#frag",
         "http://example.com/Path?a=1&b=2"),
        ("https://A.com:443/x", "https://a.com/x"),
        ("https://a.com:8443/x", "https://a.com:8443/x"),  # non-default kept
        ("http://a.com/x?fbclid=1&gclid=2&utm_medium=m&ref=z",
         "http://a.com/x"),
        ("http://a.com/x?ref=z&refresh=1",       # 'refresh' is NOT 'ref'
         "http://a.com/x?refresh=1"),
        ("http://a.com/x?", "http://a.com/x"),
        ("http://a.com", "http://a.com"),
        ("ftp://a.com/x?utm_source=1", "ftp://a.com/x?utm_source=1"),
        ("not a url", "not a url"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], ["i", "u"]
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("u")).alias("c")).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_token_budget_fill_matches_python(spark):
    import hashlib

    from secretscraper_spark.operators import sampling

    rows = [(i, f"src{i % 3}", 10 + (i * 7) % 40) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    budgets = {"src0": 900, "src1": 400}

    out = sampling.token_budget_fill(
        df, "source", "n_tokens", "doc_id", budgets,
        mode="portable", default_budget=250,
    )
    got = {r.doc_id: r.cum_tokens for r in out.collect()}

    # independent python recompute of the portable order + prefix fill
    def pbucket(key):
        return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) % 1_000_000

    expected = {}
    for src in ("src0", "src1", "src2"):
        budget = budgets.get(src, 250)
        cum = 0
        for doc_id, _, tok in sorted(
            (r for r in rows if r[1] == src), key=lambda r: (pbucket(r[0]), r[0])
        ):
            if cum + tok > budget:
                break
            cum += tok
            expected[doc_id] = cum
    assert got == expected
    assert expected  # the cut is non-trivial

    # physical knobs cannot move the answer: block count + partition layout
    for blocks, data in ((1, df), (64, df.repartition(13))):
        again = sampling.token_budget_fill(
            data, "source", "n_tokens", "doc_id", budgets,
            mode="portable", default_budget=250, n_blocks=blocks,
        )
        assert {r.doc_id: r.cum_tokens for r in again.collect()} == expected

    # default_budget=0 drops unlisted sources entirely
    only = sampling.token_budget_fill(
        df, "source", "n_tokens", "doc_id", budgets, mode="portable"
    )
    assert {r.source for r in only.collect()} == {"src0", "src1"}


def test_recall_at_k_matches_python(spark):
    from secretscraper_spark.operators.retrieval import recall_at_k

    results = spark.createDataFrame(
        # q1: 2 of its 3 gold docs retrieved; q2: 0 of 2; q3 not in gold
        [(1, 10), (1, 11), (1, 99), (2, 50), (3, 70)],
        "query_id long, doc_id long",
    )
    gold = spark.createDataFrame(
        # q4 has gold but NO result rows — must still appear with 0 hits
        [(1, 10), (1, 11), (1, 12), (2, 60), (2, 61), (4, 80)],
        "query_id long, doc_id long",
    )
    out = {r.query_id: (r.n_gold, r.n_results, r.n_hits, r.recall_micro)
           for r in recall_at_k(results, gold).collect()}
    assert out == {
        1: (3, 3, 2, 666666),
        2: (2, 1, 0, 0),
        4: (1, 0, 0, 0),
    }
    # denom='k' uses min(|gold|, |results|): q2's denominator becomes 1
    by_k = {r.query_id: r.recall_micro
            for r in recall_at_k(results, gold, denom="k").collect()}
    assert by_k == {1: 666666, 2: 0, 4: 0}


def test_pair_metrics_matches_python(spark):
    from secretscraper_spark.operators.dedup import pair_metrics

    # candidates: one reversed orientation + one duplicate row; 2 of 3
    # distinct claimed pairs are true, truth has 4 pairs total
    cand = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (5, 6)], "doc_a long, doc_b long"
    )
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (7, 8), (9, 10)], "doc_a long, doc_b long"
    )
    row = pair_metrics(cand, truth).collect()[0]
    assert (row.n_candidates, row.n_truth, row.n_hits) == (3, 4, 2)
    assert row.precision_micro == 2 * 1_000_000 // 3
    assert row.recall_micro == 2 * 1_000_000 // 4
    assert row.f1_micro == 2 * 2 * 1_000_000 // (3 + 4)

    # empty candidates: zero counts, all ratios 0 (no division blowup)
    empty = cand.filter(F.col("doc_a") < 0)
    row = pair_metrics(empty, truth).collect()[0]
    assert (row.n_candidates, row.n_hits, row.precision_micro,
            row.recall_micro, row.f1_micro) == (0, 0, 0, 0, 0)


def test_heavy_hitters_exact(spark):
    from secretscraper_spark.operators.stats import heavy_hitters

    rows = [(i, "h%d" % min(i % 10, 3)) for i in range(100)]
    # h0/h1/h2: 10 rows each; h3: 70 rows
    df = spark.createDataFrame(rows, "id long, host string")
    got = heavy_hitters(df, "host", top_n=3).collect()
    assert [(r.host, r.n_rows, r.share_micro) for r in got] == [
        ("h3", 70, 700000),
        ("h0", 10, 100000),  # tie with h1/h2 broken by key asc
        ("h1", 10, 100000),
    ]
    # partition layout cannot move the answer
    again = heavy_hitters(df.repartition(7), "host", top_n=3).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]


def test_shingles_empty_and_short_docs_emit_nothing(spark):
    from secretscraper_spark.operators.dedup import shingles

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two"), (4, "a b c d"), (5, "a b c e")],
        "doc_id long, text string",
    )
    got = shingles(df, "doc_id", "text", k=3).collect()
    # no degenerate '' shingle: empty/whitespace/short docs emit nothing,
    # so two empty docs can never pair at jaccard 1.0 downstream
    assert {r.doc_id for r in got} == {4, 5}
    assert all(r.shingle for r in got)


def test_canonical_by_quality_keeps_unscored_members(spark):
    from secretscraper_spark.operators.dedup import canonical_by_quality

    comps = spark.createDataFrame(
        [(10, 10), (11, 10), (20, 20), (21, 20)],
        "doc_id long, component_id long",
    )
    # component 10: only doc 11 scored -> it wins, n_docs still 2;
    # component 20: NO member scored -> lowest id wins, row still emitted
    scores = spark.createDataFrame([(11, 0.5)], "doc_id long, score double")
    got = {
        r.component_id: (r.canonical_id, r.n_docs)
        for r in canonical_by_quality(comps, scores).collect()
    }
    assert got == {10: (11, 2), 20: (20, 2)}


def test_rp_lsh_topk_probes_multi_bit_buckets(spark):
    import numpy as np

    from secretscraper_spark.operators.similarity import (
        make_planes,
        rp_lsh_topk,
    )

    planes = make_planes(4, 6)
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=4)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [float(x) for x in rng.normal(size=4)]
    # with probe_hamming = n_planes - 1... use 2: candidates must be a
    # superset of hamming<=1 probing (previously 2 silently behaved as 1)
    k1 = {r.vec_id for r in rp_lsh_topk(df, q, planes, k=64, probe_hamming=1).collect()}
    k2 = {r.vec_id for r in rp_lsh_topk(df, q, planes, k=64, probe_hamming=2).collect()}
    full = {r.vec_id for r in rp_lsh_topk(df, q, planes, k=64, probe_hamming=6).collect()}
    assert k1 <= k2 <= full
    assert k2 != k1 or k1 == full  # 2-bit probing actually widens (unless already exhaustive)
