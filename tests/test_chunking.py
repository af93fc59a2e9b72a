"""Chunking and sequence-packing tests (hand-computed + independent
python reimplementation)."""

from __future__ import annotations

import pytest

from secretscraper_spark.operators.chunking import chunk_documents, pack_sequences


def _chunks_py(text, chunk, overlap):
    toks = text.split()
    stride = chunk - overlap
    out = []
    for cid, s in enumerate(range(0, len(toks), stride)):
        win = toks[s : s + chunk]
        out.append((cid, " ".join(win), len(win)))
    return out


def test_chunk_documents_matches_python(spark):
    docs = [
        (0, "a b c d e f g h i j"),          # 10 tokens
        (1, "one two three"),                 # shorter than a chunk
        (2, ""),                              # empty -> no chunks
        (3, "  spaced   out  tokens  "),      # irregular whitespace
        (4, "CaseKept MiXeD"),                # case preserved
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for chunk, overlap in ((4, 0), (4, 1), (3, 2)):
        got = {
            (r.doc_id, r.chunk_id, r.chunk_text, r.n_chunk_tokens)
            for r in chunk_documents(
                df, chunk_tokens=chunk, overlap=overlap
            ).collect()
        }
        want = {
            (i, cid, txt, n)
            for i, t in docs
            for cid, txt, n in _chunks_py(t, chunk, overlap)
        }
        assert got == want, (chunk, overlap)


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_pack_sequences_contiguous_fill(spark):
    # source s1: docs 0..3 with 3,4,2,5 tokens; seq_len 6
    docs = [
        (0, "a a a", "s1"),
        (1, "b b b b", "s1"),
        (2, "c c", "s1"),
        (3, "d d d d d", "s1"),
        (10, "x x x x x x x", "s2"),  # 7 tokens: straddles, starts in pack 0
        (11, "y", "s2"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {
        r.doc_id: (r.group, r.n_tokens, r.pack_id, r.pack_offset)
        for r in pack_sequences(df, seq_len=6).collect()
    }
    # s1 prefix sums (exclusive): 0, 3, 7, 9
    assert got[0] == ("s1", 3, 0, 0)
    assert got[1] == ("s1", 4, 0, 3)
    assert got[2] == ("s1", 2, 1, 1)
    assert got[3] == ("s1", 5, 1, 3)
    # s2: doc 10 starts at 0 (pack 0); doc 11 starts at 7 -> pack 1 offset 1
    assert got[10] == ("s2", 7, 0, 0)
    assert got[11] == ("s2", 1, 1, 1)


def test_pack_sequences_deterministic_under_repartition(spark):
    docs = [(i, "t " * (i % 5 + 1), f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    a = {tuple(r) for r in pack_sequences(df, seq_len=8).collect()}
    b = {tuple(r) for r in pack_sequences(df.repartition(7), seq_len=8).collect()}
    assert a == b
