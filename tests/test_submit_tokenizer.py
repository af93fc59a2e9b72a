"""Smoke test for submit/tokenizer_job.py: BPE training runs in a fresh
process, writes the merge-table artifact, and the stats JSON is
self-consistent with a re-encode using that artifact."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb


def test_tokenizer_job_end_to_end(tmp_path):
    out = str(tmp_path / "merges")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [
            sys.executable, "submit/tokenizer_job.py",
            "--docs", "/root/testdata/sf0.001/documents.parquet",
            "--merges-out", out, "--n-merges", "32", "--batch-k", "8",
        ],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=480,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["n_merges"] == 32
    assert report["n_docs"] == 500
    # subword encoding always lies between 1 token/word and chars/word
    assert 1.0 < report["tokens_per_word"] < 12.0

    rows = duckdb.sql(
        f"SELECT rank, lhs, rhs, merged, pair_count "
        f"FROM read_parquet('{out}/*.parquet') ORDER BY rank"
    ).fetchall()
    assert [r[0] for r in rows] == list(range(32))
    assert all(r[3] == r[1] + r[2] for r in rows)
    assert all(r[4] >= 2 for r in rows)
    # merge counts are produced in non-increasing order WITHIN a batch
    # only; globally they must all be >= the floor (already checked) and
    # the first merge must be the corpus argmax (largest count overall)
    assert rows[0][4] == max(r[4] for r in rows)
