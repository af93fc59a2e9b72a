"""Smoke test for submit/curate_job.py: the spark-submit curation surface
runs end-to-end in a fresh process (own JVM, like a real submit), prints
the funnel JSON contract, and writes a curated parquet whose row count
matches the funnel's terminal stage."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb


def test_curate_job_end_to_end(tmp_path):
    out = str(tmp_path / "curated")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [
            sys.executable, "submit/curate_job.py",
            "--docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", out,
        ],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=480,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["n_docs"] == 500
    stages = [s["stage"] for s in report["funnel"]]
    assert stages == ["quality", "language", "entropy", "dedup_canonical"]
    # chaining invariant + terminal count matches the written table
    prev = report["n_docs"]
    for s in report["funnel"]:
        assert s["n_in"] == prev
        assert 0 <= s["n_kept"] <= s["n_in"]
        prev = s["n_kept"]
    n_written = duckdb.sql(
        f"SELECT count(*) AS n FROM read_parquet('{out}/*.parquet')"
    ).fetchone()[0]
    assert n_written == report["n_curated"] == prev
    assert 0 < n_written < 500
