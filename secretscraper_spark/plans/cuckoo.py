"""Sharded cuckoo filter for the URL-seen set — the deletable alternative
to plans/bloom.py (north rule: "partitioned bloom/cuckoo filter keyed by
canonicalized-URL xxhash64").

Why cuckoo: a bloom filter cannot forget. The reference expires its fetch
cache after 60 s (crawler.py:403) and a long-running recrawl fleet needs
the same ability on the seen-set (drop URLs whose TTL lapsed so they
re-fetch). A cuckoo filter supports delete(fingerprint) exactly.

Layout (Fan et al., CoNEXT'14): buckets of 4 fingerprints (uint16,
0 = empty); each key has two candidate buckets
    i1 = h(key) mod m
    i2 = (i1 XOR h(fp)) mod m       -- partial-key cuckoo hashing
so membership/delete touch ≤ 2 buckets, and insertion evicts with a bounded
random-walk. Sharded exactly like plans/bloom.build_bucketed_bloom: one
filter per pmod(xxhash64(key), B) shard, built/probed inside
applyInPandas groups — no single machine holds more than a shard.

Correctness contract matches bloom: the filter only ROUTES rows (negative ⇒
definitely unseen, skip the join; positive ⇒ exact anti-join confirms), so
false positives never change the answer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

BUCKET_SLOTS = 4
MAX_KICKS = 500


def _fp(hashes: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the key hash."""
    fp = (hashes.astype(np.uint64) >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _i1(hashes: np.ndarray, m: int) -> np.ndarray:
    return (hashes.astype(np.uint64) % np.uint64(m)).astype(np.int64)


def _alt(i: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    # partial-key hashing: alt index = i XOR (fp * 0x5bd1e995) mod m
    h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(m)
    return ((i.astype(np.uint64) ^ h) % np.uint64(m)).astype(np.int64)


class CuckooShard:
    """One shard: numpy (m, 4) uint16 table. Pure-python/numpy, used inside
    Arrow-batched group functions and in driver-side tests."""

    def __init__(self, capacity: int):
        m = max(int(capacity / (BUCKET_SLOTS * 0.95)), 4)
        self.m = 1 << (m - 1).bit_length()  # power of two buckets
        self.table = np.zeros((self.m, BUCKET_SLOTS), dtype=np.uint16)
        self._rng = np.random.default_rng(42)

    # -- single-key ops -------------------------------------------------------
    def _insert_one(self, i: int, fp: int) -> bool:
        for idx in (i, int(_alt(np.array([i]), np.array([fp], dtype=np.uint16), self.m)[0])):
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return True
        # evict with a bounded random walk
        idx = i
        for _ in range(MAX_KICKS):
            slot = int(self._rng.integers(0, BUCKET_SLOTS))
            fp, self.table[idx, slot] = int(self.table[idx, slot]), fp
            idx = int(_alt(np.array([idx]), np.array([fp], dtype=np.uint16), self.m)[0])
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return True
        return False  # full — caller should resize; capacity is pre-sized

    def insert_hashes(self, hashes: np.ndarray) -> int:
        fps, i1s = _fp(hashes), _i1(hashes, self.m)
        failed = 0
        for i, fp in zip(i1s, fps):
            if not self._insert_one(int(i), int(fp)):
                failed += 1
        return failed

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        fps, i1s = _fp(hashes), _i1(hashes, self.m)
        i2s = _alt(i1s, fps, self.m)
        hit1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        hit2 = (self.table[i2s] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    def delete_hashes(self, hashes: np.ndarray) -> int:
        """Remove one matching fingerprint per key; returns #deleted."""
        fps, i1s = _fp(hashes), _i1(hashes, self.m)
        i2s = _alt(i1s, fps, self.m)
        deleted = 0
        for i1, i2, fp in zip(i1s, i2s, fps):
            for idx in (int(i1), int(i2)):
                row = self.table[idx]
                where = np.flatnonzero(row == fp)
                if len(where):
                    row[where[0]] = 0
                    deleted += 1
                    break
        return deleted

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, m: int) -> "CuckooShard":
        s = cls.__new__(cls)
        s.m = m
        s.table = np.frombuffer(data, dtype=np.uint16).reshape(m, BUCKET_SLOTS).copy()
        s._rng = np.random.default_rng(42)
        return s


def build_sharded_cuckoo(
    seen: DataFrame, key_col: str = "url_norm", n_buckets: int = 64,
    capacity_per_bucket: int = 1 << 16,
) -> DataFrame:
    """(bucket, table, m) — one cuckoo shard per key-hash bucket."""
    hashed = seen.select(
        F.xxhash64(key_col).alias("h"),
        F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int").alias("bucket"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = CuckooShard(max(capacity_per_bucket, len(pdf) * 2))
        failed = shard.insert_hashes(pdf["h"].to_numpy(dtype=np.int64))
        return pd.DataFrame({
            "bucket": [int(pdf["bucket"].iloc[0])],
            "table": [shard.to_bytes()],
            "m": [shard.m],
            "failed": [failed],
        })

    return hashed.groupBy("bucket").applyInPandas(
        build, "bucket int, table binary, m int, failed int"
    )


def update_sharded_cuckoo(
    shards: DataFrame, new_seen: DataFrame, key_col: str = "url_norm",
    n_buckets: int = 64, capacity_per_bucket: int = 1 << 16,
) -> DataFrame:
    """Incrementally insert *new_seen*'s keys into the sharded filter — the
    per-tier crawler update (and the TTL-recrawl counterpart of
    ``delete_hashes``). Cogroups each shard with its bucket's new key hashes
    on the executors; raw hashes (not fingerprints) travel, so index math
    always uses the receiving shard's own ``m``. Buckets appearing for the
    first time get a fresh shard. ``failed`` accumulates — a shard that ever
    failed an insert routes its whole bucket to the exact anti-join."""
    hashed = new_seen.select(
        F.xxhash64(key_col).alias("h"),
        F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int").alias("bucket"),
    )

    def merge(shard_pdf: pd.DataFrame, new_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(shard_pdf):
            bucket = int(shard_pdf["bucket"].iloc[0])
            shard = CuckooShard.from_bytes(
                shard_pdf["table"].iloc[0], int(shard_pdf["m"].iloc[0])
            )
            failed = int(shard_pdf["failed"].iloc[0])
        else:
            bucket = int(new_pdf["bucket"].iloc[0])
            shard = CuckooShard(max(capacity_per_bucket, len(new_pdf) * 2))
            failed = 0
        if len(new_pdf):
            failed += shard.insert_hashes(new_pdf["h"].to_numpy(dtype=np.int64))
        return pd.DataFrame({
            "bucket": [bucket], "table": [shard.to_bytes()],
            "m": [shard.m], "failed": [failed],
        })

    return shards.groupBy("bucket").cogroup(hashed.groupBy("bucket")).applyInPandas(
        merge, "bucket int, table binary, m int, failed int"
    )


def delete_from_sharded_cuckoo(
    shards: DataFrame, expired: DataFrame, key_col: str = "url_norm",
    n_buckets: int = 64,
) -> DataFrame:
    """Remove *expired* keys from the sharded filter — the TTL-recrawl
    path (reference crawler.py:403's 60 s cache expiry): deleted URLs
    become definitely-unseen again and pass the prefilter to re-enqueue.
    Cogroup per bucket, same raw-hash travel rule as update; buckets with
    no expiries pass through untouched."""
    hashed = expired.select(
        F.xxhash64(key_col).alias("h"),
        F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int").alias("bucket"),
    )

    def drop_keys(shard_pdf: pd.DataFrame, exp_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(shard_pdf):
            return pd.DataFrame(
                columns=["bucket", "table", "m", "failed"]
            ).astype({"bucket": "int32", "m": "int32", "failed": "int32"})
        bucket = int(shard_pdf["bucket"].iloc[0])
        table, m = shard_pdf["table"].iloc[0], int(shard_pdf["m"].iloc[0])
        failed = int(shard_pdf["failed"].iloc[0])
        if len(exp_pdf):
            shard = CuckooShard.from_bytes(table, m)
            shard.delete_hashes(exp_pdf["h"].to_numpy(dtype=np.int64))
            table = shard.to_bytes()
        return pd.DataFrame({
            "bucket": [bucket], "table": [table], "m": [m], "failed": [failed],
        })

    return shards.groupBy("bucket").cogroup(hashed.groupBy("bucket")).applyInPandas(
        drop_keys, "bucket int, table binary, m int, failed int"
    )


def cuckoo_anti_join(
    candidates: DataFrame, seen: DataFrame, shards: DataFrame,
    key_col: str = "url_norm", n_buckets: int = 64,
) -> DataFrame:
    """Exact `candidates ∖ seen` routed through the sharded cuckoo filter
    — the shared keys-only scaffold (`bloom.keys_only_sharded_anti_join`,
    including the materialized-candidates caveat and the measured cost of
    the earlier full-width tagged-split form) with the cuckoo membership
    test as the per-bucket kernel."""
    from .bloom import keys_only_sharded_anti_join

    def bucket_probe(shard_pdf: pd.DataFrame, vals: np.ndarray) -> np.ndarray:
        # a shard with failed inserts is missing fingerprints — its
        # negatives are NOT trustworthy, so route the whole bucket to the
        # exact anti-join (practically unreachable: build sizes 2x, but the
        # exactness contract must not depend on sizing)
        if int(shard_pdf["failed"].iloc[0] or 0) > 0:
            return np.ones(len(vals), dtype=bool)
        shard = CuckooShard.from_bytes(
            shard_pdf["table"].iloc[0], int(shard_pdf["m"].iloc[0])
        )
        return shard.contains_hashes(vals)

    return keys_only_sharded_anti_join(
        candidates, seen, shards.select("bucket", "table", "m", "failed"),
        key_col, n_buckets, bucket_probe,
    )
