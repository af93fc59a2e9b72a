"""BPE trainer bench at its design point (round-3 verdict item 3).

The sf0.1 documents table has a 31-word vocabulary (synthetic captions) —
BPE exhausts its merge space after a few hundred merges there, so the
trainer's production regime (≥2k merges toward a 32k-vocab tokenizer) was
never measured. This job synthesizes a DETERMINISTIC richer corpus in
pure Catalyst (no RNG, no external data: word identity = base-26 render
of a xxhash64-derived id with a cubic frequency skew, so low ids are
Zipf-ishly frequent) and measures:

  - train_bpe_batched at --n-merges (default 2048) for each --batch-k,
    reporting rounds, wall seconds, and merges/sec;
  - train_bpe (the sequential trainer) for --seq-merges (default 128)
    rounds, reporting measured per-round cost and the EXTRAPOLATED wall
    for --n-merges sequential rounds — running 2048 sequential Spark
    rounds to completion would measure driver latency 2048 times to
    state the obvious;
  - agreement: the fraction of the sequential trainer's merge SET that
    the batched trainer reproduces over the same prefix (ranks may
    permute within a round by design; the set is the semantic artifact).

    spark-submit --master local[32] --py-files /tmp/ss.zip \
        submit/bpe_bench.py --n-docs 50000 --n-merges 2048 \
        --batch-ks 16,64,256

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def synth_docs(
    spark: SparkSession, n_docs: int, words_per_doc: int = 40,
    vocab: int = 30000,
) -> DataFrame:
    """Deterministic corpus: doc i = words_per_doc words; word j of doc i
    has id floor(vocab * u³) where u = xxhash64(i, j)-derived uniform —
    the cube gives the frequency skew a natural corpus has (low ids
    dominate, the tail is sparse), which is what makes min_pair_count
    meaningful. A word id renders as 3-12 base-26 letters (length also
    id-derived), so character-pair diversity scales with vocab."""
    def word_expr(doc_id, j):
        u = (
            F.pmod(F.xxhash64(doc_id, j, F.lit(42)), F.lit(1_000_000))
            / F.lit(1_000_000.0)
        )
        wid = F.floor(F.lit(float(vocab)) * u * u * u).cast("long")
        wids = wid.cast("string")
        wlen = (F.pmod(F.xxhash64(wids, F.lit("w")), F.lit(10)) + F.lit(3)).cast(
            "int"
        )
        letters = F.transform(
            F.sequence(F.lit(1), wlen),
            lambda k: F.chr(
                F.lit(97) + F.pmod(F.xxhash64(wids, k.cast("string")), F.lit(26))
            ),
        )
        return F.array_join(letters, "")

    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(words_per_doc)),
                lambda j: word_expr(F.col("id"), j),
            ),
            " ",
        ).alias("text"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=50000)
    ap.add_argument("--words-per-doc", type=int, default=40)
    ap.add_argument("--vocab", type=int, default=30000)
    ap.add_argument("--n-merges", type=int, default=2048)
    ap.add_argument("--batch-ks", default="16,64,256")
    ap.add_argument("--safe-ks", default="",
                    help="comma list of batch_k values to ALSO bench with "
                         "the bit-exact frequency-gap-safe batcher "
                         "(train_bpe_batched_safe); empty = skip")
    ap.add_argument("--seq-merges", type=int, default=128)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("secretscraper-bpe-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("SELECT lower('WarḿÉ')").collect()  # ICU warmup (session.py)

    from secretscraper_spark.operators.bpe import train_bpe, train_bpe_batched

    docs = synth_docs(
        spark, args.n_docs, args.words_per_doc, args.vocab
    ).localCheckpoint()
    n_docs = docs.count()

    results: dict = {
        "n_docs": n_docs,
        "vocab_target": args.vocab,
        "n_merges": args.n_merges,
        "batched": [],
    }

    # wrap the collect-per-round loop to count rounds without touching the
    # operator: each localCheckpoint(eager=True) in the batched trainer is
    # one round; count pair_counts jobs via a simple proxy — len(merges)
    # vs batch_k gives rounds exactly for the no-early-stop case, and the
    # trainer's while loop guarantees rounds = ceil(len/batch_k) when
    # every round fills (report both).
    for bk in [int(x) for x in args.batch_ks.split(",") if x]:
        t0 = time.perf_counter()
        merges = train_bpe_batched(docs, args.n_merges, batch_k=bk)
        wall = time.perf_counter() - t0
        results["batched"].append(
            {
                "batch_k": bk,
                "merges": len(merges),
                "rounds_min": -(-len(merges) // bk),
                "wall_sec": round(wall, 1),
                "merges_per_sec": round(len(merges) / wall, 2),
            }
        )

    # frequency-gap-safe batcher (round-4 verdict "What's wrong" #1):
    # bit-exact to sequential at any K — measure what that exactness
    # costs at the design point: certified-prefix sizes per round and
    # wall vs the fast batcher above
    if args.safe_ks:
        from secretscraper_spark.operators.bpe import train_bpe_batched_safe

        results["safe_batched"] = []
        for bk in [int(x) for x in args.safe_ks.split(",") if x]:
            rounds: list[int] = []
            t0 = time.perf_counter()
            merges = train_bpe_batched_safe(
                docs, args.n_merges, batch_k=bk, on_round=rounds.append
            )
            wall = time.perf_counter() - t0
            results["safe_batched"].append(
                {
                    "batch_k": bk,
                    "merges": len(merges),
                    "rounds": len(rounds),
                    "mean_certified_prefix": round(
                        sum(rounds) / max(len(rounds), 1), 2
                    ),
                    "max_certified_prefix": max(rounds, default=0),
                    "wall_sec": round(wall, 1),
                    "merges_per_sec": round(len(merges) / wall, 2),
                }
            )

    t0 = time.perf_counter()
    seq = train_bpe(docs, args.seq_merges)
    seq_wall = time.perf_counter() - t0
    per_round = seq_wall / max(len(seq), 1)
    results["sequential"] = {
        "merges": len(seq),
        "wall_sec": round(seq_wall, 1),
        "sec_per_merge": round(per_round, 3),
        "extrapolated_wall_sec_at_n_merges": round(per_round * args.n_merges, 1),
    }
    # agreement over the sequential prefix: batched ranks may permute
    # within a round; the merge SET is the artifact
    seq_set = {(m["lhs"], m["rhs"]) for m in seq}
    first_bk = int(args.batch_ks.split(",")[0])
    batched_prefix = {
        (m["lhs"], m["rhs"])
        for m in train_bpe_batched(docs, len(seq), batch_k=first_bk)
    }
    results["prefix_agreement"] = round(
        len(seq_set & batched_prefix) / max(len(seq_set), 1), 4
    )
    if args.safe_ks:
        from secretscraper_spark.operators.bpe import train_bpe_batched_safe

        safe_prefix = train_bpe_batched_safe(
            docs, len(seq), batch_k=int(args.safe_ks.split(",")[0])
        )
        # the safe batcher's contract is BIT-exactness, not set overlap
        results["safe_prefix_exact"] = safe_prefix == seq
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
