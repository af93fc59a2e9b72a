"""Multimodal (image) column operators over the image+caption store.

Images are opaque ``binary`` columns with typed metadata (w, h, fmt).
Decode / feature-extract / verify run as Arrow-batched mapInPandas — the
Spark-side plumbing (schema, partitioning, batch shape) is real; the codecs
come from operators/imagecodec.py (real PNG; clearly-marked deterministic
fake lossy codec — swap for PIL/libjpeg when available).

verify_pixels implements the driver-mandated per-row invariant
(BASELINE.json input_hint): decoded-pixel allclose — PSNR = ∞ for png
(byte-exact), PSNR ≥ 40 dB for lossy fmt — plus phash re-computation.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from secretscraper_spark.operators.textstats import WS_SPLIT_PATTERN
from pyspark.sql import types as T

from .imagecodec import decode_image, phash64, pixels_for, psnr

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("phash_recomputed", T.LongType()),
    ]
)


def image_features(pages: DataFrame) -> DataFrame:
    """Decode + per-channel means + phash recompute (Arrow batches)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_image(bytes(r.bytes), r.fmt)
                means = px.astype(np.float64).mean(axis=(0, 1))
                rows.append(
                    (r.image_id, r.w, r.h, r.fmt,
                     round(float(means[0]), 4), round(float(means[1]), 4),
                     round(float(means[2]), 4), phash64(px))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return pages.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        compute, IMAGE_FEATURES_SCHEMA
    )


VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("psnr_db", T.DoubleType()),
        T.StructField("pixels_ok", T.BooleanType()),
        T.StructField("phash_ok", T.BooleanType()),
        T.StructField("dec_w", T.IntegerType()),
        T.StructField("dec_h", T.IntegerType()),
    ]
)


def verify_pixels(pages: DataFrame, seed_base: int, min_psnr_db: float = 40.0) -> DataFrame:
    """Per-row invariant job: decode stored bytes, regenerate ground-truth
    pixels from the generator seed, check PSNR + phash; ``dec_w``/``dec_h``
    report the DECODED geometry (from the codec, not the metadata columns)
    so a closed-form oracle can gate the decoder's output shape. Kept OUT
    of the crawl hot path (verification job only, SURVEY §7)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                idx = int(r.image_id.split("_")[-1])
                truth = pixels_for(seed_base + idx, int(r.w), int(r.h))
                got = decode_image(bytes(r.bytes), r.fmt)
                p = psnr(truth, got)
                ok = (p == float("inf")) if r.fmt == "png" else (p >= min_psnr_db)
                rows.append((r.image_id, r.fmt, round(min(p, 1e9), 3), bool(ok),
                             phash64(truth) == int(r.phash),
                             int(got.shape[1]), int(got.shape[0])))
            yield pd.DataFrame(rows, columns=[f.name for f in VERIFY_SCHEMA.fields])

    return pages.select("image_id", "bytes", "w", "h", "fmt", "phash").mapInPandas(
        compute, VERIFY_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


def resize_images(pages: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (same fmt), with the
    phash recomputed on the resized pixels. Pure numpy (index-gather) inside
    Arrow batches — the standard thumbnail/normalize stage of a multimodal
    training pipeline; swap the kernel for PIL/opencv where available."""
    from .imagecodec import encode_image

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_image(bytes(r.bytes), r.fmt)
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h // out_h).astype(np.intp)
                xi = (np.arange(out_w) * w // out_w).astype(np.intp)
                small = px[yi[:, None], xi[None, :], :]
                rows.append(
                    (r.image_id, encode_image(small, r.fmt), out_w, out_h,
                     r.fmt, phash64(small))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return pages.select("image_id", "bytes", "fmt").mapInPandas(compute, RESIZED_SCHEMA)


RESIZE_VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("dec_w", T.IntegerType()),
        T.StructField("dec_h", T.IntegerType()),
        T.StructField("resize_ok", T.BooleanType()),
        T.StructField("phash_ok", T.BooleanType()),
    ]
)


def verify_resized(
    pages: DataFrame, resized: DataFrame, out_w: int, out_h: int,
    seed_base: int, min_psnr_db: float = 40.0, max_phash_hamming: int = 4,
) -> DataFrame:
    """Per-row invariant job for the resize stage (the `verify_pixels`
    pattern, round-3 verdict item 2): independently regenerate the
    generator's ground-truth pixels, apply the SAME nearest-neighbor
    gather indices `(j*in//out)` directly to the truth, and compare the
    production output (which went generator → full-size encode → decode →
    gather → re-encode) against that one-hop truth gather.

    - png (lossless): decoded thumbnail must EQUAL the truth gather and
      the stored phash must equal `phash64(truth_gather)` exactly.
    - jpeg (lossy, two codec passes: the full-size decode and the
      thumbnail re-encode): PSNR(decoded thumbnail, truth gather) ≥
      *min_psnr_db*, and hamming(stored phash, phash64(truth_gather)) ≤
      *max_phash_hamming* — all arithmetic deterministic, so the flags
      are stable gates, not flaky tolerances.

    `dec_w`/`dec_h` report the decoded geometry of the re-encoded bytes
    (codec output, not the metadata columns). Joined on image_id with the
    original dims; verification job only — never in the crawl hot path."""
    dims = pages.select("image_id", "w", "h")
    joined = resized.select("image_id", "bytes", "fmt", "phash").join(
        dims, "image_id"
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                idx = int(r.image_id.split("_")[-1])
                truth = pixels_for(seed_base + idx, int(r.w), int(r.h))
                yi = (np.arange(out_h) * int(r.h) // out_h).astype(np.intp)
                xi = (np.arange(out_w) * int(r.w) // out_w).astype(np.intp)
                expect = truth[yi[:, None], xi[None, :], :]
                got = decode_image(bytes(r.bytes), r.fmt)
                expect_phash = phash64(expect)
                if r.fmt == "png":
                    ok = bool(np.array_equal(got, expect))
                    ph_ok = int(r.phash) == expect_phash
                else:
                    ok = bool(psnr(expect, got) >= min_psnr_db)
                    ham = bin(
                        (int(r.phash) ^ expect_phash) & ((1 << 64) - 1)
                    ).count("1")
                    ph_ok = ham <= max_phash_hamming
                rows.append(
                    (r.image_id, r.fmt, int(got.shape[1]), int(got.shape[0]),
                     ok, ph_ok)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_VERIFY_SCHEMA.fields]
            )

    return joined.mapInPandas(compute, RESIZE_VERIFY_SCHEMA)


def phash_near_dups(
    pages: DataFrame, max_hamming: int = 3, max_block_df: int | None = None,
    id_col: str = "image_id", phash_col: str = "phash",
    block_bits: int = 16,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash hamming distance ≤ k —
    the image-payload twin of text SimHash dedup, over the input table's
    ``phash:int64`` column (BASELINE.json input_hint; computed at ingest by
    imagecodec.phash64, recomputable via image_features).

    Zero decode, zero Python: the 64-bit phash is banded into 4×16-bit
    blocks (pigeonhole: hamming ≤ 3 ⇒ ≥1 block equal), candidates bucket-
    join on ``(block, block_val)``, and ``bit_count(xor)`` verifies — the
    same scale-shaped plan as dedup.simhash_near_dups (never all-pairs).
    Completeness is exact for the default ``max_hamming ≤ 3``; larger
    thresholds inherit LSH candidate semantics (see simhash_near_dups).
    At 100 TB pass ``max_block_df`` to cap degenerate buckets (a corpus's
    blank/placeholder images all share one phash — that bucket is an O(n²)
    hot key and those images are exact-dup territory anyway)."""
    sim = pages.select(
        F.col(id_col).alias("doc_id"), F.col(phash_col).alias("simhash")
    )
    from .dedup import simhash_near_dups

    return simhash_near_dups(
        sim, max_hamming=max_hamming, block_bits=block_bits,
        max_block_df=max_block_df,
    ).select(
        F.col("doc_a").alias("image_a"),
        F.col("doc_b").alias("image_b"),
        "hamming",
    )


def crossmodal_near_dups(
    pages: DataFrame,
    max_hamming: int = 3,
    min_caption_jaccard: float = 0.5,
    shingle_k: int = 3,
    max_block_df: int | None = None,
    id_col: str = "image_id",
    phash_col: str = "phash",
    caption_col: str = "caption",
    block_bits: int = 16,
) -> DataFrame:
    """Joint image+caption near-duplicate pairs over the input-hint table:
    visually near (phash hamming ≤ *max_hamming* via the banded bucket
    join) AND textually near (caption word-shingle Jaccard ≥
    *min_caption_jaccard*, verified EXACTLY but only on the phash
    candidate pairs). The multimodal dedup policy LAION-style pipelines
    want: a re-encoded image with the same caption is a dup; the same
    stock photo under unrelated captions is not.

    Plan: the expensive modality (image) prunes first — candidates come
    from the banded phash join (never all-pairs); caption shingle SETS
    are aggregated only for ids that appear in some candidate pair
    (left-semi prune), so the text verification join is candidate-sized
    end to end. Returns ``(image_a, image_b, hamming, jaccard)``."""
    from .dedup import ngram_jaccard_pairs, shingles

    cands = phash_near_dups(
        pages, max_hamming, max_block_df, id_col, phash_col, block_bits
    ).select(
        F.col("image_a").alias("doc_a"),
        F.col("image_b").alias("doc_b"),
        "hamming",
    )
    sh = shingles(
        pages.select(F.col(id_col), F.col(caption_col)),
        id_col,
        caption_col,
        k=shingle_k,
    )
    ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = sh.join(ids, "doc_id", "left_semi")
    jac = ngram_jaccard_pairs(sh, cands.select("doc_a", "doc_b"))
    # LEFT join: a candidate pair whose captions share no shingle (or are
    # shorter than shingle_k words) has no jaccard row — it must score 0,
    # not vanish, so min_caption_jaccard=0.0 annotates EVERY visual pair.
    return (
        cands.join(jac, ["doc_a", "doc_b"], "left")
        .withColumn("jaccard", F.coalesce("jaccard", F.lit(0.0)))
        .filter(F.col("jaccard") >= F.lit(float(min_caption_jaccard)))
        .select(
            F.col("doc_a").alias("image_a"),
            F.col("doc_b").alias("image_b"),
            "hamming",
            "jaccard",
        )
    )


def filter_images(
    pages: DataFrame,
    min_pixels: int = 4096,
    max_aspect: float = 4.0,
    min_bytes_per_pixel: float = 0.05,
    min_caption_chars: int = 5,
    w_col: str = "w",
    h_col: str = "h",
    bytes_col: str = "bytes",
    caption_col: str = "caption",
) -> DataFrame:
    """Image+caption curation gate (the LAION/DataComp-style pre-training
    filter) over the input-hint table shape ``(image_id, bytes, w, h, fmt,
    caption, phash)``: flag rows that are too small to train on
    (``w*h < min_pixels``), extreme-aspect banners/strips
    (``max(w/h, h/w) > max_aspect``), suspiciously few encoded bytes per
    pixel (blank / solid-color placeholders compress to almost nothing),
    or caption-less. ``keep`` is the conjunction; ``reject_reason`` names
    every failed gate (deterministic '+'-joined order) for curation stats.

    Pure Column exprs over the metadata + ``octet_length`` of the payload —
    zero decode, zero Python, zero shuffle: at 100 TB this is a scan whose
    filters push into the Iceberg/parquet reader. Works on any column
    layout via the *_col parameters (the bytes column may be binary or
    string; octet_length counts payload bytes either way)."""
    w = F.col(w_col).cast("double")
    h = F.col(h_col).cast("double")
    pixels = w * h
    aspect = F.greatest(w / h, h / w)
    bpp = F.octet_length(F.col(bytes_col)).cast("double") / pixels
    f_small = pixels < F.lit(float(min_pixels))
    f_aspect = aspect > F.lit(float(max_aspect))
    f_lowbpp = bpp < F.lit(float(min_bytes_per_pixel))
    f_caption = (
        F.length(F.trim(F.col(caption_col))) < F.lit(int(min_caption_chars))
    ) | F.col(caption_col).isNull()
    reason = F.concat_ws(
        "+",
        F.when(f_small, F.lit("small")),
        F.when(f_aspect, F.lit("aspect")),
        F.when(f_lowbpp, F.lit("low_bpp")),
        F.when(f_caption, F.lit("caption")),
    )
    return pages.withColumns(
        {
            "n_pixels": pixels.cast("long"),
            "aspect": F.round(aspect, 6),
            "bytes_per_pixel": F.round(bpp, 6),
            "keep": ~(f_small | f_aspect | f_lowbpp | f_caption),
            "reject_reason": F.when(reason != "", reason),
        }
    )


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


def payload_entropy(
    pages: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Per-payload Shannon BYTE entropy — the zero-decode corrupt/blank
    detector for binary columns: solid-color placeholders and truncated
    payloads sit near 0, healthy compressed image data near ln(256)≈5.55,
    so a band filter catches both failure modes without touching a codec
    (complements filter_images' bytes-per-pixel gate, which needs only
    metadata, and verify_pixels, which needs a full decode).

    Bytes become symbols JVM-side as ``hex(bytes)`` split into pairs by
    ``regexp_extract_all('..')`` (non-overlapping, in order — no HOF, no
    Python, and a VARCHAR stand-in column hexes its UTF-8 bytes
    identically in Spark and DuckDB, which is what lets the oracle gate
    this on the synthesized table). The rollup is the SAME fixed-point
    path as textstats.char_entropy (entropy_over_symbols) — exact BIGINT
    accumulation, layout/engine-invariant. Output: (id, n_bytes,
    n_distinct_bytes, byte_entropy); empty payloads yield no row."""
    from .textstats import entropy_over_symbols

    syms = pages.select(
        F.col(id_col).alias(id_col),
        F.explode(
            F.regexp_extract_all(
                F.hex(F.col(bytes_col)), F.lit(".."), F.lit(0)
            )
        ).alias("sym"),
    )
    return entropy_over_symbols(
        syms, id_col=id_col, out_prefix="byte"
    )


def image_text_metadata(
    pages: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Decoded image metadata as rows: one ``(image_id, key, value)`` per
    PNG tEXt chunk (imagecodec.png_text_chunks, repeated keywords kept) —
    Comment/Software/Author strings left by export tooling. Non-PNG,
    null, and malformed payloads yield no rows (corrupt bytes never fail
    the task). Map-only Arrow batches; an EXIF parser for jpeg slots in
    beside the tEXt walk unchanged."""
    from .imagecodec import png_text_chunks

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, blob, fmt in zip(pdf["image_id"], pdf["b"], pdf["f"]):
                if fmt != "png" or blob is None:
                    continue
                try:
                    chunks = png_text_chunks(bytes(blob))
                except ValueError:
                    continue
                rows.extend((img_id, k, v) for k, v in chunks)
            yield pd.DataFrame(rows, columns=["image_id", "key", "value"])

    return pages.select(
        F.col(id_col).alias("image_id"), F.col(bytes_col).alias("b"),
        F.col(fmt_col).alias("f"),
    ).mapInPandas(compute, IMAGE_META_SCHEMA)


def secrets_from_image_metadata(
    pages: DataFrame, rules: dict[str, str] | None = None, engine: str = "re"
) -> DataFrame:
    """The north-rule requirement 'secret-extraction rules applied to …
    decoded image metadata' (BASELINE.json north_star): run the SAME
    vectorized Arrow secrets UDF the caption path uses (functions/
    extract.py:make_secrets_udf → purekit extractor, reference
    handler.py:41-61 semantics) over every decoded tEXt value, dedup per
    image across chunks (reference ``set(secrets)`` per page,
    crawler.py:311). Returns ``(image_id, rule_name, match)``."""
    from ..config import loaded_rules
    from ..functions.extract import make_secrets_udf

    meta = image_text_metadata(pages)
    udf = make_secrets_udf(rules if rules is not None else loaded_rules(), engine=engine)
    return (
        meta.select("image_id", F.explode(udf("value")).alias("s"))
        .select("image_id", F.col("s.rule_name").alias("rule_name"),
                F.col("s.match").alias("match"))
        .dropDuplicates(["image_id", "rule_name", "match"])
    )


def hash_embed(text: F.Column, dim: int = 16, mode: str = "xxhash64") -> F.Column:
    """Deterministic bag-of-words hash embedding (``array<double>``): dim j
    is the mean over whitespace tokens of a [0,1)-mapped seeded token hash.
    This is a STAND-IN encoder — a real CLIP/SigLIP text tower produces the
    same ``array<double>`` column (via a Pandas-UDF batch encode where torch
    exists) and everything downstream (cosine, gate, stats) is
    encoder-agnostic. Pure Catalyst HOFs: per-token work only, no UDF.
    ``mode='portable'`` uses the md5-prefix hash so the DuckDB oracle can
    recompute it token-for-token (list order fixed ⇒ identical float
    accumulation in both engines).

    The token split is LET-BOUND via the array/transform/element_at idiom
    (CLAUDE.md HOF pitfall): Catalyst does no CSE across lambda bodies, so
    referencing the split expression from each of the dim means + sizes
    would re-run lower+split+filter 2×dim times per row."""
    from .dedup import portable_hash64

    toks_expr = F.filter(F.split(F.lower(text), WS_SPLIT_PATTERN), lambda t: t != F.lit(""))

    def embed_from(toks: F.Column) -> F.Column:
        def dim_mean(j: int) -> F.Column:
            # each mode applies its 1000-bucket reduction exactly once
            if mode == "portable":
                h = lambda t: portable_hash64(t, seed=j) % 1000  # noqa: E731
            else:
                h = lambda t: F.pmod(F.xxhash64(t, F.lit(j)), F.lit(1000))  # noqa: E731
            vals = F.transform(
                toks, lambda t: h(t).cast("double") / F.lit(1000.0)
            )
            return F.aggregate(vals, F.lit(0.0), lambda acc, v: acc + v) / F.greatest(
                F.size(toks), F.lit(1)
            ).cast("double")

        return F.array(*[dim_mean(j) for j in range(dim)])

    return F.element_at(F.transform(F.array(toks_expr), embed_from), 1)


def alignment_gate(
    df: DataFrame,
    emb_a_col: str,
    emb_b_col: str,
    threshold: float,
    out_col: str = "alignment",
    keep_col: str = "keep",
) -> DataFrame:
    """Cosine alignment between two embedding columns + keep flag — the
    CLIP-score image↔caption curation gate (LAION/DataComp: keep a pair iff
    similarity ≥ t). Encoder-agnostic over ``array<double>`` columns (plug
    real tower outputs; :func:`hash_embed` is the deterministic test
    stand-in). Pure JVM HOF expressions: one scan, zero Python, zero
    shuffle — at 100 TB the keep filter applies in the same stage as the
    scan and prunes before any downstream shuffle."""
    from .similarity import cosine_similarity

    for c in (out_col, keep_col):
        if c in df.columns:
            # another gate's verdict (e.g. filter_images' 'keep') must not
            # be silently clobbered — make the composition conflict loud
            raise ValueError(f"column {c!r} already exists; pass out_col/keep_col")

    # + 0.0 canonicalizes IEEE -0.0 (round(-0.0004, 3) is negative zero,
    # which engines print differently) to +0.0
    cos = F.round(cosine_similarity(F.col(emb_a_col), F.col(emb_b_col)), 3) + F.lit(0.0)
    return df.withColumns(
        {out_col: cos, keep_col: cos >= F.lit(float(threshold))}
    )


def frame_sample_stub(video_bytes: bytes, every_n: int = 30):
    """Video frame sampling is NOT implementable in this container (no
    decoder libraries). The Spark plumbing pattern is image_features();
    this stub marks the seam."""
    raise NotImplementedError("video decode requires ffmpeg/PyAV — not in container")
