"""Audio (WAV/PCM) column operators — the audio twin of multimodal.py.

Audio clips are opaque ``binary`` columns carrying a complete RIFF/WAVE
container; features are extracted by a real PCM16 decoder (pure numpy —
no audio libraries exist in this container, and none are needed for
uncompressed PCM) inside Arrow-batched ``mapInPandas``. Compressed codecs
(mp3/opus/flac) would slot into :func:`decode_wav` exactly like
imagecodec's lossy seam — the Spark-side plumbing (schema, batch shape,
null-on-corrupt) is identical and is what this module makes real.

Scale shape: feature extraction is map-only (no shuffle) over the payload
column; corrupt rows degrade to ``decode_ok=false`` + null features rather
than failing the task — at 10^10 rows a single bad byte-range must never
kill a stage.

The square-wave synthesizer exists so the WHOLE pipeline (encoder →
decoder → features) is value-checked against an independent engine: every
feature of a square wave has an exact closed form, so the DuckDB oracle
recomputes them from the generator parameters alone without ever touching
the bytes (see __spark_entry__.q_audio_features).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# codec: RIFF/WAVE PCM16 (real, byte-exact round trip)
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples (shape ``(n,)`` or ``(n, channels)``) as a
    canonical RIFF/WAVE PCM16 container (fmt + data chunks)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError(f"PCM16 encoder needs int16, got {samples.dtype}")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()  # interleaved little-endian
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM16 container by walking its chunk list (fmt
    and data may appear in any order, with foreign chunks interleaved —
    real-world WAVs carry LIST/INFO/cue chunks). Returns ``(samples
    (n, channels) int16, sample_rate)``. Raises ValueError on anything
    that is not uncompressed PCM16."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, end = 12, len(data)
    fmt_chunk = pcm = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if len(payload) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt_chunk = payload
        elif cid == b"data":
            pcm = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, sr, _, _, bits = struct.unpack("<HHIIHH", fmt_chunk[:16])
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported format (fmt={audio_fmt}, bits={bits})")
    if ch < 1:
        raise ValueError("zero channels")
    if sr < 1:
        # a zeroed rate field would otherwise surface as ZeroDivisionError
        # in feature math — keep every corruption on the ValueError path
        raise ValueError("zero sample rate")
    samples = np.frombuffer(pcm[: (len(pcm) // (2 * ch)) * 2 * ch], dtype="<i2")
    return samples.reshape(-1, ch).astype(np.int16), sr


def synth_square(
    n_samples: int, half_period: int, amplitude: int, channels: int = 1
) -> np.ndarray:
    """Deterministic square wave: sample i is ``+A`` when ``(i // H) % 2
    == 0`` else ``-A``; channel 1 (if stereo) is the inversion. Every
    feature below has a closed form in (n, H, A) — the oracle contract."""
    i = np.arange(n_samples)
    mono = np.where((i // half_period) % 2 == 0, amplitude, -amplitude)
    chans = [mono if c % 2 == 0 else -mono for c in range(channels)]
    return np.stack(chans, axis=1).astype(np.int16)


# --------------------------------------------------------------------------
# feature extraction (Arrow-batched, map-only)
# --------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("clip_frac", T.DoubleType()),
    ]
)


def _features_row(audio_id: int, blob: bytes | None) -> tuple:
    try:
        if blob is None:
            raise ValueError("null payload")
        samples, sr = decode_wav(blob)
    except (ValueError, struct.error):
        return (audio_id, False, None, None, None, None, None, None, None, None)
    n, ch = samples.shape
    if n == 0:
        return (audio_id, True, ch, sr, 0, 0.0, None, None, None, None)
    x = samples.astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(np.square(x))))
    peak = float(np.max(np.abs(x)))
    if n > 1:
        signs = samples >= 0
        zcr = float(np.mean(signs[1:] != signs[:-1]))
    else:
        zcr = 0.0
    clip = float(np.mean(np.abs(samples.astype(np.int32)) >= 32767))
    return (
        audio_id, True, ch, sr, n,
        round(n / sr, 6), round(rms, 6), round(peak, 6),
        round(zcr, 6), round(clip, 6),
    )


def audio_features(
    df: DataFrame, id_col: str = "audio_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Decode + per-clip features over the payload column. Map-only Arrow
    batches (the Python loop is per-clip inside a batch, amortized like
    imagecodec); corrupt containers yield ``decode_ok=false`` rows.

    Features (all on int16 PCM normalized by 1/32768, channel-pooled):
    ``duration_s`` n/sr; ``rms`` root-mean-square level; ``peak`` max
    absolute level; ``zcr`` fraction of adjacent interleaved-frame sign
    flips (pooled over channels); ``clip_frac`` fraction of samples at
    full scale (|s| >= 32767) — the standard length/loudness/periodicity/
    clipping curation gates of a speech-data pipeline."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]
        for pdf in batches:
            rows = [
                _features_row(int(r[0]), None if r[1] is None else bytes(r[1]))
                for r in zip(pdf[id_col], pdf[bytes_col])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bytes_col).mapInPandas(compute, AUDIO_FEATURES_SCHEMA)


# --------------------------------------------------------------------------
# deterministic corpus synth (tests + oracle entry)
# --------------------------------------------------------------------------

SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.LongType()),
        T.StructField("bytes", T.BinaryType()),
    ]
)


def synth_params(audio_id: int) -> tuple[int, int, int, int, int]:
    """(n_samples, sample_rate, half_period, amplitude, channels) as pure
    arithmetic on the id — the closed forms the DuckDB oracle mirrors
    (q_audio_features). Every ~11th clip is synthesized AT full scale so
    the clip detector has positives."""
    n = 400 + (audio_id % 37) * 8
    sr = 8000 * (1 + audio_id % 3)
    half = 2 + audio_id % 9
    # amp stride 3001, not a round 3000: amp % 256 != 0 for every value, so
    # rms = amp/32768 never lands on an exact 6-decimal tie (where Python's
    # banker's rounding and DuckDB's round-half-away would diverge)
    amp = 32767 if audio_id % 11 == 0 else 20000 + (audio_id % 5) * 3001
    ch = 1 + audio_id % 2
    return n, sr, half, amp, ch


def synth_audio_table(ids: DataFrame, id_col: str = "audio_id") -> DataFrame:
    """id column → (audio_id, bytes) of square-wave WAVs via
    :func:`synth_params`. Deterministic, executor-side, map-only."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid in pdf[id_col]:
                aid = int(aid)
                n, sr, half, amp, ch = synth_params(aid)
                rows.append((aid, encode_wav(synth_square(n, half, amp, ch), sr)))
            yield pd.DataFrame(rows, columns=["audio_id", "bytes"])

    return ids.select(id_col).mapInPandas(gen, SYNTH_SCHEMA)
