"""Video column operators — a REAL uncompressed-video path for the last
multimodal axis (image: multimodal.py, audio: audio.py).

Clips are opaque ``binary`` columns holding a complete YUV4MPEG2 (Y4M)
container — the public uncompressed interchange format of mjpegtools /
ffmpeg (`-f yuv4mpegpipe`). Y4M is a text header (``YUV4MPEG2 W.. H.. F..
C..``) plus per-frame ``FRAME\\n`` markers over raw planar YUV, so a
pure-numpy codec is exact — no decoder libraries needed. Compressed codecs
(h264/vp9) still require ffmpeg/PyAV and keep the clearly-marked seam
(:func:`multimodal.frame_sample_stub`); everything Spark-side here — frame
sampling, per-frame features, batch shape, corrupt-row degradation — is the
identical plumbing a compressed decoder would plug into.

Scale shape: :func:`sample_frames` is map-only over the payload column and
EXPLODES a clip into one row per sampled frame (every_n stride — the
standard pretraining frame-subsample), so downstream per-frame image ops
(resize, phash, dedup, alignment) compose unchanged. Corrupt containers
degrade to one ``decode_ok=false`` row, never a task failure.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# codec: YUV4MPEG2, C444 (planar 4:4:4) and Cmono
# --------------------------------------------------------------------------

_MAGIC = b"YUV4MPEG2"


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (24, 1)
) -> bytes:
    """Encode frames as Y4M. ``frames`` is uint8 with shape
    ``(n, h, w)`` (mono → ``Cmono``) or ``(n, h, w, 3)`` (planar YUV →
    ``C444``)."""
    if frames.dtype != np.uint8:
        raise ValueError(f"Y4M encoder needs uint8, got {frames.dtype}")
    mono = frames.ndim == 3
    if not mono and (frames.ndim != 4 or frames.shape[3] != 3):
        raise ValueError(f"bad frame shape {frames.shape}")
    n, h, w = frames.shape[:3]
    cs = b"mono" if mono else b"444"
    head = b"%s W%d H%d F%d:%d Ip A1:1 C%s\n" % (
        _MAGIC, w, h, fps[0], fps[1], cs
    )
    parts = [head]
    for k in range(n):
        parts.append(b"FRAME\n")
        if mono:
            parts.append(frames[k].tobytes())
        else:
            # planar: full Y plane, then U, then V
            parts.append(np.ascontiguousarray(frames[k].transpose(2, 0, 1)).tobytes())
    return b"".join(parts)


def decode_y4m(data: bytes) -> tuple[np.ndarray, tuple[int, int], str]:
    """Decode a Y4M container → ``(frames, (fps_num, fps_den),
    colorspace)``; frames are ``(n, h, w)`` for mono, ``(n, h, w, 3)``
    for C444. Raises ValueError on malformed input or an unsupported
    (subsampled/compressed) colorspace."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    cs = "420jpeg"  # Y4M default when C is absent
    for tok in data[len(_MAGIC) + 1 : nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif key == b"C":
            cs = val.decode("ascii")
    if not w or not h:
        raise ValueError("missing W/H in Y4M header")
    if cs == "mono":
        frame_bytes, planes = w * h, 1
    elif cs == "444":
        frame_bytes, planes = 3 * w * h, 3
    else:
        raise ValueError(f"unsupported Y4M colorspace C{cs}")
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad FRAME marker")
        start = fnl + 1
        raw = data[start : start + frame_bytes]
        if len(raw) < frame_bytes:
            raise ValueError("truncated frame")
        arr = np.frombuffer(raw, dtype=np.uint8)
        if planes == 1:
            frames.append(arr.reshape(h, w))
        else:
            frames.append(arr.reshape(3, h, w).transpose(1, 2, 0))
        pos = start + frame_bytes
    if not frames:
        raise ValueError("no frames")
    return np.stack(frames), fps, cs


# --------------------------------------------------------------------------
# frame sampling + per-frame features (Arrow-batched, map-only explode)
# --------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps_num", T.IntegerType()),
        T.StructField("fps_den", T.IntegerType()),
        T.StructField("mean_y", T.DoubleType()),
        T.StructField("mean_u", T.DoubleType()),
        T.StructField("mean_v", T.DoubleType()),
    ]
)


def sample_frames(
    df: DataFrame, every_n: int = 1, id_col: str = "video_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Decode each clip and emit one row per sampled frame (indices
    ``0, every_n, 2*every_n, …`` — the pretraining frame-subsample
    stride) with per-plane means. Mono clips report the luma mean with
    null chroma. Corrupt rows → a single ``decode_ok=false`` row."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FRAME_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[bytes_col]):
                vid = int(vid)
                try:
                    if blob is None:
                        raise ValueError("null payload")
                    frames, fps, cs = decode_y4m(bytes(blob))
                except ValueError:
                    rows.append((vid, False) + (None,) * 9)
                    continue
                n, h, w = frames.shape[:3]
                for k in range(0, n, every_n):
                    f = frames[k].astype(np.float64)
                    if cs == "mono":
                        my, mu, mv = float(f.mean()), None, None
                    else:
                        my, mu, mv = (float(f[:, :, c].mean()) for c in range(3))
                    rows.append(
                        (vid, True, k, w, h, n, fps[0], fps[1],
                         round(my, 6),
                         None if mu is None else round(mu, 6),
                         None if mv is None else round(mv, 6))
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bytes_col).mapInPandas(compute, FRAME_SCHEMA)


# --------------------------------------------------------------------------
# deterministic corpus synth (tests + oracle entry)
# --------------------------------------------------------------------------

SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.LongType()),
        T.StructField("bytes", T.BinaryType()),
    ]
)


def synth_params(video_id: int) -> tuple[int, int, int, tuple[int, int]]:
    """(n_frames, w, h, fps) as pure arithmetic on the id (oracle closed
    forms, like audio.synth_params)."""
    n = 6 + video_id % 7
    w = 16 * (1 + video_id % 3)
    h = 16
    fps = (24 + video_id % 2, 1)
    return n, w, h, fps


def frame_planes(video_id: int, k: int) -> tuple[int, int, int]:
    """Constant plane values of synthetic frame k: Y = (31*id + 7*k) % 256,
    U/V offset by 85/170 — distinct per plane so any plane-order or stride
    bug in the codec changes the answer."""
    y = (31 * video_id + 7 * k) % 256
    return y, (y + 85) % 256, (y + 170) % 256


def synth_video_table(ids: DataFrame, id_col: str = "video_id") -> DataFrame:
    """id column → (video_id, bytes) of constant-plane C444 Y4M clips via
    :func:`synth_params` / :func:`frame_planes`. Deterministic, map-only."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid in pdf[id_col]:
                vid = int(vid)
                n, w, h, fps = synth_params(vid)
                frames = np.empty((n, h, w, 3), dtype=np.uint8)
                for k in range(n):
                    frames[k] = np.array(frame_planes(vid, k), dtype=np.uint8)
                rows.append((vid, encode_y4m(frames, fps)))
            yield pd.DataFrame(rows, columns=["video_id", "bytes"])

    return ids.select(id_col).mapInPandas(gen, SYNTH_SCHEMA)
