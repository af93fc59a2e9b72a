"""Video (Y4M) operator tests: codec round-trip on random frames, header
tolerance, malformed-input rejects, closed-form features, and the Spark
frame-sampling pipeline incl. corrupt rows and stride semantics."""

from __future__ import annotations

import numpy as np
import pytest

from secretscraper_spark.operators import video


def test_y4m_roundtrip_color_and_mono():
    rng = np.random.default_rng(11)
    color = rng.integers(0, 256, size=(3, 8, 12, 3)).astype(np.uint8)
    mono = rng.integers(0, 256, size=(4, 6, 10)).astype(np.uint8)
    for frames, fps in ((color, (30, 1)), (mono, (24000, 1001))):
        got, got_fps, cs = video.decode_y4m(video.encode_y4m(frames, fps))
        assert got_fps == fps
        np.testing.assert_array_equal(got, frames)
    assert video.decode_y4m(video.encode_y4m(mono, (24, 1)))[2] == "mono"


def test_y4m_header_tolerates_extra_params():
    """ffmpeg emits X-extension tokens (e.g. XYSCSS=444) — ignore them."""
    frames = np.full((2, 4, 4, 3), 7, dtype=np.uint8)
    blob = video.encode_y4m(frames, (25, 1))
    hacked = blob.replace(b" C444\n", b" XYSCSS=444 C444\n", 1)
    got, fps, cs = video.decode_y4m(hacked)
    np.testing.assert_array_equal(got, frames)


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"RIFF....WAVE",
        b"YUV4MPEG2 W4 H4 F25:1 C444\n",  # no frames
        b"YUV4MPEG2 F25:1 C444\nFRAME\n" + b"\x00" * 48,  # missing W/H
        b"YUV4MPEG2 W4 H4 F25:1 C420jpeg\nFRAME\n" + b"\x00" * 24,  # subsampled
        b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" + b"\x00" * 10,  # truncated
        b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAMX\n" + b"\x00" * 48,  # bad marker
    ],
)
def test_decode_rejects_malformed(blob):
    with pytest.raises(ValueError):
        video.decode_y4m(blob)


def test_frame_features_closed_forms_local():
    import pandas as pd

    for vid in range(10):
        n, w, h, fps = video.synth_params(vid)
        pdf = pd.DataFrame({"video_id": [vid], "bytes": [None]})
        # build via the same synth the table op uses
        frames = np.empty((n, h, w, 3), dtype=np.uint8)
        for k in range(n):
            frames[k] = np.array(video.frame_planes(vid, k), dtype=np.uint8)
        got, got_fps, cs = video.decode_y4m(video.encode_y4m(frames, fps))
        assert got_fps == fps and cs == "444" and got.shape == (n, h, w, 3)
        for k in range(n):
            y, u, v = video.frame_planes(vid, k)
            assert float(got[k, :, :, 0].mean()) == float(y)
            assert float(got[k, :, :, 1].mean()) == float(u)
            assert float(got[k, :, :, 2].mean()) == float(v)


def test_spark_sample_frames(spark):
    from pyspark.sql import functions as F

    ids = spark.range(0, 24).withColumnRenamed("id", "video_id")
    table = video.synth_video_table(ids)
    corrupted = table.withColumn(
        "bytes",
        F.when(F.col("video_id") == 5, F.lit(b"junk"))
        .when(F.col("video_id") == 9, F.lit(None).cast("binary"))
        .otherwise(F.col("bytes")),
    )
    out = video.sample_frames(corrupted, every_n=2).collect()
    bad = {r.video_id for r in out if not r.decode_ok}
    assert bad == {5, 9}
    assert all(r.mean_y is None for r in out if not r.decode_ok)
    by_vid: dict[int, list] = {}
    for r in out:
        if r.decode_ok:
            by_vid.setdefault(r.video_id, []).append(r)
    assert set(by_vid) == set(range(24)) - {5, 9}
    for vid, rows in by_vid.items():
        n, w, h, fps = video.synth_params(vid)
        assert sorted(r.frame_idx for r in rows) == list(range(0, n, 2))
        for r in rows:
            y, u, v = video.frame_planes(vid, r.frame_idx)
            assert (r.w, r.h, r.n_frames, r.fps_num, r.fps_den) == (w, h, n, *fps)
            assert (r.mean_y, r.mean_u, r.mean_v) == (float(y), float(u), float(v))
