"""Audio operator tests: WAV codec round-trip, chunk-walking robustness,
feature exactness (closed forms + an independent numpy recompute), and the
Spark mapInPandas pipeline incl. corrupt-row degradation."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from secretscraper_spark.operators import audio


def test_wav_roundtrip_mono_and_stereo():
    sr = 16000
    mono = audio.synth_square(500, 7, 12345, channels=1)
    stereo = audio.synth_square(500, 7, 12345, channels=2)
    for pcm in (mono, stereo):
        got, got_sr = audio.decode_wav(audio.encode_wav(pcm, sr))
        assert got_sr == sr
        np.testing.assert_array_equal(got, pcm)


def test_decode_walks_foreign_chunks():
    """Real WAVs interleave LIST/cue chunks; the decoder must skip them,
    including odd-sized chunks (word-aligned with a pad byte)."""
    pcm = audio.synth_square(64, 3, 1000, channels=1)
    blob = audio.encode_wav(pcm, 8000)
    # splice a 5-byte (odd) LIST chunk between fmt and data
    fmt_end = blob.index(b"data")
    foreign = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = blob[:fmt_end] + foreign + blob[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    got, sr = audio.decode_wav(spliced)
    assert sr == 8000
    np.testing.assert_array_equal(got, pcm)


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"RIFF\x00\x00\x00\x00WAVE",  # no chunks
        b"OggS" + b"\x00" * 40,  # wrong container
        audio.encode_wav(audio.synth_square(16, 2, 100), 8000)[:30],  # truncated
    ],
)
def test_decode_rejects_garbage(blob):
    with pytest.raises(ValueError):
        audio.decode_wav(blob)


def test_decode_rejects_non_pcm16():
    blob = bytearray(audio.encode_wav(audio.synth_square(16, 2, 100), 8000))
    i = blob.index(b"fmt ") + 8
    blob[i : i + 2] = struct.pack("<H", 3)  # IEEE float format tag
    with pytest.raises(ValueError):
        audio.decode_wav(bytes(blob))


def test_features_closed_forms():
    """Square-wave features equal their closed forms exactly — the same
    contract the DuckDB oracle (q_audio_features) checks at sf scale."""
    for aid in range(0, 60):
        n, sr, half, amp, ch = audio.synth_params(aid)
        blob = audio.encode_wav(audio.synth_square(n, half, amp, ch), sr)
        row = audio._features_row(aid, blob)
        (got_id, ok, got_ch, got_sr, got_n,
         duration, rms, peak, zcr, clip) = row
        assert (got_id, ok, got_ch, got_sr, got_n) == (aid, True, ch, sr, n)
        assert duration == round(n / sr, 6)
        assert rms == round(amp / 32768.0, 6)
        assert peak == round(amp / 32768.0, 6)
        assert zcr == round(((n - 1) // half) / (n - 1), 6)
        assert clip == (1.0 if amp == 32767 else 0.0)


def test_features_vs_independent_numpy():
    """Non-square signal (ramp + noise-free chirp-ish): features must match
    a from-scratch recompute, not just the synth's closed forms."""
    rng = np.random.default_rng(7)
    pcm = rng.integers(-30000, 30000, size=(1000, 2)).astype(np.int16)
    pcm[::50] = 32767  # guarantee clip positives
    blob = audio.encode_wav(pcm, 22050)
    (_, ok, ch, sr, n, duration, rms, peak, zcr, clip) = audio._features_row(1, blob)
    assert ok and (ch, sr, n) == (2, 22050, 1000)
    x = pcm.astype(np.float64) / 32768.0
    assert rms == round(float(np.sqrt((x**2).mean())), 6)
    assert peak == round(float(np.abs(x).max()), 6)
    signs = pcm >= 0
    assert zcr == round(float((signs[1:] != signs[:-1]).mean()), 6)
    assert clip == round(float((np.abs(pcm.astype(np.int32)) >= 32767).mean()), 6)


def test_spark_pipeline_with_corrupt_rows(spark):
    ids = spark.range(0, 40).withColumnRenamed("id", "audio_id")
    table = audio.synth_audio_table(ids)
    # corrupt two payloads: truncate one, garbage the other
    from pyspark.sql import functions as F

    # zero out the sample-rate field of clip 9 (single corrupted byte range)
    blob9 = bytes(
        {r.audio_id: r.bytes for r in table.filter(F.col("audio_id") == 9).collect()}[9]
    )
    i = blob9.index(b"fmt ") + 8 + 4
    sr_zeroed = blob9[:i] + b"\x00\x00\x00\x00" + blob9[i + 4 :]
    corrupted = table.withColumn(
        "bytes",
        F.when(F.col("audio_id") == 3, F.substring("bytes", 1, 20).cast("binary"))
        .when(F.col("audio_id") == 7, F.lit(b"not a wav at all"))
        .when(F.col("audio_id") == 9, F.lit(sr_zeroed))
        .when(F.col("audio_id") == 11, F.lit(None).cast("binary"))
        .otherwise(F.col("bytes")),
    )
    feats = {r.audio_id: r for r in audio.audio_features(corrupted).collect()}
    assert len(feats) == 40
    assert not feats[3].decode_ok and feats[3].rms is None
    assert not feats[7].decode_ok and feats[7].duration_s is None
    assert not feats[9].decode_ok  # zero sample rate must not kill the task
    assert not feats[11].decode_ok  # null payload must not kill the task
    good = [r for r in feats.values() if r.decode_ok]
    assert len(good) == 36
    for r in good:
        n, sr, half, amp, ch = audio.synth_params(r.audio_id)
        assert (r.n_channels, r.sample_rate, r.n_samples) == (ch, sr, n)
        assert r.rms == round(amp / 32768.0, 6)
        assert r.zcr == round(((n - 1) // half) / (n - 1), 6)
