"""Real baseline JPEG codec (operators/jpegcodec.py, ITU-T T.81):
round-trip fidelity against the input-hint PSNR≥40 dB lossy invariant,
stream well-formedness, decoder hardening, and the imagecodec dispatch
that keeps legacy fake-jpeg payloads decodable."""

from __future__ import annotations

import numpy as np
import pytest

from secretscraper_spark.operators import imagecodec
from secretscraper_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
)


def _noise(seed, w, h):
    return imagecodec.pixels_for(seed, w, h)


def _gradient(w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)


def test_roundtrip_noise_q100_clears_lossy_invariant():
    """Uniform noise is JPEG's worst case; the store encodes at q100,
    which must clear 40 dB while remaining genuinely lossy (coefficient
    quantization + YCbCr rounding both survive at q100)."""
    px = _noise(42, 64, 48)
    got = decode_jpeg(encode_jpeg(px, quality=100))
    p = imagecodec.psnr(px, got)
    assert 40.0 <= p < np.inf
    assert got.shape == px.shape
    assert not np.array_equal(got, px)  # lossy, not accidentally exact


def test_roundtrip_smooth_content_moderate_quality():
    px = _gradient(56, 40)
    got = decode_jpeg(encode_jpeg(px, quality=75))
    assert imagecodec.psnr(px, got) >= 40.0


def test_quality_monotone_on_noise():
    px = _noise(7, 32, 32)
    psnrs = [
        imagecodec.psnr(px, decode_jpeg(encode_jpeg(px, quality=q)))
        for q in (50, 75, 90, 100)
    ]
    assert psnrs == sorted(psnrs)


def test_non_multiple_of_8_dims_and_determinism():
    px = _noise(9, 33, 21)
    d1 = encode_jpeg(px, quality=95)
    d2 = encode_jpeg(px, quality=95)
    assert d1 == d2
    got = decode_jpeg(d1)
    assert got.shape == (21, 33, 3)


def test_stream_well_formed():
    """Real JFIF markers: SOI/EOI framing, APP0 JFIF, and the existing
    zero-decode sniffer reads fmt+dims straight off the stream."""
    from secretscraper_spark.operators.imagesniff import sniff_header

    data = encode_jpeg(_noise(3, 40, 24), quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in data[:32]
    assert sniff_header(data) == ("jpeg", 40, 24)


def test_decoder_reads_tables_from_stream():
    """The decoder builds quant/Huffman tables from DQT/DHT segments —
    quality changes the in-stream tables and both ends must agree."""
    px = _noise(5, 24, 24)
    for q in (55, 80, 100):
        got = decode_jpeg(encode_jpeg(px, quality=q))
        assert got.shape == px.shape


def test_decoder_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    # progressive SOF2 must be refused, not mis-decoded
    data = bytearray(encode_jpeg(_noise(1, 16, 16), quality=90))
    sof = bytes(data).find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))
    # truncated entropy segment
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(bytes(encode_jpeg(_noise(2, 32, 32), quality=90))[:-40])


def test_encode_image_dispatch_real_and_legacy_fake():
    """imagecodec.encode_image('jpeg') now emits real JFIF; decode_image
    dispatches on magic so legacy FJPG payloads keep decoding."""
    px = _noise(11, 32, 16)
    real = imagecodec.encode_image(px, "jpeg")
    assert real[:2] == b"\xff\xd8"
    got = imagecodec.decode_image(real, "jpeg")
    assert imagecodec.psnr(px, got) >= 40.0
    legacy = imagecodec.encode_fake_jpeg(px)
    got_legacy = imagecodec.decode_image(legacy, "jpeg")
    assert 40.0 <= imagecodec.psnr(px, got_legacy) < 60.0
