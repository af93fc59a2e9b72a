"""Image channel: encode/decode/PSNR/phash for the image+caption store.

The input_hint mandates ``bytes:binary`` image payloads with a per-row
invariant: decoded-pixel allclose (PSNR≥40 dB for lossy fmt). No image
library (PIL etc.) is installed in this container, so both codecs are
pure Python/numpy from the public specs:

- ``png``  — REAL minimal RGB8 PNG codec (zlib + CRC), lossless: decode
  returns the exact pixel array (PSNR = ∞).
- ``jpeg`` — REAL baseline sequential JFIF codec (operators/jpegcodec.py,
  ITU-T T.81: DCT + Annex-K quant/Huffman tables, FFD8…FFD9 streams any
  external decoder can read). Encoded at quality 100 — the store's
  ground truth is uniform-noise pixels, JPEG's worst case, and lower
  qualities dip under the 40 dB invariant on noise (q97 ≈ 40.3 dB,
  q100 ≈ 53 dB; still genuinely lossy: coefficient quantization and
  YCbCr rounding both survive). The historical clearly-marked fake
  (``FJPG`` magic, 5-bit quantizer) remains decodable for legacy
  payloads and keeps its encode_fake_jpeg surface for tests.

All functions operate on numpy uint8 arrays of shape (h, w, 3) and are
called only from Arrow-batched UDFs / the generator — never per-row Python
in Spark's hot path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FJPG_MAGIC = b"FJPG"  # fake-jpeg container marker


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: np.ndarray, text_chunks: dict[str, str] | None = None
) -> bytes:
    """Minimal RGB8 PNG (filter type 0 per scanline). ``text_chunks``
    optionally embeds tEXt metadata (PNG 1.2 §4.2.3: ``keyword\\0value``,
    latin-1) after IHDR, sorted by keyword for determinism — the standard
    place camera/export software leaves Comment/Software/Author strings
    (and, in the wild, leaked credentials — see
    multimodal.secrets_from_image_metadata). Omitted → byte-identical to
    the historical encoder output."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    raw = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 1:] = pixels.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    texts = b"".join(
        _chunk(b"tEXt", k.encode("latin-1") + b"\x00" + v.encode("latin-1"))
        for k, v in sorted((text_chunks or {}).items())
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + texts
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def png_text_chunks(data: bytes) -> list[tuple[str, str]]:
    """Decode tEXt metadata from a PNG: walk the chunk list, collect
    ``(keyword, value)`` pairs in chunk order (latin-1). A LIST, not a
    dict: PNG 1.2 explicitly permits repeated keywords (multi-tool export
    pipelines stack Comment chunks) and a dict would silently drop all but
    the last — a recall hole for the metadata secret scan. Unknown/
    ancillary chunks are skipped; malformed input raises ValueError
    (callers degrade per row)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    out: list[tuple[str, str]] = []
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) < length:
            raise ValueError("truncated chunk")
        if tag == b"tEXt":
            key, _, val = payload.partition(b"\x00")
            out.append((key.decode("latin-1"), val.decode("latin-1")))
        if tag == b"IEND":
            break
        pos += 12 + length  # len + tag + payload + crc
    return out


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            assert bit_depth == 8 and color_type == 2, "minimal codec: RGB8 only"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    assert (raw[:, 0] == 0).all(), "minimal codec: filter type 0 only"
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_fake_jpeg(pixels: np.ndarray) -> bytes:
    """DETERMINISTIC FAKE lossy codec (see module docstring)."""
    h, w, _ = pixels.shape
    quant = (pixels >> 3).astype(np.uint8)  # 5 bits/channel
    return (
        _FJPG_MAGIC
        + struct.pack(">II", w, h)
        + zlib.compress(quant.tobytes(), 6)
    )


def decode_fake_jpeg(data: bytes) -> np.ndarray:
    assert data[:4] == _FJPG_MAGIC, "not a fake-jpeg"
    w, h = struct.unpack(">II", data[4:12])
    quant = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    # dequantize to bucket midpoint: x*8 + 4 caps error at ±4 → PSNR ≈ 46 dB
    return (quant.astype(np.uint16) * 8 + 4).clip(0, 255).astype(np.uint8)


# store-wide JPEG quality: see module docstring (noise ground truth needs
# q100 to clear the 40 dB lossy invariant; still a true lossy round trip)
JPEG_QUALITY = 100


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        # dispatch on magic: real JFIF streams start FFD8; legacy fake
        # payloads carry the explicit FJPG marker
        if data[:2] == b"\xff\xd8":
            from .jpegcodec import decode_jpeg

            return decode_jpeg(data)
        return decode_fake_jpeg(data)
    raise NotImplementedError(f"fmt {fmt!r}: real decoders not available in this container")


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        from .jpegcodec import encode_jpeg

        return encode_jpeg(pixels, quality=JPEG_QUALITY)
    raise NotImplementedError(f"fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(pixels: np.ndarray) -> int:
    """Deterministic 64-bit average-hash: grayscale → 8×8 block means →
    bit = mean > global mean. Signed int64 (Spark LongType)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    blocks = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).astype(np.uint64).flatten()
    val = np.uint64(0)
    for bit in bits:
        val = (val << np.uint64(1)) | bit
    return int(val.astype(np.int64))


def pixels_for(seed: int, w: int, h: int) -> np.ndarray:
    """Seeded deterministic pixel array — the generator's ground truth."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
