"""Pure-Python/numpy baseline JPEG (JFIF) codec — REAL lossy channel.

Closes the input-hint invariant end-to-end: "decoded-pixel allclose
(PSNR≥40 dB for lossy fmt)" previously ran against a clearly-marked fake
quantizer because no image library ships in this container; this module
implements the actual ITU-T T.81 baseline sequential DCT process from
the public spec, so the image+caption store carries genuine JPEG bytes
(FFD8 … FFD9) that any external decoder can read.

Encoder (encode_jpeg):
- RGB → JFIF full-range YCbCr, 4:4:4 (no chroma subsampling — keeps the
  MCU one 8×8 block per component and maximizes fidelity; the north-rule
  invariant is PSNR, not bitrate).
- 8×8 forward DCT as one numpy tensor contraction over ALL blocks at
  once (the orthonormal DCT-II matrix equals the T.81 A.3.3 FDCT).
- Annex-K quantization tables scaled by libjpeg's quality curve
  (quality ≥ 50 → scale (200−2q)%, clamp 1..255).
- Annex-K standard Huffman tables (K.3.3), DC difference + AC
  run/size coding, ZRL/EOB, byte stuffing (FF → FF 00).

Decoder (decode_jpeg):
- Parses DQT/DHT/SOF0/SOS/DRI from the stream (tables are read from the
  bytes, NOT assumed — a stream with custom tables decodes correctly),
  canonical Huffman decode, dequant, inverse zigzag, IDCT, YCbCr → RGB.
- Baseline sequential, 8-bit, 1 or 3 components, 1×1 sampling only
  (what this encoder emits); anything else raises ValueError — callers
  degrade per row (multimodal funnel contract).

Everything is deterministic; the codec is exercised per Arrow batch
(mapInPandas) — never per-row Python in a Catalyst expression.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables (public ITU-T T.81) -------------------------------------

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.intp)
UNZIGZAG = np.argsort(ZIGZAG)

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix == T.81 A.3.3 FDCT scaling
_DCT = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality curve (jcparam.c, public): q<50 → 5000/q %, else
    (200−2q)%; each entry floor((t·scale+50)/100) clamped to 1..255."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUM, QUANT_CHROM):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _blocks_of(chan: np.ndarray) -> np.ndarray:
    """(h, w) → (n_blocks_y, n_blocks_x, 8, 8), edge-padded to 8-multiples."""
    h, w = chan.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        chan = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    hh, ww = chan.shape
    return chan.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): value → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, amplitude bits): negatives in one's complement."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(pixels: np.ndarray, quality: int = 97) -> bytes:
    """Baseline sequential JFIF, 4:4:4, standard Huffman tables."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8")
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("bad dimensions")
    qlum, qchrom = _scaled_tables(quality)
    ycc = _rgb_to_ycbcr(pixels)

    dc_tabs = (_huff_codes(DC_LUM_BITS, DC_LUM_VALS),
               _huff_codes(DC_CHROM_BITS, DC_CHROM_VALS))
    ac_tabs = (_huff_codes(AC_LUM_BITS, AC_LUM_VALS),
               _huff_codes(AC_CHROM_BITS, AC_CHROM_VALS))

    # quantized zigzag coefficients per component, all blocks vectorized
    comp_zz = []
    for ci in range(3):
        blocks = _blocks_of(ycc[..., ci] - 128.0)
        coeffs = np.einsum("ux,byxw,vw->byuv", _DCT, blocks, _DCT)
        qt = qlum if ci == 0 else qchrom
        quant = np.round(coeffs / qt).astype(np.int32)
        nby, nbx = quant.shape[:2]
        zz = quant.reshape(nby * nbx, 64)[:, ZIGZAG]
        comp_zz.append(zz)

    bw = _BitWriter()
    n_blocks = comp_zz[0].shape[0]
    pred = [0, 0, 0]
    for b in range(n_blocks):
        for ci in range(3):
            tsel = 0 if ci == 0 else 1
            dct = dc_tabs[tsel]
            act = ac_tabs[tsel]
            zz = comp_zz[ci][b]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            code, length = dct[size]
            bw.write(code, length)
            if size:
                bw.write(bits, size)
            run = 0
            last_nz = 0
            nz = np.nonzero(zz[1:])[0]
            last_nz = int(nz[-1]) + 1 if len(nz) else 0
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = act[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = act[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if last_nz < 63:
                code, length = act[0x00]  # EOB
                bw.write(code, length)
    bw.flush()

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return _seg(0xDB, bytes([tid]) + bytes(
            int(x) for x in table.reshape(64)[ZIGZAG]
        ))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = _seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x11, 0])    # Y: 1×1 sampling, qtable 0
               + bytes([2, 0x11, 1])    # Cb
               + bytes([3, 0x11, 1]))   # Cr
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    return (
        b"\xff\xd8" + app0
        + dqt(0, qlum) + dqt(1, qchrom)
        + sof
        + dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
        + dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
        + dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        + dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
        + sos + bytes(bw.buf) + b"\xff\xd9"
    )


# --- decoder -----------------------------------------------------------------

class _BitReader:
    """Entropy-segment reader: un-stuffs FF 00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            # past a marker: feed 0 bits (spec: decoder completes on EOI)
            self.acc = (self.acc << 8)
            self.nbits += 8
            return
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline sequential 4:4:4 (or grayscale) JFIF → (h,w,3)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtab)
    scan: list[tuple[int, int, int]] = []   # (id, dc_tab, ac_tab)
    restart_interval = 0
    br = None
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("desynced marker stream")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        seg = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                count = sum(bits)
                vals = list(seg[i + 17:i + 17 + count])
                htables[(cls, tid)] = _huff_decode_table(bits, vals)
                i += 17 + count
        elif marker == 0xC0 or marker == 0xC1:
            precision, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("8-bit baseline only")
            if nc not in (1, 3):
                raise ValueError("1 or 3 components only")
            comps = []
            for ci in range(nc):
                cid, samp, qtab = seg[6 + 3 * ci:9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("1x1 sampling only (4:4:4)")
                comps.append((cid, samp, qtab))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("baseline sequential only")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            scan = []
            for si in range(ns):
                cid = seg[1 + 2 * si]
                tabs = seg[2 + 2 * si]
                scan.append((cid, tabs >> 4, tabs & 0xF))
            br = _BitReader(data, pos + 2 + seglen)
            break
        pos += 2 + seglen
    if br is None or not comps:
        raise ValueError("no scan found")

    nby, nbx = (h + 7) // 8, (w + 7) // 8
    nc = len(comps)
    out = np.zeros((nc, nby * 8, nbx * 8), dtype=np.float64)
    pred = [0] * nc
    comp_by_id = {cid: i for i, (cid, _, _) in enumerate(comps)}
    scan_order = [(comp_by_id[cid], dc, ac) for cid, dc, ac in scan]
    mcu = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # re-align to the RSTn marker, reset predictors
                if br.marker is None:
                    # skip pad bits to the marker boundary
                    while br.marker is None:
                        br.read_bit()
                if 0xD0 <= (br.marker or 0) <= 0xD7:
                    br = _BitReader(br.data, br.pos + 1)
                    pred = [0] * nc
            mcu += 1
            for ci, dc_tid, ac_tid in scan_order:
                dct = htables[(0, dc_tid)]
                act = htables[(1, ac_tid)]
                zz = np.zeros(64, dtype=np.int32)
                size = _read_symbol(br, dct)
                diff = _extend(br.read_bits(size), size) if size else 0
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = _read_symbol(br, act)
                    run, size = rs >> 4, rs & 0xF
                    if size == 0:
                        if run == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError("AC index overflow")
                    zz[k] = _extend(br.read_bits(size), size)
                    k += 1
                qt = qtables[comps[ci][2]]
                block = (zz[UNZIGZAG].reshape(8, 8) * qt).astype(np.float64)
                spatial = _DCT.T @ block @ _DCT + 128.0
                out[ci, by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = spatial
    out = out[:, :h, :w]
    if nc == 1:
        y = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    ycc = np.stack([out[0], out[1], out[2]], axis=-1)
    return _ycbcr_to_rgb(ycc)
