"""Baseline-sequential JPEG codec in pure numpy + stdlib (no codec
library) — retires the last image-format stub in the ``decode="real"``
multimodal path (VERDICT r3 next-round #6).

Coverage (the dominant real-world profile):

- **decode**: baseline sequential DCT (SOF0), 8-bit, 1 or 3
  components, any of the standard chroma samplings (4:4:4 / 4:2:2 /
  4:2:0 — any Hi/Vi ≤ 4 actually), Huffman tables FROM THE FILE's own
  DHT segments (so interop does not depend on the Annex K constants
  below), restart markers (DRI/RSTn), APPn/COM skipped. Progressive
  (SOF2), arithmetic coding, 12-bit and hierarchical raise
  NotImplementedError with the exact reason.
- **encode**: baseline sequential, quality-scaled Annex K quantization
  tables, the standard Annex K Huffman tables (emitted as DHT, so any
  decoder — ours included — reads codes from the stream), 4:4:4 or
  4:2:0. Exists so fixtures can ROUND-TRIP the decoder without any
  external library: decode(encode(x, quality=95)) must sit within the
  quantization error of x (JPEG is lossy — the tests pin PSNR, and pin
  component math — zigzag, IDCT, Huffman canonicalization — against
  the spec recurrences directly).

Scale note: this codec is the per-asset kernel behind an Arrow-batched
``mapInPandas`` (multimodal.extract_features) — per-row Python is the
accepted cost there (CLAUDE.md: numpy-shaped kernels only), and the
entropy loop is per-symbol Python while the IDCT/color math is
vectorized per block batch. Swapping in a C codec changes only this
module, nothing in any plan.

Reference parity: the reference treats payloads as opaque bytes
(`CassandraEventStore.cs:211`); this whole surface is part of the
driver-mandated LLM-pipeline extension, not core parity.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# ---------------------------------------------------------------------
# Spec constants
# ---------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """Scan-order → linear (r*8+c) index map, generated from the spec
    rule (diagonals alternate direction) rather than typed by hand."""
    idx = []
    for s in range(15):
        rs = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rs if s % 2 == 1 else reversed(list(rs))):
            idx.append(r * 8 + (s - r))
    return np.array(idx, dtype=np.int64)


_ZZ = _zigzag()          # zigzag position i holds linear index _ZZ[i]
_UNZZ = np.argsort(_ZZ)  # linear index j sits at zigzag position _UNZZ[j]

# Annex K.1/K.2 quantization tables (row-major)
_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K.3-K.6 Huffman table specs: (BITS[1..16], HUFFVAL). The DC
# value lists are the categories 0..11; the AC lists are exactly the
# 162 (run,size) symbols — set-completeness is asserted by tests, and
# correctness of the ORDER only affects compression ratio, never
# validity: every emitted stream carries its tables in DHT.
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
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
     0xF9, 0xFA],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
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
     0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: F = C·X·Cᵀ reproduces the
    JPEG FDCT (¼·c(u)c(v)·Σ… with c(0)=1/√2) exactly; X = Cᵀ·F·C is
    the IDCT."""
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the JPEG canonical-code recurrence
    (Annex C): codes of each length are consecutive, starting from
    double the previous length's end."""
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


def _fast_table(bits: list[int], vals: list[int]):
    """Peek-ahead Huffman tables: (symbol, length) arrays indexed by
    the next 16 stream bits. Every canonical code of length L owns the
    2^(16−L) table slots sharing its L-bit prefix, so decoding is ONE
    table lookup instead of a bit-by-bit trie walk — the optimization
    that took the pure-python entropy loop from ~140 to several
    hundred assets/s in the multimodal smoke. length 0 marks invalid
    prefixes."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    for s, (code, length) in _canonical_codes(bits, vals).items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        sym[lo:hi] = s
        ln[lo:hi] = length
    return sym, ln


def _magnitude(v: int) -> tuple[int, int]:
    """DC-diff/AC-coefficient amplitude coding: (category, extra bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _extend(bits_val: int, size: int) -> int:
    """Inverse of ``_magnitude``: sign-extend a SIZE-bit amplitude."""
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


# ---------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad to byte with 1s
        self._acc, self._n = 0, 0


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's linear quality scaling of the Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _block_dctq(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Plane (H,W multiple of 8) → (H//8, W//8, 64) zigzagged
    quantized int coefficients, all blocks in one einsum."""
    hh, ww = plane.shape
    blocks = (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
        - 128.0
    )
    coef = np.einsum("ux,nmxy,vy->nmuv", _C, blocks, _C)
    q = np.round(coef / qt.reshape(8, 8)).astype(np.int64)
    return q.reshape(hh // 8, ww // 8, 64)[..., _ZZ]


def _encode_block(
    out: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    dc = int(zz[0])
    size, extra = _magnitude(dc - pred)
    code, length = dc_codes[size]
    out.put(code, length)
    if size:
        out.put(extra, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            out.put(code, length)
            run -= 16
        size, extra = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        out.put(code, length)
        out.put(extra, size)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        out.put(code, length)
    return dc


def encode_jpeg(
    pixels: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF JPEG. ``subsample=True``
    writes 4:2:0 (2×2 box-filtered chroma), else 4:4:4."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) pixels, got {pixels.shape}")
    h, w = pixels.shape[:2]
    ycc = _rgb_to_ycbcr(pixels.astype(np.float64))
    qt_l = _scaled_qt(_QT_LUM, quality)
    qt_c = _scaled_qt(_QT_CHROM, quality)

    if subsample:
        y = _pad_to(ycc[..., 0], 16)
        cpad = _pad_to(ycc[..., 1], 2), _pad_to(ycc[..., 2], 2)
        chroma = [
            _pad_to(
                p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
                .mean(axis=(1, 3)),
                8,
            )
            for p in cpad
        ]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        y = _pad_to(ycc[..., 0], 8)
        chroma = [_pad_to(ycc[..., 1], 8), _pad_to(ycc[..., 2], 8)]
        samp = [(1, 1), (1, 1), (1, 1)]

    zz_y = _block_dctq(y, qt_l)
    zz_cb = _block_dctq(chroma[0], qt_c)
    zz_cr = _block_dctq(chroma[1], qt_c)

    dc_l = _canonical_codes(*_DC_LUM)
    ac_l = _canonical_codes(*_AC_LUM)
    dc_c = _canonical_codes(*_DC_CHROM)
    ac_c = _canonical_codes(*_AC_CHROM)

    out = _BitWriter()
    preds = [0, 0, 0]
    mcus_y = zz_cb.shape[0]
    mcus_x = zz_cb.shape[1]
    hy, vy = samp[0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(vy):
                for bx in range(hy):
                    preds[0] = _encode_block(
                        out, zz_y[my * vy + by, mx * hy + bx],
                        preds[0], dc_l, ac_l,
                    )
            preds[1] = _encode_block(
                out, zz_cb[my, mx], preds[1], dc_c, ac_c
            )
            preds[2] = _encode_block(
                out, zz_cr[my, mx], preds[2], dc_c, ac_c
            )
    out.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    jfif = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(
        0xFFDB,
        b"\x00" + qt_l.reshape(-1)[_ZZ].astype(np.uint8).tobytes()
        + b"\x01" + qt_c.reshape(-1)[_ZZ].astype(np.uint8).tobytes(),
    )
    sof_comps = b""
    for cid, (hs, vs), tq in zip((1, 2, 3), samp, (0, 1, 1)):
        sof_comps += bytes([cid, (hs << 4) | vs, tq])
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3) + sof_comps)

    def dht(cls: int, tid: int, spec: tuple) -> bytes:
        bits, vals = spec
        return seg(
            0xFFC4,
            bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals),
        )

    dhts = (
        dht(0, 0, _DC_LUM) + dht(1, 0, _AC_LUM)
        + dht(0, 1, _DC_CHROM) + dht(1, 1, _AC_CHROM)
    )
    sos = seg(
        0xFFDA,
        b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00",
    )
    return (
        b"\xff\xd8" + jfif + dqt + sof + dhts + sos
        + bytes(out.buf) + b"\xff\xd9"
    )


# ---------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over one entropy segment (stuffing removed).

    Byte-accumulator design: bits live in a small python int refilled a
    byte at a time, so every read/peek is two shifts and a mask — no
    per-bit numpy indexing (the original unpackbits walker was the
    decode bottleneck). Past the segment end the accumulator refills
    with 1-bits (the encoder's flush padding), letting the final
    block's peek-ahead run off the end legally; consuming more than 16
    REAL padding bits means the stream was truncated."""

    __slots__ = ("_data", "_len", "_i", "_acc", "_n", "_pad")

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._len = len(data)
        self._i = 0
        self._acc = 0
        self._n = 0
        self._pad = 0  # synthetic padding bits pulled into the acc

    def _ensure(self, n: int) -> None:
        while self._n < n:
            if self._i < self._len:
                self._acc = (self._acc << 8) | self._data[self._i]
                self._i += 1
            else:
                self._acc = (self._acc << 8) | 0xFF
                self._pad += 8
            self._n += 8

    def _consumed_padding(self) -> int:
        """Real padding bits consumed so far (pad pulled minus pad
        still sitting unconsumed in the accumulator)."""
        return max(0, self._pad - min(self._n, self._pad))

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._ensure(n)
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        if self._consumed_padding() > 16:
            raise ValueError("truncated JPEG entropy data")
        return v

    def symbol(self, table) -> int:
        sym, ln = table
        self._ensure(16)
        idx = (self._acc >> (self._n - 16)) & 0xFFFF
        length = ln[idx]
        if length == 0:
            raise ValueError("invalid Huffman code in JPEG stream")
        self._n -= length
        self._acc &= (1 << self._n) - 1
        if self._consumed_padding() > 16:
            raise ValueError("truncated JPEG entropy data")
        return int(sym[idx])


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``start``: de-stuff 0xFF00, split on
    RSTn (restart-interval boundaries), stop at any other marker."""
    segments: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, 3) uint8 RGB (grayscale replicated).
    See the module docstring for the exact supported profile."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    i = 2
    n = len(payload)
    scan = None
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError(f"marker expected at offset {i}")
        if payload[i + 1] == 0xFF:  # fill bytes before a marker
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        (size,) = struct.unpack_from(">H", payload, i + 2)
        body = payload[i + 4 : i + 2 + size]
        i += 2 + size
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=p + 1
                ).astype(np.float64)
                lin = np.empty(64)
                lin[_ZZ] = tbl  # stored zigzagged → linear
                qts[tq] = lin.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(body[p + 17 : p + 17 + cnt])
                huff[(cls, tid)] = _fast_table(bits, vals)
                p += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext. seq.
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for k in range(nc):
                cid, hv, tq = body[6 + 3 * k : 9 + 3 * k]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is "
                f"supported, got SOF marker 0xFF{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for k in range(ns):
                cid, tabs = body[1 + 2 * k], body[2 + 2 * k]
                scan.append((cid, tabs >> 4, tabs & 0x0F))
            segments, i = _split_entropy(payload, i)
            break
        # APPn / COM / others: skipped
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS segment")

    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    by_id = {c[0]: c for c in comps}

    planes = {}
    coefs = {}
    for cid, hs, vs, tq in comps:
        coefs[cid] = np.zeros(
            (mcus_y * vs, mcus_x * hs, 64), dtype=np.float64
        )

    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    preds = {c[0]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                reader = _BitReader(next(seg_iter))
                preds = {c[0]: 0 for c in comps}
            for cid, dc_id, ac_id in scan:
                _, hs, vs, tq = by_id[cid]
                dc_tab = huff[(0, dc_id)]
                ac_tab = huff[(1, ac_id)]
                for by in range(vs):
                    for bx in range(hs):
                        zz = [0.0] * 64  # python list: scalar stores
                        size = reader.symbol(dc_tab)
                        diff = _extend(reader.read(size), size)
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = reader.symbol(ac_tab)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            s = rs & 0x0F
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(reader.read(s), s)
                            k += 1
                        coefs[cid][my * vs + by, mx * hs + bx] = zz
            mcu_count += 1

    for cid, hs, vs, tq in comps:
        zz = coefs[cid]
        lin = np.zeros_like(zz)
        lin[..., _ZZ] = zz  # zigzag position i → linear _ZZ[i]
        blocks = lin.reshape(*lin.shape[:2], 8, 8) * qts[tq]
        spatial = np.einsum("xu,nmuv,yv->nmxy", _C.T, blocks, _C.T) + 128.0
        hh, ww = lin.shape[0] * 8, lin.shape[1] * 8
        plane = spatial.transpose(0, 2, 1, 3).reshape(hh, ww)
        plane = np.repeat(
            np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
        )
        planes[cid] = plane[:fh, :fw]

    if len(comps) == 1:
        y = np.clip(planes[comps[0][0]], 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    y = planes[comps[0][0]]
    cb = planes[comps[1][0]] - 128.0
    cr = planes[comps[2][0]] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
