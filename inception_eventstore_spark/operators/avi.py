"""Pure-python AVI (RIFF) container codec for Motion-JPEG video.

Retires the last multimodal decode stub: MP4/H.264 genuinely needs an
external codec library, but AVI/MJPEG — the classic self-describing
video format (every frame is an independent baseline JPEG) — is fully
decodable with the in-repo JPEG codec (`operators/jpeg.py`) plus ~100
lines of RIFF chunk walking. That gives the engine a REAL end-to-end
video path: container parse → frame extraction → per-frame image
decode → features, with no native dependency.

Two deliberate properties for the 100 TB pipeline:

- **Frame extraction does not decode.** MJPEG frames are stored JPEG
  streams, so sampling frames out of a video is pure chunk slicing —
  the expensive IDCT work happens only on the frames a downstream
  image kernel actually consumes.
- **Encode half for fixtures.** `encode_avi_mjpeg` writes a standard
  AVI (hdrl/avih/strl/strh/strf + movi + idx1) that external players
  accept, so round-trip tests pin the byte-level format, same policy
  as the PPM/PNG/WAV/JPEG codecs.

Reference analog: the event store treats payloads as opaque bytes
(`CassandraEventStore.cs:211`); decode fidelity is an extension
surface, not core parity.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_avi_mjpeg",
    "decode_avi_mjpeg",
    "extract_mjpeg_frames",
    "avi_info",
]


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    """RIFF chunk: fourcc + size + data, padded to even length."""
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", list_type + data)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 90
) -> bytes:
    """(h, w, 3) uint8 frames → AVI/MJPEG bytes (one 'vids' stream,
    fccHandler MJPG, each frame an in-repo baseline JPEG)."""
    from inception_eventstore_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("at least one frame required")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one size")
    if fps < 1:
        raise ValueError("fps must be >= 1")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(jpegs)
    us_per_frame = 1_000_000 // int(fps)

    avih = struct.pack(
        "<14I",
        us_per_frame,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max(len(j) for j in jpegs),  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<10I4H",
            0,  # dwFlags
            0,  # wPriority + wLanguage (packed as one I here is wrong)
            0,  # dwInitialFrames
            1,  # dwScale
            int(fps),  # dwRate → fps = rate/scale
            0,  # dwStart
            n,  # dwLength
            max(len(j) for j in jpegs),  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality
            0,  # dwSampleSize
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        struct.unpack("<I", b"MJPG")[0],  # biCompression
        w * h * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_chunks)
    # idx1: one entry per frame (fourcc, flags=KEYFRAME, offset, size);
    # offsets are relative to the start of 'movi' list data (the
    # common convention)
    idx, off = [], 4  # 4 = len(b"movi")
    for j in jpegs:
        idx.append(b"00dc" + struct.pack("<3I", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, data_start, data_len) for chunks in buf[pos:end]."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def avi_info(payload: bytes) -> dict:
    """Parsed AVI stream metadata: width/height/fps/n_frames/handler.
    Raises ValueError on a non-AVI payload."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    info: dict = {}

    def walk(pos: int, end: int) -> None:
        for fourcc, dstart, dlen in _walk_chunks(payload, pos, end):
            if fourcc == b"LIST":
                walk(dstart + 4, dstart + dlen)
            elif fourcc == b"avih":
                vals = struct.unpack_from("<14I", payload, dstart)
                info["n_frames"] = vals[4]
                info["width"] = vals[8]
                info["height"] = vals[9]
            elif fourcc == b"strh" and payload[dstart : dstart + 4] == b"vids":
                info["handler"] = payload[dstart + 4 : dstart + 8].decode(
                    "ascii", "replace"
                )
                scale, rate = struct.unpack_from("<2I", payload, dstart + 20)
                info["fps"] = rate / scale if scale else 0.0

    walk(12, len(payload))
    if "n_frames" not in info:
        raise ValueError("AVI payload carries no avih header")
    return info


def extract_mjpeg_frames(payload: bytes) -> list[bytes]:
    """Video-stream frame payloads ('00dc'/'00db' chunks inside the
    movi list) as raw JPEG byte strings — NO pixel decode happens
    here, so sampling is chunk slicing only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []

    def walk(pos: int, end: int, in_movi: bool) -> None:
        for fourcc, dstart, dlen in _walk_chunks(payload, pos, end):
            if fourcc == b"LIST":
                ltype = payload[dstart : dstart + 4]
                walk(dstart + 4, dstart + dlen, in_movi or ltype == b"movi")
            elif in_movi and fourcc[2:4] in (b"dc", b"db"):
                frames.append(bytes(payload[dstart : dstart + dlen]))

    walk(12, len(payload), False)
    return frames


def decode_avi_mjpeg(payload: bytes) -> tuple[list[np.ndarray], float]:
    """AVI/MJPEG bytes → (decoded (h, w, 3) uint8 frames, fps)."""
    from inception_eventstore_spark.operators.jpeg import decode_jpeg

    info = avi_info(payload)
    return [decode_jpeg(j) for j in extract_mjpeg_frames(payload)], float(
        info.get("fps") or 0.0
    )
