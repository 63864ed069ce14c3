"""REAL media codecs, stdlib+numpy only — no PIL/soundfile/ffmpeg.

The driver brief allows stubbing decode because "the image/audio libs
aren't in this container" — but two production formats need no library
at all: 24-bit uncompressed BMP (struct-packed headers + padded BGR
rows) and 16-bit PCM WAV (RIFF/fmt/data chunks). Implementing them for
real upgrades the multimodal path from "stubbed codec behind real
plumbing" to "real codec for BMP/WAV, stub only where a codec genuinely
requires libjpeg/ffmpeg".

Contracts:
- ``encode_bmp``/``decode_bmp`` round-trip (h, w, 3) uint8 RGB arrays
  bit-exactly (BI_RGB, bottom-up row order, rows padded to 4 bytes,
  BGR byte order on disk — the classic Windows DIB layout).
- ``encode_wav``/``decode_wav`` round-trip int16 mono PCM bit-exactly
  and interoperate with Python's stdlib ``wave`` module in both
  directions (pinned in tests/test_multimodal.py).

Both are pure functions over bytes, so they slot into the existing
mapInPandas decode stages unchanged (Arrow batch in, numpy out).
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_FILE_HDR = "<2sIHHI"   # magic, file size, 2 reserved, pixel offset
_BMP_INFO_HDR = "<IiiHHIIiiII"  # BITMAPINFOHEADER (40 bytes)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {px.shape}")
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    pixel_offset = 14 + 40
    # bottom-up rows, BGR channel order, zero row padding
    bgr = px[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    header = struct.pack(
        _BMP_FILE_HDR, b"BM", pixel_offset + img_size, 0, 0, pixel_offset
    ) + struct.pack(
        _BMP_INFO_HDR, 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 RGB array.

    Raises ValueError on wrong magic, compression, or bit depth — the
    behavior a corrupt-file path needs (the stub raised the same way).
    """
    if len(data) < 54:
        raise ValueError("truncated BMP (shorter than headers)")
    magic, _file_size, _r1, _r2, pixel_offset = struct.unpack_from(
        _BMP_FILE_HDR, data, 0
    )
    if magic != b"BM":
        raise ValueError(f"not a BMP (magic {magic!r})")
    (
        hdr_size, w, h, _planes, bpp, compression,
        _img_size, _xppm, _yppm, _clr, _imp,
    ) = struct.unpack_from(_BMP_INFO_HDR, data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if compression != 0 or bpp != 24:
        raise ValueError(f"unsupported BMP: compression={compression} bpp={bpp}")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    need = pixel_offset + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pixel_offset)
    bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono PCM samples -> RIFF/WAVE bytes (fmt + data chunks)."""
    pcm = np.asarray(samples, dtype="<i2")
    if pcm.ndim != 1:
        raise ValueError(f"expected 1-D mono samples, got shape {pcm.shape}")
    data = pcm.tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    out = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return out


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes -> (sample_rate, int16 mono samples).

    Walks the chunk list (tolerates extra chunks like LIST/fact, and
    fmt extensions), so files written by other encoders — e.g. the
    stdlib ``wave`` module — parse too. PCM 16-bit mono only.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt_tag, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={fmt_tag} channels={channels} bits={bits}"
                )
        elif cid == b"data":
            pcm = np.frombuffer(body, dtype="<i2").copy()
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    return int(sample_rate), pcm
