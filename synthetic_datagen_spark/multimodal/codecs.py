"""REAL media codecs, stdlib+numpy only — no PIL/soundfile/ffmpeg.

The driver brief allows stubbing decode because "the image/audio libs
aren't in this container" — but three production formats need no
library at all: 24-bit uncompressed BMP (struct-packed headers + padded
BGR rows), PNG (zlib + struct: IHDR/IDAT/IEND chunks, CRC32, scanline
filters), and 16-bit PCM WAV (RIFF/fmt/data chunks). Implementing them
for real upgrades the multimodal path from "stubbed codec behind real
plumbing" to "real codecs; stub only where a codec genuinely requires
ffmpeg (MP3/video)". Baseline JPEG is also real — see the sibling
``multimodal/jpeg.py`` (DCT + Huffman from scratch, cross-checked
pixel-for-pixel against javax.imageio on a libjpeg-encoded file).

Contracts (all pinned in tests/test_codecs.py):
- ``encode_bmp``/``decode_bmp`` round-trip (h, w, 3) uint8 RGB arrays
  bit-exactly (BI_RGB, bottom-up row order, rows padded to 4 bytes,
  BGR byte order on disk — the classic Windows DIB layout).
- ``encode_png``/``decode_png`` round-trip 8-bit RGB bit-exactly at any
  zlib level; decode reconstructs all five scanline filters (golden
  fixture produced by an independent encoder); ``level=0`` emits
  stored-block IDAT whose byte length is the closed form
  ``png_stored_size(h, w)`` (the SQL-oracle hook).
- ``encode_wav``/``decode_wav`` round-trip int16 mono PCM bit-exactly
  and interoperate with Python's stdlib ``wave`` module in both
  directions.

All are pure functions over bytes, so they slot into the existing
mapInPandas decode stages unchanged (Arrow batch in, numpy out).
"""

from __future__ import annotations

import struct
import zlib

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB -> 8-bit truecolor PNG bytes (IHDR/IDAT/IEND,
    filter type 0 on every scanline, non-interlaced).

    ``level`` is the zlib compression level; level 0 emits STORED
    deflate blocks, making the byte length a closed-form function of
    (h, w) — the property the SQL-oracled codec-roundtrip query needs.
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {px.shape}")
    h, w, _ = px.shape
    # one filter byte (0 = None) prepended to each scanline
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = px.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    # level 0 builds the stored-block stream by hand: zlib.compress(…, 0)
    # also stores, but its block segmentation is an implementation detail
    # (observed <65535-byte blocks), while the oracle needs a closed-form
    # length — full 65535-byte blocks give exactly png_stored_size(h, w)
    idat = (
        _zlib_stored(raw.tobytes()) if level == 0 else zlib.compress(raw.tobytes(), level)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _zlib_stored(data: bytes) -> bytes:
    """A valid zlib stream of uncompressed (BTYPE=00) deflate blocks,
    each the full 65535-byte spec maximum — byte length is a pure
    function of len(data), unlike zlib.compress(…, 0) whose block
    segmentation is an implementation detail."""
    blocks = [data[i : i + 65535] for i in range(0, len(data), 65535)] or [b""]
    out = [b"\x78\x01"]  # CMF/FLG: deflate, 32K window, no preset dict
    for i, blk in enumerate(blocks):
        final = 1 if i == len(blocks) - 1 else 0
        out.append(
            struct.pack("<BHH", final, len(blk), 0xFFFF ^ len(blk)) + blk
        )
    out.append(struct.pack(">I", zlib.adler32(data)))
    return b"".join(out)


def png_stored_size(h: int, w: int) -> int:
    """Exact byte length of ``encode_png(px, level=0)`` for an (h, w, 3)
    image: 8 signature + 25 IHDR + 12 IEND + IDAT chunk overhead + a
    zlib stream of STORED blocks (2 hdr + 4 adler + 5 per <=65535-byte
    block) over h*(1+3w) filtered scanline bytes. Mirrored arithmetic in
    the codec-roundtrip SQL oracle."""
    n = h * (1 + 3 * w)
    n_blocks = max(1, -(-n // 65535))
    idat_len = 2 + 5 * n_blocks + n + 4
    return 8 + 25 + (12 + idat_len) + 12


def decode_png(data: bytes) -> np.ndarray:
    """8-bit truecolor PNG bytes -> (h, w, 3) uint8 RGB array.

    Full filter reconstruction (types 0-4 incl. Paeth), multi-IDAT
    concatenation, per-chunk CRC verification — so PNGs from other
    encoders decode too (golden-fixture-pinned in tests). Non-interlaced
    8-bit RGB (color type 2) only; anything else raises ValueError, the
    same contract as decode_bmp.
    """
    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            # second clause: chunk body present but the 4 CRC bytes are
            # cut off — still a truncation, not a struct.error
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != zlib.crc32(ctype + body):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color != 2 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} color={color} interlace={interlace}"
        )
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = 1 + w * 3
    if raw.size != h * stride:
        raise ValueError("PNG scanline data size mismatch")
    raw = raw.reshape(h, stride)
    bpp = 3  # bytes per pixel (filters operate at byte distance bpp)
    out = np.zeros((h, w * 3), dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(w * 3, dtype=np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a left scan
            rec = np.zeros(w * 3, dtype=np.int32)
            for x in range(w * 3):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    rec[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (line[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, 3)


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
