"""Real-codec unit tests: BMP, PNG, WAV round-trips, stdlib interop
pins, and the closed-form stored-PNG size the SQL oracle mirrors.

No Spark needed — the codecs are pure bytes↔numpy functions
(multimodal/codecs.py) that the mapInPandas stages call per Arrow batch.
"""

from __future__ import annotations

import io
import os
import struct
import wave
import zlib

import numpy as np
import pytest

from synthetic_datagen_spark.multimodal.codecs import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    png_stored_size,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "png_golden.png")


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (11, 7), (16, 16), (9, 33)])
def test_bmp_roundtrip_bit_exact(h, w):
    rng = np.random.default_rng(h * 100 + w)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = encode_bmp(px)
    assert data[:2] == b"BM"
    # exact DIB size: 54-byte headers + 4-aligned BGR rows
    assert len(data) == 54 + ((w * 3 + 3) // 4 * 4) * h
    assert np.array_equal(decode_bmp(data), px)


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        decode_bmp(b"NOPE" + bytes(64))
    with pytest.raises(ValueError):
        decode_bmp(b"BM")  # truncated


@pytest.mark.parametrize("h,w", [(1, 1), (5, 9), (33, 17), (64, 48)])
@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_png_roundtrip_bit_exact(h, w, level):
    rng = np.random.default_rng(h * 1000 + w + level)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px, level=level)), px)


def test_png_stored_size_closed_form():
    """level-0 byte length == png_stored_size(h, w) — the arithmetic the
    multimodal_codec_roundtrip SQL oracle inlines — including the
    multi-block case (scanline bytes > 65535)."""
    rng = np.random.default_rng(0)
    for h, w in [(1, 1), (5, 9), (14, 16), (200, 200)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert len(encode_png(px, level=0)) == png_stored_size(h, w)
    assert 200 * (1 + 3 * 200) > 65535  # the last case really spans blocks


def test_png_golden_fixture_all_filters():
    """Decode a PNG produced by an INDEPENDENT encoder
    (tools/make_png_golden.py): scanlines cycle through all five filter
    types (None/Sub/Up/Average/Paeth) and the IDAT is zlib level-9 —
    an encoding encode_png never emits, so this pins the decoder's
    filter reconstruction, not just self-consistency."""
    data = open(GOLDEN, "rb").read()
    y, x = np.mgrid[0:23, 0:31]
    base = (x * 7 + y * 13).astype(np.uint8)
    expect = np.stack([base, (base * 3 + 1).astype(np.uint8), 255 - base], axis=2)
    assert np.array_equal(decode_png(data), expect)


def test_png_rejects_corruption():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_png(px))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # flip one IDAT payload byte → CRC must catch it
    idat_at = bytes(data).index(b"IDAT")
    data[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_png_rejects_unsupported_color_type():
    # grayscale IHDR (color type 0) is out of contract
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))
    raw = b"\x00\x00\x00" * 2  # junk scanlines, never reached
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(png)


def test_wav_roundtrip_bit_exact():
    rng = np.random.default_rng(3)
    pcm = rng.integers(-(2 ** 15), 2 ** 15, 4001, dtype=np.int16)
    rate, back = decode_wav(encode_wav(pcm, 22050))
    assert rate == 22050 and np.array_equal(back, pcm)
    # exact RIFF size: 44-byte header + 2 bytes/sample
    assert len(encode_wav(pcm, 22050)) == 44 + 2 * len(pcm)


def test_wav_interop_with_stdlib_wave_both_directions():
    rng = np.random.default_rng(4)
    pcm = rng.integers(-(2 ** 15), 2 ** 15, 777, dtype=np.int16)

    # ours → stdlib wave
    buf = io.BytesIO(encode_wav(pcm, 16000))
    with wave.open(buf) as wf:
        assert (wf.getnchannels(), wf.getsampwidth(), wf.getframerate()) == (1, 2, 16000)
        assert np.array_equal(np.frombuffer(wf.readframes(wf.getnframes()), "<i2"), pcm)

    # stdlib wave → ours
    out = io.BytesIO()
    with wave.open(out, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(pcm.tobytes())
    rate, back = decode_wav(out.getvalue())
    assert rate == 8000 and np.array_equal(back, pcm)


def test_wav_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    stereo_fmt = struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16)
    data = (b"RIFF" + struct.pack("<I", 4 + 8 + len(stereo_fmt)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(stereo_fmt)) + stereo_fmt)
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(data)
