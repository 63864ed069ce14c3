"""One-shot generator for tests/golden/png_golden.png.

Writes an 8-bit RGB PNG whose scanlines cycle through ALL five PNG
filter types (None/Sub/Up/Average/Paeth) and whose IDAT is zlib level-9
compressed — an encoding path `multimodal.codecs.encode_png` never
emits (it always uses filter 0), so decoding it pins the decoder's full
filter reconstruction against independently-produced bytes.

Pixels are deterministic (splitmix-style LCG over (x, y, channel)), so
the test regenerates the expected array without a second fixture file.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

H, W = 23, 31


def golden_pixels() -> np.ndarray:
    y, x = np.mgrid[0:H, 0:W]
    base = (x * 7 + y * 13).astype(np.uint8)
    return np.stack([base, (base * 3 + 1).astype(np.uint8), 255 - base], axis=2)


def _filter_row(ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int = 3) -> np.ndarray:
    line = line.astype(np.int32)
    prev = prev.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
    upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
    if ftype == 0:
        out = line
    elif ftype == 1:
        out = line - left
    elif ftype == 2:
        out = line - prev
    elif ftype == 3:
        out = line - (left + prev) // 2
    else:  # Paeth
        p = left + prev - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
        out = line - pred
    return (out & 0xFF).astype(np.uint8)


def main() -> None:
    px = golden_pixels()
    flat = px.reshape(H, W * 3)
    rows = []
    for y in range(H):
        ftype = y % 5
        prev = flat[y - 1] if y else np.zeros(W * 3, np.uint8)
        rows.append(bytes([ftype]) + _filter_row(ftype, flat[y], prev).tobytes())
    raw = b"".join(rows)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw, 9))
           + chunk(b"IEND", b""))
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "png_golden.png")
    with open(out, "wb") as fh:
        fh.write(png)
    print(f"wrote {out} ({len(png)} bytes)")


if __name__ == "__main__":
    main()
