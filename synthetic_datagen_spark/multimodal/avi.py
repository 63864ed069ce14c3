"""MJPEG-in-AVI video container codec, stdlib + numpy only.

With a real baseline-JPEG codec in the tree (``multimodal/jpeg.py``),
Motion-JPEG video needs only the RIFF/AVI container: ``encode_avi_mjpeg``
writes a standard AVI 1.0 file (hdrl with avih/strh/strf, movi with
'00dc' frame chunks, idx1 keyframe index) whose every frame is an
independently-decodable JPEG; ``decode_avi_mjpeg`` walks the chunk tree
back to (fps, frame list).

This upgrades the video modality from "stub behind real plumbing" to a
real, seekable format: because each '00dc' chunk is self-contained,
frame sampling decodes ONLY the sampled frames — the container walk is
O(container bytes) but the expensive DCT work is O(sampled frames),
which is exactly the access pattern a 100 TB video-curation pipeline
needs (see ``multimodal_video_frames``). Only audio-in-AVI and
inter-frame codecs (which genuinely require ffmpeg) remain out of
scope.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg


def _chunk(ckid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""  # RIFF chunks are word-aligned
    return ckid + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> AVI/MJPG bytes. All frames
    must share one shape (the container declares a single stream)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one (h, w)")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    max_size = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),  # microseconds per frame
        max_size * fps,            # suggested max bytes/sec
        0,                         # padding granularity
        0x10,                      # AVIF_HASINDEX
        len(frames), 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, max(fps, 1), 0,
                      len(frames), max_size, -1, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack(  # BITMAPINFOHEADER with biCompression='MJPG'
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    idx = b""
    for j in jpegs:
        # idx1 offsets point at the ckid, relative to the 'movi' fourcc
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(j))
        movi_body += _chunk(b"00dc", j)
    movi = _chunk(b"LIST", movi_body)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_frame_chunks(data: bytes) -> tuple[dict, list[bytes]]:
    """Parse the container WITHOUT decoding any pixels: returns
    (header meta, list of raw per-frame JPEG byte strings). The cheap
    half of frame sampling — callers decode only the frames they keep."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    meta: dict = {}
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        pos = 0
        while pos + 8 <= len(buf):
            ckid = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body = buf[pos + 8 : pos + 8 + size]
            if ckid == b"LIST":
                walk(body[4:])  # skip the list-type fourcc
            elif ckid == b"avih" and len(body) >= 40:
                (uspf, _mbps, _pad, _flags, total, _init, _streams,
                 _sbuf, aw, ah) = struct.unpack_from("<IIIIIIIIII", body, 0)
                meta.update(
                    fps=(1_000_000 // uspf if uspf else 0),
                    n_frames=total, width=aw, height=ah,
                )
            elif ckid[2:4] in (b"dc", b"db"):  # compressed/raw video frame
                frames.append(bytes(body))
            pos += 8 + size + (size & 1)

    walk(data[12:])
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    return meta, frames


def decode_avi_mjpeg(data: bytes) -> tuple[dict, list[np.ndarray]]:
    """AVI/MJPG bytes -> (header meta, list of (h, w, 3) uint8 frames)."""
    meta, chunks = avi_frame_chunks(data)
    return meta, [decode_jpeg(c) for c in chunks]
