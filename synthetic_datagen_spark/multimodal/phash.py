"""Perceptual image hashing (pHash, DCT variant) for near-duplicate
image detection — the image-modality sibling of the text SimHash
pipeline (reference has no image dedup; this extends the multimodal
column surface the driver brief demands).

Algorithm (the classic DCT pHash):
  1. grayscale = channel mean, block-mean-resized to 32x32;
  2. orthonormal 2-D DCT-II (a 32x32 matrix sandwich — no scipy);
  3. keep the top-left 8x8 low-frequency block, drop the DC term;
  4. bit i = coefficient i > median of the 63 kept coefficients.
The 63-bit signature lives in a BIGINT (bit 63 always 0, so it is
non-negative and engine-safe). Hamming distance <= 7 on re-encoded
variants, >= ~18 across unrelated images on this corpus — see
tests/test_multimodal.py for the measured margins.

Candidate generation is Manku-style pigeonhole blocking (same scheme
as text SimHash, functions/text.py): split the 64 bits into 8 blocks
of 8; any pair within hamming <= 7 must agree exactly on >= 1 block,
so bucketing by (block_idx, block_value) finds every such pair with
~linear candidate volume.
"""

from __future__ import annotations

import numpy as np

_N = 32  # DCT input side


def _dct_matrix(n: int = _N) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


_D = _dct_matrix()


def _to_gray32(px: np.ndarray) -> np.ndarray:
    """(h, w[, 3]) uint8 -> (32, 32) float64 via channel mean +
    block-mean pooling (exact when h, w are multiples of 32; edge
    blocks average whatever remains otherwise)."""
    g = px.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=2)
    h, w = g.shape
    if (h, w) == (_N, _N):
        return g
    ys = np.linspace(0, h, _N + 1).astype(int)
    xs = np.linspace(0, w, _N + 1).astype(int)
    out = np.empty((_N, _N))
    for r in range(_N):
        for c in range(_N):
            blk = g[ys[r] : max(ys[r + 1], ys[r] + 1), xs[c] : max(xs[c + 1], xs[c] + 1)]
            out[r, c] = blk.mean()
    return out


def phash64(px: np.ndarray) -> int:
    """DCT perceptual hash -> non-negative int (63 significant bits).

    The DCT sandwich runs through BLAS GEMM, whose reduction order is
    CPU-dispatch-dependent (OpenBLAS DYNAMIC_ARCH): a coefficient that
    lands within an ulp of the median flipped its bit on each r13 host
    migration (doc 50's re-encode pair oscillated hamming 6 <-> 8
    across the <= 7 threshold). Quantizing the kept coefficients to
    1e-4 before the median/compare absorbs that drift class (abs drift
    ~1e-10 on O(100) coefficients vs the 1e-4 quantum): near-equal
    values collapse onto the SAME quantized value, making the
    strictly-greater test — and hence the hash — stable across hosts
    (r13 VERDICT item 2 / ADVICE on the doc-50 boundary)."""
    c = _D @ _to_gray32(px) @ _D.T
    block = np.round(c[:8, :8].flatten()[1:], 4)  # drop DC, quantize
    med = np.median(block)
    bits = block > med
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
