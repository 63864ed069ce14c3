"""Pigeonhole candidate generation over fixed-width bit signatures —
the shared kernel behind SimHash (text), pHash (image), and spectral-
hash (audio) near-duplicate detection.

Manku et al.'s argument (WWW'07, public): split a B-bit signature into
k blocks; any pair within hamming distance d < k must agree EXACTLY on
at least one block (pigeonhole), so bucketing on (block_idx, block
value) finds every qualifying pair while candidate volume stays
~linear in corpus size (collisions per bucket, not n² pairs).

That linearity claim holds only while 2^block_bits outpaces n: a FIXED
single-block config carries a random-collision candidate term of
``n_blocks · 2^-block_bits · n²/2`` — quadratic in corpus size, the
same geometry as a fixed sign-LSH config (SCALE_SWEEP_r9). The r11
100× media probe measured it concretely: the 8-blocks × 8-bit config
produced 1.9e9 candidates at 62.5k audio signatures for ~15k real
pairs. The scale path is COMBINATION keys (the same Manku section:
their permuted tables with multi-block prefixes): split into p pieces
and bucket on every c-piece combination — C(p, c) tables whose keys
carry c·(B/p) bits. Any pair within hamming h ≤ p - c leaves at least
p - h ≥ c pieces untouched, so some c-combination matches exactly —
recall stays exact while key entropy grows with c. The chooser
(scaled_pigeonhole_params) picks c from MEASURED candidate rates on a
bounded signature sample, not uniform-hash theory: real media
signatures are corpus-correlated (measured bulk hamming 22.4/63 on
fixture audio vs 31.5 for random bits) and uniform estimates are off
by 30×+ on skewed pieces.
"""

from __future__ import annotations

from itertools import combinations
from math import comb

from pyspark.sql import DataFrame, functions as F


def pigeonhole_pairs(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    *,
    n_blocks: int = 8,
    block_bits: int = 8,
    max_hamming: int = 7,
) -> DataFrame:
    """All pairs (id_a < id_b) with hamming(sig_a, sig_b) <= max_hamming.

    Complete iff max_hamming < n_blocks (pigeonhole). The join is an
    equi-join on (block_idx, block_value) — shuffle-partitioned by
    bucket, never an all-pairs product — and verification is JVM-side
    bit_count(XOR). Output: id_a, id_b, hamming.
    """
    if max_hamming >= n_blocks:
        raise ValueError(
            f"pigeonhole completeness needs max_hamming < n_blocks "
            f"({max_hamming} >= {n_blocks})"
        )
    mask = (1 << block_bits) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col(sig_col), block_bits * i)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for i in range(n_blocks)
        ]
    )
    exploded = sig.select(
        F.col(id_col).alias("_id"), F.col(sig_col).alias("_sig"), F.explode(blocks).alias("b")
    ).select("_id", "_sig", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _piece_sizes(sig_bits: int, n_pieces: int) -> list[int]:
    """Split sig_bits into n_pieces as evenly as possible (sizes differ
    by at most 1). Uneven pieces keep the pigeonhole argument intact —
    only the per-table key entropy varies."""
    base = sig_bits // n_pieces
    return [base + (1 if i < sig_bits % n_pieces else 0) for i in range(n_pieces)]


def pigeonhole_pairs_combo(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    *,
    max_hamming: int,
    n_pieces: int,
    combo_size: int,
    sig_bits: int = 63,
) -> DataFrame:
    """All pairs (id_a < id_b) with hamming(sig_a, sig_b) <= max_hamming,
    via combination keys: the signature splits into ``n_pieces`` pieces
    and every ``combo_size``-piece combination forms one bucket table
    (C(n_pieces, combo_size) tables, keys of ~combo_size·sig_bits/
    n_pieces bits).

    Complete iff max_hamming <= n_pieces - combo_size: h errors touch
    at most h pieces, leaving >= combo_size clean ones, so at least one
    combination matches exactly. combo_size=1 degenerates to the
    classic single-block kernel with more key bits per table; larger
    combo_size trades more (narrow) exploded rows for quadratically
    fewer random bucket collisions — the knob scaled_pigeonhole_params
    turns as the corpus grows.

    Same join shape as pigeonhole_pairs: explode → equi-join on
    (table_idx, key) → JVM-side bit_count(XOR) verification; ids and
    one long per row through the shuffle, never payloads.
    """
    if max_hamming > n_pieces - combo_size:
        raise ValueError(
            f"combination-key completeness needs max_hamming <= "
            f"n_pieces - combo_size ({max_hamming} > {n_pieces} - {combo_size})"
        )
    sizes = _piece_sizes(sig_bits, n_pieces)
    offsets = [sum(sizes[:i]) for i in range(n_pieces)]

    def piece(i: int):
        return F.shiftright(F.col(sig_col), offsets[i]).bitwiseAND(
            F.lit((1 << sizes[i]) - 1)
        )

    keys = []
    for t, idxs in enumerate(combinations(range(n_pieces), combo_size)):
        key = None
        for i in idxs:
            key = piece(i) if key is None else (
                F.shiftleft(key, sizes[i]).bitwiseOR(piece(i))
            )
        keys.append(F.struct(F.lit(t).alias("blk"), key.alias("val")))

    exploded = sig.select(
        F.col(id_col).alias("_id"),
        F.col(sig_col).alias("_sig"),
        F.explode(F.array(*keys)).alias("b"),
    ).select("_id", "_sig", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _popcount64(x):
    import numpy as np

    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def sampled_candidate_rate(
    sigs,
    n_pieces: int,
    combo_size: int,
    sig_bits: int = 63,
    max_hamming: int | None = None,
) -> float:
    """Bucket-collision pair mass per sample pair, measured on a
    bounded driver-side sample (numpy) — the statistic
    scaled_pigeonhole_params feeds its cost model. Counted as total
    bucket-pair mass over C(len,2) (a pair colliding in k tables costs
    k joined rows: that IS the join cost).

    With ``max_hamming`` set, QUALIFYING pairs (hamming <= max_hamming)
    are excluded: those are the OUTPUT — on real corpora duplicates
    cluster locally, so a contiguous sample overstates their density
    enormously (the r11 fixture: ~600×) and extrapolating them
    quadratically would make every healthy corpus look pathological.
    The remaining BACKGROUND collisions are the genuinely quadratic
    random-collision term a quadratic-geometry warning must key on."""
    import numpy as np

    s = np.asarray(sigs, dtype=np.uint64)
    n = len(s)
    if n < 2:
        return 0.0
    sizes = _piece_sizes(sig_bits, n_pieces)
    offsets = [sum(sizes[:i]) for i in range(n_pieces)]
    pieces = [
        (s >> np.uint64(offsets[i])) & np.uint64((1 << sizes[i]) - 1)
        for i in range(n_pieces)
    ]
    qual = None
    if max_hamming is not None:
        qual = _popcount64(s[:, None] ^ s[None, :]) <= max_hamming
    total = 0
    order = np.arange(n)
    for idxs in combinations(range(n_pieces), combo_size):
        key = np.zeros(n, dtype=np.uint64)
        for i in idxs:
            key = (key << np.uint64(sizes[i])) | pieces[i]
        if qual is None:
            _, cnts = np.unique(key, return_counts=True)
            total += int((cnts.astype(np.int64) * (cnts - 1) // 2).sum())
            continue
        srt = order[np.argsort(key, kind="stable")]
        ks = key[srt]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        bounds = np.r_[starts, n]
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            m = b1 - b0
            if m < 2:
                continue
            idx = srt[b0:b1]
            q = int(qual[np.ix_(idx, idx)].sum() - m) // 2  # minus diagonal
            total += m * (m - 1) // 2 - q
    return total / (n * (n - 1) / 2)


def scaled_pigeonhole_params(
    n: int,
    max_hamming: int,
    sample=None,
    *,
    sig_bits: int = 63,
    cands_per_sig: float = 500.0,
    max_tables: int = 512,
    explode_weight: float = 0.1,
) -> tuple[int, int, float]:
    """Corpus-size-aware combination-key config (n_pieces, combo_size,
    est_candidates) for exact hamming <= max_hamming pair mining.

    For each combo_size c the minimal exact piece count is c +
    max_hamming (fewest pieces → widest pieces → most key bits per
    table), so the feasible ladder is c = 1, 2, ... with C(c+h, c)
    tables. Estimated join cost = rate·n²/2 candidates +
    explode_weight · n · C(p, c) exploded rows; the rate comes from the
    MEASURED sample when given (real media signatures are corpus-
    correlated — uniform-hash estimates were 30×+ off on the r11
    fixture audio), else from the uniform 2^-key_bits · tables model.
    Returns the cheapest config with tables <= max_tables.

    The r11 100× probe's concrete ladder (62.5k audio sigs, h=5):
    c=1 → 1.9e9 candidates, c=3 → 48M, c=4 → 10.9M, c=5 → 8.1M —
    the chooser lands on c=4-5 where the fixed kernel OOMs.

    Like threshold_floor for cosine space: when even the best config's
    estimated BACKGROUND candidates exceed cands_per_sig · n, the
    geometry itself is the problem (signature bulk too close to the
    threshold — the answer is quadratic) and the caller should surface
    the returned estimate rather than silently burn the cluster. The
    returned estimate deliberately EXCLUDES qualifying pairs
    (hamming <= max_hamming) from the sampled rate: those are output —
    duplicates cluster locally on real corpora, so a contiguous sample
    overstates their corpus-wide pair density ~600× (r11 fixture) and
    extrapolating them n² would flag every healthy dup-rich corpus.
    Config CHOICE uses the total rate (every config pays the output
    mass about equally, so it cancels in the comparison)."""
    best = None
    for c in range(1, 9):
        p = c + max_hamming
        if p > sig_bits:
            break
        tables = comb(p, c)
        if tables > max_tables:
            break
        if sample is not None and len(sample) >= 64:
            rate = sampled_candidate_rate(sample, p, c, sig_bits)
            # a zero sampled rate only bounds the rate below 1/pairs;
            # floor at the uniform model so the estimate never claims
            # literally zero candidates
            rate = max(rate, tables * 2.0 ** -(c * sig_bits / p))
        else:
            rate = tables * 2.0 ** -(c * sig_bits / p)
        est = rate * n * (n - 1) / 2 + explode_weight * n * tables
        if best is None or est < best[3]:
            best = (p, c, rate, est)
    if best is None:
        # no ladder step was feasible: p = max_hamming+1 already
        # exceeds the signature width, or even the c=1 table count
        # blows the budget — fail with the parameters, not a
        # NoneType unpack
        raise ValueError(
            f"no feasible pigeonhole config: max_hamming={max_hamming} "
            f"needs p={max_hamming + 1} blocks over sig_bits={sig_bits} "
            f"with <= {max_tables} tables"
        )
    p, c, rate, _ = best
    if sample is not None and len(sample) >= 64:
        bg = sampled_candidate_rate(sample, p, c, sig_bits, max_hamming=max_hamming)
        bg = max(bg, comb(p, c) * 2.0 ** -(c * sig_bits / p))
    else:
        bg = rate
    return p, c, bg * n * (n - 1) / 2
