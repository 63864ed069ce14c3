"""Pigeonhole candidate generation over fixed-width bit signatures —
the shared kernel behind SimHash (text), pHash (image), and spectral-
hash (audio) near-duplicate detection.

Manku et al.'s argument (WWW'07, public): split a B-bit signature into
k blocks; any pair within hamming distance d < k must agree EXACTLY on
at least one block (pigeonhole), so bucketing on (block_idx, block
value) finds every qualifying pair while candidate volume stays
~linear in corpus size (collisions per bucket, not n² pairs).
"""

from __future__ import annotations

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
