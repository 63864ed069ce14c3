"""G12 — deterministic seed derivation (SURVEY §2.10).

The reference's determinism contract (same seed ⇒ identical output,
tests/test_plugins.py:74-83) is harder on Spark: `F.rand(seed)` depends
on partition layout, so a repartition would silently change results.
The rule here: every random draw is a *pure function of (base_seed,
work-unit id)* — never of partition index — so any partitioning yields
the same output (SURVEY §4.2 "Seed determinism").

Derivation is splitmix64, implemented both in Python (driver) and as
Spark column expressions over unsigned 64-bit arithmetic emulated with
`bigint` wraparound (Spark longs overflow with two's-complement wrap,
matching the masked Python form bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_MASK = (1 << 64) - 1
_GOLDEN = 0x9E3779B97F4A7C15
_M1 = 0xBF58476D1CE4E5B9
_M2 = 0x94D049BB133111EB


def derive_seed(base_seed: int, *units: int) -> int:
    """splitmix64-mix of base_seed and unit ids → 63-bit seed."""
    z = (base_seed * _GOLDEN) & _MASK
    for u in units:
        z = (z ^ (u & _MASK)) & _MASK
        z = (z + _GOLDEN) & _MASK
        z = ((z ^ (z >> 30)) * _M1) & _MASK
        z = ((z ^ (z >> 27)) * _M2) & _MASK
        z = z ^ (z >> 31)
    return z & 0x7FFFFFFFFFFFFFFF


def seed_col(base_seed: int, *unit_cols: Column) -> Column:
    """Column-side seed derivation: non-negative long, a pure function
    of (base_seed, unit ids).

    Uses Spark's builtin ``xxhash64`` (JVM-side, whole-stage codegen,
    input-value-deterministic — unlike ``F.rand``, which depends on the
    partition index). Spark's ANSI mode forbids the wraparound longs the
    Python splitmix mix needs, and a builtin hash beats emulating one.
    """
    return F.abs(F.xxhash64(F.lit(base_seed), *unit_cols))


def uniform01(base_seed: int, *unit_cols: Column) -> Column:
    """Deterministic uniform in [0,1) per work unit."""
    return (seed_col(base_seed, *unit_cols) % F.lit(1 << 53)).cast("double") / F.lit(
        float(1 << 53)
    )
