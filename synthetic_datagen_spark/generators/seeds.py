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


def splitmix64_vec(base_seed: int, *units):
    """Vectorized ``derive_seed``: identical splitmix64 arithmetic over
    numpy uint64 arrays (wrapping multiply == the masked Python form
    bit-for-bit). ``units`` are scalars or broadcastable integer arrays;
    returns a non-negative int64-range uint64 array.

    This is the COUNTER-BASED draw path: a value is a pure function of
    (base_seed, unit ids), so a million ticks can draw their randomness
    in one array pass — no per-tick Generator construction — while
    keeping the per-(seed, series, step) invariance contract that makes
    streaming output independent of micro-batch boundaries."""
    import numpy as np

    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        z = np.asarray((base_seed * _GOLDEN) & _MASK, dtype=np.uint64)
        for u in units:
            z = z ^ np.asarray(u, dtype=np.uint64)
            z = z + np.uint64(_GOLDEN)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(_M1)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(_M2)
            z = z ^ (z >> np.uint64(31))
        return z & np.uint64(0x7FFFFFFFFFFFFFFF)


def counter_uniforms(base_seed: int, *units):
    """Deterministic uniforms in (0, 1]: top 53 of the 63 mixed bits,
    shifted off zero so Box-Muller's log() is always finite."""
    import numpy as np

    z = splitmix64_vec(base_seed, *units)
    return ((z >> np.uint64(10)).astype(np.float64) + 1.0) / float(1 << 53)


def counter_normals(base_seed: int, *units):
    """Deterministic standard normals per work unit via Box-Muller over
    two independent counter slots (slot ids chosen by the caller's unit
    tuple convention; this helper appends slots 0 and 1)."""
    import numpy as np

    u1 = counter_uniforms(base_seed, *units, 0)
    u2 = counter_uniforms(base_seed, *units, 1)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


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
