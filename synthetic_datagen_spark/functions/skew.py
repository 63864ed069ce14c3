"""Skew-handling primitives (driver brief: "skewed keys hurt …
salting for skew").

`salted_agg` is the classic two-phase aggregate: phase 1 aggregates on
(key, salt) — spreading one hot key over `n_salts` reducers — phase 2
merges the partials on key alone. Correct for any algebraic aggregate
expressed as (partial, merge) pairs; results are identical to the
direct groupBy (the oracle-checked query proves it).

AQE's skew-join handling (spark.sql.adaptive.skewJoin) covers the JOIN
side of the same problem and is enabled in session.py; salting is the
aggregation-side tool you reach for when one group key dominates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    partials: out_col -> (phase1 aggregate over raw rows,
                          phase2 aggregate over the partial col).
    The salt derives from a hash of a row-distinguishing column (never
    rand(), never partition identity — both are nondeterministic under
    task retry, which with non-algebraic partials could regroup rows and
    change results).
    """
    if not salt_on:
        raise ValueError(
            "salted_agg requires salt_on: a row-distinguishing column to "
            "hash the salt from (partition-id fallbacks are not retry-safe)"
        )
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts))
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[p1.alias(f"_p_{name}") for name, (p1, _) in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[
            p2(F.col(f"_p_{name}")).alias(name) if callable(p2) else p2.alias(name)
            for name, (_, p2) in partials.items()
        ]
    )
