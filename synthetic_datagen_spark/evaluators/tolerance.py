"""D9 — multi-seed tolerance analysis
(reference: measure_tolerance.py:304-336, measure_tolerance_v2.py:257-282,
examples/scripts/tolerance_v3_real_testset.py:74-81).

Across-seed mean/std/min/max/range per metric, max relative deviation,
and the DOIN margin heuristics — v1/v2's recommended =
min(2·max_rel_dev, 0.5) and v3's CV-based recommended =
max(3·std/mean, max_dev)·1.2. Seeds are rows → one Spark aggregate does
the whole panel (A11)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def tolerance_panel(
    spark: SparkSession,
    metric_fn: Callable[[int], dict[str, float]],
    seeds: list[int],
) -> DataFrame:
    """Run ``metric_fn(seed)`` per seed, aggregate the tolerance panel.

    The per-seed evaluations each launch their own Spark jobs (they are
    full generate→evaluate pipelines), so the driver loop here mirrors
    the reference's seed loop; the aggregation is Spark.
    Returns (metric, mean, std, min, max, range, max_rel_dev, recommended_tolerance).
    """
    from concurrent.futures import ThreadPoolExecutor

    # per-seed pipelines are independent Spark jobs — overlap them
    with ThreadPoolExecutor(max_workers=min(8, len(seeds))) as pool:
        results = list(pool.map(metric_fn, seeds))
    rows = []
    for seed, metrics in zip(seeds, results):
        for k, v in metrics.items():
            rows.append((int(seed), k, float(v)))
    df = spark.createDataFrame(rows, ["seed", "metric", "value"])
    agg = df.groupBy("metric").agg(
        F.avg("value").alias("mean"),
        F.coalesce(F.stddev_samp("value"), F.lit(0.0)).alias("std"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
    )
    rel_dev = F.when(
        F.abs(F.col("mean")) > 1e-12,
        F.greatest(
            F.abs(F.col("max") - F.col("mean")), F.abs(F.col("mean") - F.col("min"))
        )
        / F.abs(F.col("mean")),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "metric",
        "mean",
        "std",
        "min",
        "max",
        (F.col("max") - F.col("min")).alias("range"),
        rel_dev.alias("max_rel_dev"),
        F.least(2 * rel_dev, F.lit(0.5)).alias("recommended_tolerance"),
    )


def tolerance_panel_v3(per_seed: DataFrame) -> DataFrame:
    """v3 tolerance from a per-seed metric frame (metric, seed, value).

    Reference semantics (tolerance_v3_real_testset.py:74-81): the N
    per-seed scores give, per metric, mean/std (population, np.std
    ddof=0), cv = std/mean, max_dev = max(|v-mean|)/mean,
    tolerance_3sigma = 3·std/mean, and
    recommended = max(tolerance_3sigma, max_dev) · 1.2.

    Numerically order-free on purpose so a DuckDB oracle reproduces it
    bit-for-bit: values round to 9 dp and sum as DECIMAL(18,9) /
    DECIMAL(38,18) (exact, associative); std comes from the
    sum/sum-of-squares identity; max_dev from max/min extremes
    (max(|v-mean|) == max(max-mean, mean-min)); only the final
    divisions and sqrt run in binary floating point, on identical
    inputs both sides.

    Precondition: metrics are POSITIVE scores (the reference only ever
    feeds MAEs, tolerance_v3_real_testset.py:74-81), so dividing by the
    mean is well-defined. Defensively, a zero mean yields NULL for the
    ratio columns (explicit guard, same on both engines) rather than a
    misleading 0/inf; a negative mean passes through and produces a
    negative cv exactly as the reference's numpy arithmetic would —
    callers feeding signed metrics get the reference's behavior, not a
    silent sign flip.
    """
    d = per_seed.withColumn("v", F.round("value", 9).cast("decimal(18,9)"))
    agg = d.groupBy("metric").agg(
        F.count("*").alias("n_seeds"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    n = F.col("n_seeds").cast("double")
    mean = F.col("s").cast("double") / n
    msq = F.col("s2").cast("double") / n
    std = F.sqrt(F.greatest(msq - mean * mean, F.lit(0.0)))
    # NULL (not 0/inf) when the per-seed mean is exactly 0 — see the
    # positive-metric precondition in the docstring
    mean_nz = F.when(mean != 0.0, mean)
    max_dev = (
        F.greatest(F.col("mx").cast("double") - mean, mean - F.col("mn").cast("double"))
        / mean_nz
    )
    tol3 = 3.0 * std / mean_nz
    return agg.select(
        "metric",
        "n_seeds",
        F.round(mean, 8).alias("mean"),
        F.round(std, 8).alias("std"),
        F.round(F.col("mn").cast("double"), 8).alias("min"),
        F.round(F.col("mx").cast("double"), 8).alias("max"),
        F.round(std / mean_nz, 6).alias("cv"),
        F.round(max_dev, 6).alias("max_dev"),
        F.round(tol3, 6).alias("tolerance_3sigma"),
        F.round(F.greatest(tol3, max_dev) * 1.2, 4).alias("recommended_tolerance"),
    )
