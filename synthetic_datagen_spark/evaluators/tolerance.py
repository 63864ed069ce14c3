"""D9 — multi-seed tolerance analysis
(reference: measure_tolerance.py:304-336, measure_tolerance_v2.py:257-282).

Across-seed mean/std/min/max/range per metric, max relative deviation,
and the DOIN margin heuristic recommended = min(2·max_rel_dev, 0.5).
Seeds are rows → one Spark aggregate does the whole panel (A11)."""

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
