"""Distribution-distance operators (SURVEY §2.9) as pure DataFrame plans.

These are the reference's signature "queries" — each compares two
samples. All four are expressed relationally (shuffle-count noted per
op), so they hold at 100 TB: no sample ever lands on the driver.

Two-sample inputs are modeled as ONE DataFrame with a tag column — the
union-with-source-tag form — so the same plan works whether the two
sides are two files, two event types, or real-vs-synthetic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from .stats import histogram


def js_divergence(
    df: DataFrame,
    value_col: str,
    tag_col: str,
    tag_a: str,
    tag_b: str,
    lo: float,
    hi: float,
    bins: int = 100,
    eps: float = 1e-10,
) -> DataFrame:
    """D1 — Jensen-Shannon divergence over shared-range histograms.

    reference: distribution_evaluator.py:27-36 (note the reference labels
    JS² as "kl_divergence" — SURVEY §7 bug list; we compute true JS
    divergence base-e). Plan: one histogram aggregate per side (same
    shuffle), join on bin, one final aggregate. Cost ~ O(bins).
    """
    width = (hi - lo) / bins
    bin_id = F.least(F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(bins - 1))
    counts = (
        df.filter(F.col(value_col).between(lo, hi))
        .filter(F.col(tag_col).isin(tag_a, tag_b))
        .groupBy(bin_id.cast("long").alias("bin"))
        .agg(
            F.sum(F.when(F.col(tag_col) == tag_a, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col(tag_col) == tag_b, 1).otherwise(0)).alias("cb"),
        )
    )
    tot = counts.agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
    d = counts.crossJoin(F.broadcast(tot))
    p = F.col("ca") / F.col("ta") + F.lit(eps)
    q = F.col("cb") / F.col("tb") + F.lit(eps)
    m = (p + q) / 2
    term = 0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)
    return d.agg(F.sum(term).alias("js_div"))


def _tagged_ecdf(
    df: DataFrame,
    value_col: str,
    tag_col: str,
    tag_a: str,
    tag_b: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Shared plan for KS / Wasserstein: per-distinct-value running ECDFs
    of both samples — range-bucketed two-level formulation, NO global
    single-partition window.

    Level 1: distinct-value counts hash into ≤``n_buckets`` value-range
    buckets; the per-bucket totals (a bounded ≤256-row frame) collect to
    the driver, which computes exclusive prefix offsets and the next
    non-empty bucket's minimum value, re-broadcast as a literal join
    frame. Level 2: a window partitioned BY BUCKET (parallel) adds the
    within-bucket running sums. ECDF numerators are exact integer sums,
    so the bucketed decomposition is bit-identical to the old global
    sort. Output columns: v, fa, fb, nxt (next distinct value across
    bucket boundaries, null at the global max).
    """
    counts = (
        df.filter(F.col(tag_col).isin(tag_a, tag_b))
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.sum(F.when(F.col(tag_col) == tag_a, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col(tag_col) == tag_b, 1).otherwise(0)).alias("cb"),
        )
        .persist()
    )
    rng = counts.agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax")
    ).first()
    vmin, vmax = rng["vmin"], rng["vmax"]
    width = ((vmax - vmin) / n_buckets) if (vmax or 0.0) > (vmin or 0.0) else 1.0
    bkt = F.least(
        F.floor((F.col("v") - F.lit(vmin)) / F.lit(width)).cast("long"),
        F.lit(n_buckets - 1),
    )
    bucketed = counts.withColumn("bkt", F.greatest(bkt, F.lit(0)))
    # bounded driver fallback (≤ n_buckets rows): totals -> prefix offsets
    btot = (
        bucketed.groupBy("bkt")
        .agg(F.sum("ca").alias("bca"), F.sum("cb").alias("bcb"), F.min("v").alias("bvmin"))
        .collect()
    )
    btot.sort(key=lambda r: r["bkt"])
    offs, oa, ob = [], 0, 0
    for i, r in enumerate(btot):
        nxt = btot[i + 1]["bvmin"] if i + 1 < len(btot) else None
        offs.append((r["bkt"], oa, ob, nxt))
        oa += r["bca"]
        ob += r["bcb"]
    ta, tb = oa, ob
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offs, "bkt LONG, offa LONG, offb LONG, next_bucket_min DOUBLE"
    )
    wb = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wlead = Window.partitionBy("bkt").orderBy("v")
    return (
        bucketed.join(F.broadcast(off_df), "bkt")
        .withColumn("fa", (F.col("offa") + F.sum("ca").over(wb)) / F.lit(float(ta)))
        .withColumn("fb", (F.col("offb") + F.sum("cb").over(wb)) / F.lit(float(tb)))
        .withColumn(
            "nxt", F.coalesce(F.lead("v").over(wlead), F.col("next_bucket_min"))
        )
    )


def ks_statistic(
    df: DataFrame, value_col: str, tag_col: str, tag_a: str, tag_b: str
) -> DataFrame:
    """D3 — two-sample Kolmogorov-Smirnov statistic sup|Fa - Fb|.
    reference: composite_metric.py:103 (scipy ks_2samp)."""
    e = _tagged_ecdf(df, value_col, tag_col, tag_a, tag_b)
    return e.agg(F.max(F.abs(F.col("fa") - F.col("fb"))).alias("ks_stat"))


def wasserstein_1d(
    df: DataFrame, value_col: str, tag_col: str, tag_a: str, tag_b: str
) -> DataFrame:
    """D2 — 1-D Wasserstein-1 distance = ∫ |Fa(x) - Fb(x)| dx.

    reference: distribution_evaluator.py:39-40 (scipy
    wasserstein_distance). Exact ECDF formulation: sum over consecutive
    distinct values of |ΔF| · Δx — matches scipy to fp precision.
    """
    e = _tagged_ecdf(df, value_col, tag_col, tag_a, tag_b)
    # `nxt` spans bucket boundaries (next non-empty bucket's min), so no
    # global-order window is needed; the global max has nxt null and
    # contributes nothing, exactly like the old lead(v)
    gap = (F.col("nxt") - F.col("v")) * F.abs(F.col("fa") - F.col("fb"))
    return e.select(gap.alias("g")).agg(F.sum("g").alias("w1"))


def hurst_rs(
    df: DataFrame,
    value_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    lags: Sequence[int] = tuple(range(2, 101)),
) -> DataFrame:
    """D6 — Hurst exponent via rescaled-range (R/S) analysis, per series.

    reference: composite_metric.py:25-47. For each lag L: chunk the series
    into L-sized segments, per segment compute R = max-min of the
    cumulative deviation of diffs and S = population std of diffs, take
    mean(R/S) over segments, then H = slope of log(R/S)~log(L), clipped
    to [0, 1].

    Plan shape: ONE ordered window pass over the raw series builds the
    prefix sum P_i of diffs; after the lag-grid explode (×|lags| rows)
    everything is hash aggregation — the segment cumulative deviation
    never needs a per-(lag, segment) sort because

        cum_k = Σ_{j∈seg, j≤k}(d_j − μ) = (P_k − k·μ) + const(seg)

    so R = max_k(P_k − k·μ) − min_k(P_k − k·μ). μ comes from a first
    hash agg, joins back broadcast (segment count ≈ n·Σ1/lag ≪ n·|lags|),
    and a second hash agg takes the max/min. Sorting 100k rows once
    instead of the 10M-row exploded frame is the difference between a
    pipelined plan and a giant shuffle-sort at scale.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    indexed = (
        df.withColumn("_i", F.row_number().over(w) - 1)
        .withColumn("_d", F.col(value_col) - F.lag(value_col).over(w))
        .filter(F.col("_d").isNotNull())
        .withColumn("_i", F.col("_i") - 1)
        .withColumn(
            "_p", F.sum("_d").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .select(*partition_cols, "_i", "_d", "_p")
    )
    # spread before the ×|lags| explode (r13): the window pass leaves
    # one populated partition per series, so the exploded frame's two
    # aggregation passes — the query's entire heavy part, ~|lags|·n
    # rows — ran on as many tasks as there are SERIES. A deterministic
    # hash repartition on (series, _i) fans the per-row work across the
    # cluster; per-segment aggregate merge order changes only in the
    # last ulp, which the 6-significant-digit output rounding absorbs
    # (the same absorption the 32- vs 200-partition gate layouts
    # already exercise).
    sc = indexed.sparkSession.sparkContext
    indexed = indexed.repartition(sc.defaultParallelism, *partition_cols, "_i")
    lag_df = F.array(*[F.lit(int(x)) for x in lags])
    e = indexed.withColumn("lag", F.explode(lag_df)).withColumn(
        "seg", F.floor(F.col("_i") / F.col("lag"))
    )
    keys = [*partition_cols, "lag", "seg"]
    # hash agg 1: per-segment mean + dispersion from plain sums
    mu = (
        e.groupBy(*keys)
        .agg(
            F.mean("_d").alias("_mu"),
            F.stddev_pop("_d").alias("S"),
            F.count("*").alias("m"),
        )
        .filter((F.col("m") == F.col("lag")) & (F.col("S") > 1e-10))
    )
    # hash agg 2: R = max-min of (P_k − k·μ) — the segment constant cancels
    dev = F.col("_p") - (F.col("_i") + 1) * F.col("_mu")
    seg = (
        e.join(F.broadcast(mu), keys)
        .withColumn("_dev", dev)
        .groupBy(*keys)
        .agg(
            (F.max("_dev") - F.min("_dev")).alias("R"),
            F.first("S").alias("S"),
        )
    )
    per_lag = seg.groupBy(*partition_cols, "lag").agg(
        F.mean(F.col("R") / F.col("S")).alias("rs")
    ).filter(F.col("rs") > 0)
    ll = per_lag.select(
        *partition_cols, F.log("lag").alias("lx"), F.log("rs").alias("ly")
    )
    slope = F.corr("lx", "ly") * F.stddev_samp("ly") / F.stddev_samp("lx")
    return ll.groupBy(*partition_cols).agg(
        F.least(F.greatest(slope, F.lit(0.0)), F.lit(1.0)).alias("hurst")
    )
