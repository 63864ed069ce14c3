"""Aggregation operators (SURVEY §2.4): moments, histograms, quantile
discretization, state frequencies, transition matrices.

All of these are single-shuffle hash aggregates (partial + final), so
they scale linearly: at 100 TB each is one map-side-combined pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def moments(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    population: bool = True,
) -> DataFrame:
    """A1/A2 — mean/std/var/min/max/skewness/kurtosis (+count).

    reference: distribution_evaluator.py:96-99 uses numpy std (population,
    ddof=0) → ``population=True`` default; Spark's skewness/kurtosis are
    the population g1 / excess-g2 conventions, same as scipy defaults
    (reference adds 3 for raw kurtosis — callers can do that).
    """
    std = F.stddev_pop(value_col) if population else F.stddev_samp(value_col)
    var = F.var_pop(value_col) if population else F.var_samp(value_col)
    aggs = [
        F.count(value_col).alias("n"),
        F.mean(value_col).alias("mean"),
        std.alias("std"),
        var.alias("var"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
        F.skewness(value_col).alias("skew"),
        F.kurtosis(value_col).alias("kurt"),
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 100,
    group_cols: Sequence[str] = (),
    density: bool = False,
) -> DataFrame:
    """A3 — fixed-range histogram; the building block of the KL/JS metric.

    reference: distribution_evaluator.py:27-36 (np.histogram(bins=100,
    range=shared, density=True)). numpy puts x == hi into the LAST bin
    (closed right edge on the final bin) — mirrored via ``least``.
    One groupBy = one shuffle of at most ``bins`` rows per group.
    """
    width = (hi - lo) / bins
    bin_id = F.least(
        F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(bins - 1)
    ).cast("long")
    d = (
        df.filter(F.col(value_col).between(lo, hi))
        .withColumn("bin", bin_id)
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("cnt"))
    )
    if density:
        w = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(F.lit(1))
        d = d.withColumn(
            "density", F.col("cnt") / (F.sum("cnt").over(w) * F.lit(width))
        )
    return d


def quantile_edges(
    df: DataFrame, value_col: str, n_bins: int, group_cols: Sequence[str] = ()
) -> DataFrame:
    """A4 — exact quantile bin edges (linear interpolation, np.quantile
    parity). reference: grasynda_generator.py:77-82.

    Uses exact ``percentile`` (not approx) for oracle parity; the approx
    path (`percentile_approx`) is the 100 TB route.
    """
    probs = [i / n_bins for i in range(n_bins + 1)]
    arr = F.percentile(F.col(value_col), F.array(*[F.lit(p) for p in probs]))
    return (
        df.groupBy(*group_cols)
        .agg(arr.alias("edges"))
        .select(
            *group_cols,
            F.posexplode("edges").alias("edge_idx", "edge"),
        )
    )


def digitize(
    value: Column, edges: Sequence[float], right: bool = False
) -> Column:
    """A5 — np.digitize as a when-chain over broadcast edges.
    reference: grasynda_generator.py:84. Returns the numpy convention:
    index of the first edge greater than x (left-closed bins)."""
    expr = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        cond = value < F.lit(edges[i]) if not right else value <= F.lit(edges[i])
        expr = F.when(cond, F.lit(i)).otherwise(expr)
    return expr


def state_frequency(df: DataFrame, state_col: str, group_cols: Sequence[str] = ()) -> DataFrame:
    """A6 — normalized state frequencies (np.bincount / total).
    reference: grasynda_generator.py:113-115."""
    w = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(F.lit(1))
    return (
        df.groupBy(*group_cols, state_col)
        .agg(F.count("*").alias("cnt"))
        .withColumn("freq", F.col("cnt") / F.sum("cnt").over(w))
    )


def transition_counts(
    df: DataFrame,
    state_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    laplace: float = 0.0,
) -> DataFrame:
    """A7 — (state, next_state) transition matrix, row-normalized.

    reference: grasynda_generator.py:87-94; Laplace smoothing variant
    regime_gan.py:103-108. Output long-form (state, next_state, cnt, prob)
    — pivot to wide on the driver only for tiny K.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    pairs = (
        df.withColumn("_next", F.lead(state_col).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(F.col(state_col).alias("state"), F.col("_next").alias("next_state"))
        .agg(F.count("*").alias("cnt"))
    )
    row_w = Window.partitionBy("state")
    if laplace > 0.0:
        # densify to the FULL K×K grid first (like regime_gan.py's
        # matrix += smoothing over every cell): unseen transitions get
        # cnt=0 rows, so the smoothed mass laplace/(tot + laplace·K)
        # actually reaches them and K is the true state count
        states = df.select(F.col(state_col).alias("state")).distinct()
        grid = states.crossJoin(
            F.broadcast(states.select(F.col("state").alias("next_state")))
        )
        pairs = grid.join(pairs, ["state", "next_state"], "left").fillna(
            0, subset=["cnt"]
        )
        row_tot = F.sum("cnt").over(row_w)
        n_states = F.count("*").over(row_w)  # = K on the dense grid
        prob = (F.col("cnt") + F.lit(laplace)) / (row_tot + F.lit(laplace) * n_states)
    else:
        row_tot = F.sum("cnt").over(row_w)
        prob = F.col("cnt") / row_tot
    return pairs.withColumn("prob", prob)


def zscore_params(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Normalization-params table (J4) — one tiny row of mean/std per col,
    meant for a broadcast join. reference: augmentation_evaluator.py:250-274."""
    aggs = []
    for c in cols:
        aggs += [F.mean(c).alias(f"{c}_mean"), F.stddev_samp(c).alias(f"{c}_std")]
    return df.agg(*aggs)


def zscore(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Apply z-score normalization via a broadcast crossJoin of the params
    row — no collect, stays a narrow plan after the tiny join."""
    params = F.broadcast(zscore_params(df, cols))
    out = df.crossJoin(params)
    for c in cols:
        out = out.withColumn(c, (F.col(c) - F.col(f"{c}_mean")) / F.col(f"{c}_std"))
    return out.drop(*[f"{c}_mean" for c in cols], *[f"{c}_std" for c in cols])


def dsum(expr: Column | str) -> Column:
    """Layout-DETERMINISTIC sum of a double expression.

    Raw ``SUM(double)`` merges partial sums in shuffle/task-completion
    order, so the total drifts in the last ulp when the partition
    layout (or even fetch order) changes — the r11 cross-layout checks
    caught exactly this class in the ridge A/B and segment-cluster
    paths. Fix: compute each per-row term in double (bit-deterministic
    per row), quantize to fixed point, and sum in DECIMAL — decimal
    addition is associative and commutative, so the merged total is a
    pure function of the input SET, independent of partitioning, task
    order, and shuffle fetch order. Quantization is 1e-12 per term;
    DECIMAL(38,12) leaves 26 integer digits of headroom (sums of
    squared O(1e4) values stay exact past 1e20 rows). At 100 TB this
    matters beyond testing: re-running the same job twice produces
    byte-identical aggregates, which is what makes results cacheable
    and diffs meaningful.

    NULL/NaN contract: like SQL SUM, NULL terms are skipped — and NaN
    terms become NULL under the decimal cast, so they are skipped too
    (raw SUM(double) would instead poison the total to NaN; pinned in
    tests). The same cast-to-NULL skip applies to ±Infinity and to any
    |term| >= 1e26 (out of DECIMAL(38,12) range): in an ANSI session
    the cast throws (loud), but in a NON-ANSI session such terms are
    silently dropped, producing a plausible-looking finite total where
    raw SUM(double) would have visibly gone to ±Inf. Callers whose
    inputs can legitimately contain NaN/Inf or exceed 1e26 must
    pre-check with isfinite + a magnitude bound; every current call
    site (ridge Gram/MAE, segment moments, k-means updates) feeds
    finite, bounded expressions by construction (inputs are z-scored
    or price-scale data, orders of magnitude under the 1e26 edge)."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(col.cast("decimal(38,12)")).cast("double")


def dmean_dstd(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    sample: bool = True,
) -> DataFrame:
    """Deterministic grouped mean/std via exact decimal moment sums:
    mean = Σx/n and var = (Σx² − (Σx)²/n)/(n−1 or n) computed from
    exact (decimal) Σx and Σx², so the result is layout-independent.
    Returns (group_cols…, n, mean_v, std_v)."""
    g = df.groupBy(*group_cols).agg(
        F.count(value_col).alias("n"),
        dsum(F.col(value_col)).alias("_sx"),
        dsum(F.col(value_col) * F.col(value_col)).alias("_sxx"),
    )
    n = F.col("n").cast("double")
    mean = F.col("_sx") / n
    denom = n - F.lit(1.0) if sample else n
    var = (F.col("_sxx") - F.col("_sx") * F.col("_sx") / n) / denom
    std = F.when(denom > 0, F.sqrt(F.greatest(var, F.lit(0.0)))).otherwise(0.0)
    return g.select(
        *group_cols, "n", mean.alias("mean_v"), std.alias("std_v")
    )


def dsum_scaled(expr: Column | str, quantum: float = 1e-6) -> Column:
    """Deterministic sum via PRIMITIVE long accumulation — the fast
    sibling of ``dsum`` for bounded terms: each per-row double term is
    rounded to an integral multiple of ``quantum`` (the integral double
    is exact below 2^53, so the long conversion is lossless) and summed
    as a 64-bit integer — associative, order-independent, and
    whole-stage-codegen-friendly (measured ~3.7x faster than the
    decimal path on a 105-expression Gram aggregate).

    SAFETY CONTRACT (caller-checked, post-hoc): per-row
    |expr|/quantum must stay under 2^52 and n·max|expr|/quantum under
    2^62, else the long path silently wraps. Callers aggregate
    count(*) and max(abs(term)) — both order-independent and
    overflow-free — in the SAME pass and fall back to ``dsum``
    (DECIMAL(38,12), 26 integer digits of headroom) when the measured
    bounds fail. See ``long_sum_safe``."""
    col = F.col(expr) if isinstance(expr, str) else expr
    inv = 1.0 / quantum
    # floor(x+0.5), NOT round(): Spark's round on doubles detours
    # through BigDecimal (as expensive as the decimal path this fast
    # sibling exists to avoid); floor is a primitive and returns LONG
    # directly. Half-up vs half-even doesn't matter — any fixed
    # per-row rule is deterministic, which is the whole contract.
    return F.sum(F.floor(col * inv + F.lit(0.5))).cast("double") * quantum


def long_sum_safe(max_abs_term: float, n_rows: int, quantum: float = 1e-6) -> bool:
    """Post-hoc validity check for ``dsum_scaled``: True iff every
    per-row quantized term was exactly representable (< 2^52) and the
    total could not have wrapped 64-bit (< 2^62, 2x margin)."""
    if max_abs_term is None or n_rows is None:
        return True  # empty input: sum is NULL/0 either way
    q = float(max_abs_term) / quantum
    return q < 2.0**52 and float(n_rows) * q < 2.0**62
