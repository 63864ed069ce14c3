"""Time-series window operators (SURVEY §2.5) as DataFrame transforms.

Every builder here takes/returns DataFrames and composes lazily — the
physical plan is a single pass of window evaluation per partition key.

Scale discipline: every window is partitioned by a series key
(``partition_cols``). An unpartitioned ``Window.orderBy(ts)`` collapses
the whole table onto ONE task — the #1 Spark-native hazard for this
workload (SURVEY §4.3). The reference's single global series is the
degenerate 1-series case; our engine always carries a series key
(event_type / user_id / series_id) so at 100 TB the work spreads over
all executors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec, functions as F


def series_window(partition_cols: Sequence[str], order_cols: Sequence[str]) -> WindowSpec:
    """Ordered per-series window. Order keys should end with a unique
    tiebreaker (e.g. event_id) so results are deterministic under ties."""
    return Window.partitionBy(*partition_cols).orderBy(*order_cols)


def log_returns(
    df: DataFrame,
    value_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "log_ret",
    clip_floor: float = 1e-10,
) -> DataFrame:
    """W1 — log-returns via lag-diff: log(p_t) - log(p_{t-1}).

    reference: app/data_processor.py:44-47 (np.diff(np.log(prices)));
    P5 clip before log: regime_hmm_garch.py:67.
    """
    w = series_window(partition_cols, order_cols)
    p = F.greatest(F.col(value_col), F.lit(clip_floor))
    return df.withColumn(out_col, F.log(p) - F.log(F.lag(p, 1).over(w)))


def reconstruct_prices(
    df: DataFrame,
    ret_col: str,
    p0_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "price",
) -> DataFrame:
    """W2 — price reconstruction exp(cumsum(returns) + log(p0)).

    reference: app/data_processor.py:50-54. The multiplicative chain is
    rewritten as a log-space prefix sum, which Spark evaluates as a
    running window aggregate (parallel within each series partition).
    """
    w = (
        series_window(partition_cols, order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.coalesce(F.col(ret_col), F.lit(0.0))).over(w)
    return df.withColumn(out_col, F.exp(cum + F.log(F.col(p0_col))))


def rolling_std(
    df: DataFrame,
    value_col: str,
    window_rows: int,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "roll_std",
    min_periods: int = 1,
    sample: bool = True,
) -> DataFrame:
    """W4 — rolling standard deviation over the trailing ``window_rows``.

    reference: regime_hmm_garch.py:68-70 (pandas rolling(...).std() is
    sample std, ddof=1 — hence ``sample=True`` default). ``min_periods``
    mirrors pandas: fewer observations → NULL.
    """
    w = series_window(partition_cols, order_cols).rowsBetween(-(window_rows - 1), 0)
    std = F.stddev_samp(value_col) if sample else F.stddev_pop(value_col)
    std = std.over(w)
    guard = F.count(value_col).over(w) >= min_periods
    return df.withColumn(out_col, F.when(guard, std))


def vol_ratio(short_col: str, long_col: str, eps: float = 1e-10) -> Column:
    """W5 — volatility ratio with divide-by-zero guard.
    reference: regime_hmm_garch.py:70."""
    return F.when(F.col(long_col) > eps, F.col(short_col) / F.col(long_col)).otherwise(
        F.lit(1.0)
    )


def lag_autocorr(
    df: DataFrame,
    value_col: str,
    lag: int,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    group_cols: Sequence[str] | None = None,
    out_col: str = "autocorr",
) -> DataFrame:
    """W6/J1 — lag-k autocorrelation corr(x_t, x_{t-k}) per series.

    reference: distribution_evaluator.py:43-46. Expressed as
    corr-with-lag over a window — no physical self-join, one shuffle on
    the series key.
    """
    w = series_window(partition_cols, order_cols)
    lagged = F.lag(value_col, lag).over(w)
    group_cols = list(group_cols if group_cols is not None else partition_cols)
    pre = df.select(*partition_cols, F.col(value_col).alias("_x"), lagged.alias("_xl"))
    return pre.groupBy(*group_cols).agg(F.corr("_x", "_xl").alias(out_col))


def volatility_clustering(
    df: DataFrame,
    ret_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "vol_cluster",
) -> DataFrame:
    """W7 — lag-1 autocorrelation of |returns|.
    reference: composite_metric.py:59-63."""
    d = df.withColumn("_abs_r", F.abs(F.col(ret_col)))
    return lag_autocorr(d, "_abs_r", 1, partition_cols, order_cols, out_col=out_col)


def leverage_effect(
    df: DataFrame,
    ret_col: str,
    k: int,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "leverage",
) -> DataFrame:
    """W8 — corr(ret_t, |ret_{t+k}|). reference: evaluate_all_generators.py:77-82."""
    w = series_window(partition_cols, order_cols)
    lead_abs = F.abs(F.lead(ret_col, k).over(w))
    pre = df.select(*partition_cols, F.col(ret_col).alias("_r"), lead_abs.alias("_la"))
    return pre.groupBy(*partition_cols).agg(F.corr("_r", "_la").alias(out_col))


def max_drawdown(
    df: DataFrame,
    price_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "max_drawdown",
) -> DataFrame:
    """W9 — running max then min((p - peak)/peak) per series.
    reference: evaluate_all_generators.py:110-113."""
    w = (
        series_window(partition_cols, order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peak = F.max(price_col).over(w)
    d = df.withColumn("_dd", (F.col(price_col) - peak) / peak)
    return d.groupBy(*partition_cols).agg(F.min("_dd").alias(out_col))


def sliding_windows(
    df: DataFrame,
    value_col: str,
    window_rows: int,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "window_vec",
    id_col: str = "window_id",
) -> DataFrame:
    """W3 — overlapping sliding windows as array columns.

    reference: app/data_processor.py:59-65 — the (N-W+1, W) matrix
    becomes a long-form DataFrame (series, window_id, array<double>).
    Only full windows are kept, matching the reference shape.
    """
    w = series_window(partition_cols, order_cols)
    wr = w.rowsBetween(-(window_rows - 1), 0)
    return (
        df.withColumn(out_col, F.collect_list(value_col).over(wr))
        .withColumn(id_col, F.row_number().over(w) - window_rows)
        .filter(F.size(out_col) == window_rows)
    )


def supervised_windows(
    df: DataFrame,
    value_col: str,
    window_rows: int,
    horizon: int,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """W10 — (X window, y = value at +horizon) pairs.
    reference: predictive_evaluator.py:54-72."""
    w = series_window(partition_cols, order_cols)
    d = sliding_windows(df, value_col, window_rows, partition_cols, order_cols, "x")
    return d.withColumn("y", F.lead(value_col, horizon).over(w)).filter(
        F.col("y").isNotNull()
    )


def chrono_split(
    df: DataFrame,
    frac: float,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """W15 — chronological train/val split at ``frac`` per series.
    reference: timegan_generator.py:103-109 (last 15% = validation)."""
    w = series_window(partition_cols, order_cols)
    d = df.withColumn("_pr", F.percent_rank().over(w))
    return (
        d.filter(F.col("_pr") <= frac).drop("_pr"),
        d.filter(F.col("_pr") > frac).drop("_pr"),
    )


def cyclical_time_features(df: DataFrame, ts_col: str) -> DataFrame:
    """Temporal feature matrix — sin/cos of hour(24) / dow(5) / month(12).

    reference: app/data_processor.py:70-92. Note the trading-week period
    of 5 for day-of-week, exactly as the reference.
    """
    two_pi = 2.0 * 3.141592653589793
    hour = F.hour(ts_col).cast("double")
    # Spark dayofweek: Sun=1..Sat=7 → Mon=0..Fri=4 like pandas weekday
    dow = ((F.dayofweek(ts_col) + 5) % 7).cast("double")
    month = (F.month(ts_col) - 1).cast("double")
    return (
        df.withColumn("hour_sin", F.sin(two_pi * hour / 24.0))
        .withColumn("hour_cos", F.cos(two_pi * hour / 24.0))
        .withColumn("dow_sin", F.sin(two_pi * dow / 5.0))
        .withColumn("dow_cos", F.cos(two_pi * dow / 5.0))
        .withColumn("month_sin", F.sin(two_pi * month / 12.0))
        .withColumn("month_cos", F.cos(two_pi * month / 12.0))
    )
