"""Regime feature pipeline (reference: regime_hmm_garch.py:64-74):
log-returns + short/long rolling volatility + vol ratio, NaN-filtered.

One windowed pass per series; the caller caches the result (the
reference's common-subexpression discipline, SURVEY §4.1)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions import timeseries as TS


def regime_features(
    df: DataFrame,
    value_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    short_win: int = 5,
    long_win: int = 20,
) -> DataFrame:
    """Returns input + (log_ret, vol_short, vol_long, vol_ratio, idx),
    rows with incomplete features dropped (P4 NaN mask)."""
    d = TS.log_returns(df, value_col, partition_cols, order_cols)
    d = TS.rolling_std(
        d, "log_ret", short_win, partition_cols, order_cols,
        out_col="vol_short", min_periods=short_win,
    )
    d = TS.rolling_std(
        d, "log_ret", long_win, partition_cols, order_cols,
        out_col="vol_long", min_periods=long_win,
    )
    d = d.withColumn("vol_ratio", TS.vol_ratio("vol_short", "vol_long"))
    w = TS.series_window(partition_cols, order_cols)
    d = d.withColumn("idx", F.row_number().over(w) - 1)
    return d.filter(
        F.col("log_ret").isNotNull()
        & F.col("vol_short").isNotNull()
        & F.col("vol_long").isNotNull()
    )
