"""Flagship query — the per-series "statistical health panel".

One pass over `events` that exercises the engine's whole time-series
core (SURVEY §7 phase 0): scan → per-series lag windows (log-returns) →
running windows (peak/drawdown) → multi-aggregate panel with moments,
autocorrelation, volatility clustering — i.e. the Spark form of the
reference's evaluate-mode metric battery
(reference: distribution_evaluator.py:74-116,
 evaluate_all_generators.py:115-171).

Plan shape: one shuffle on the series key for the windows, one
aggregation — all whole-stage-codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources import Catalog
from .base import register


@register(
    "flagship_series_panel",
    oracle="""
WITH base AS (
  SELECT event_type, ts, event_id, value,
         LN(GREATEST(value, 1e-10)) AS lp
  FROM events
), r AS (
  SELECT event_type, ts, event_id, value,
         lp - LAG(lp) OVER w AS log_ret,
         (value - MAX(value) OVER pw) / MAX(value) OVER pw AS dd
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id),
         pw AS (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), lagged AS (
  SELECT event_type, value, log_ret, dd,
         LAG(log_ret) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS lr1,
         ABS(log_ret) AS abs_r,
         LAG(ABS(log_ret)) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS abs_r1
  FROM r
)
SELECT event_type,
       COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS mean_value,
       ROUND(STDDEV_POP(log_ret), 6) AS ret_std,
       ROUND(CORR(log_ret, lr1), 6) AS ac1,
       ROUND(CORR(abs_r, abs_r1), 6) AS vol_cluster,
       ROUND(MIN(dd), 6) AS max_drawdown,
       ROUND(MIN(value), 6) AS min_value,
       ROUND(MAX(value), 6) AS max_value
FROM lagged
GROUP BY event_type
""",
    doc="Flagship: full per-series statistical panel in one windowed pass.",
)
def flagship_series_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lp = F.log(F.greatest(F.col("value"), F.lit(1e-10)))
    peak = F.max("value").over(pw)
    d = ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        (lp - F.lag(lp).over(w)).alias("log_ret"),
        ((F.col("value") - peak) / peak).alias("dd"),
    )
    d = d.select(
        "event_type",
        "value",
        "log_ret",
        "dd",
        F.lag("log_ret").over(w).alias("lr1"),
        F.abs("log_ret").alias("abs_r"),
        F.lag(F.abs("log_ret")).over(w).alias("abs_r1"),
    )
    return d.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double") / F.count("*"), 6
        ).alias("mean_value"),
        F.round(F.stddev_pop("log_ret"), 6).alias("ret_std"),
        F.round(F.corr("log_ret", "lr1"), 6).alias("ac1"),
        F.round(F.corr("abs_r", "abs_r1"), 6).alias("vol_cluster"),
        F.round(F.min("dd"), 6).alias("max_drawdown"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )
