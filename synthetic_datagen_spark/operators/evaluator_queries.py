"""Evaluator catalog entries (SURVEY §2.9 D8/D9, §2.11 M10/M11) —
rows-only (they orchestrate multi-metric pipelines incl. FFT kernels)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..evaluators import DistributionEvaluator, PredictiveEvaluator, composite_score
from ..functions import timeseries as TS
from ..generators import BlockBootstrapGenerator
from ..sources import Catalog
from .base import register


@register(
    "d8_composite_score",
    oracle=None,
    doc="D8 composite quality score between two series: full metric "
    "panel (JS/KS/W1/ACF/vol-cluster/Hurst/spectral) → weighted score "
    "(reference: composite_metric.py:66-153).",
)
def d8_composite_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    metrics = DistributionEvaluator().evaluate(
        ev, "value", "event_type", "purchase", "click", ["ts", "event_id"]
    )
    comps = composite_score(metrics)
    rows = [(k, float(v)) for k, v in {**metrics, **comps}.items()]
    return spark.createDataFrame(rows, ["metric", "value"])


@register(
    "m11_predictive_utility",
    oracle=None,
    doc="M11 predictive-utility A/B: W10 windows in Spark, ridge "
    "predictor fitted from distributed Gram aggregates (no training row "
    "reaches the driver), baseline-vs-augmented MAE deltas "
    "(reference: predictive_evaluator.py:169-287).",
)
def m11_predictive_utility(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        Catalog(spark, sf_dir)
        .table("events")
        .filter(F.col("event_type") == "click")
        .select("ts", "event_id", "value")
    )
    train, rest = TS.chrono_split(ev, 0.7, [], ["ts", "event_id"])
    val, test = TS.chrono_split(rest, 0.5, [], ["ts", "event_id"])
    gen = BlockBootstrapGenerator(block_size=25).fit(train, "value", ["ts", "event_id"])
    syn = gen.generate(spark, seed=42, n_samples=300, n_series=1).select(
        F.col("t").alias("ts"), F.col("t").alias("event_id"), F.col("price").alias("value")
    )
    out = PredictiveEvaluator(window=12, horizon=1).evaluate(
        train, syn, val, test, "value", [], ["ts", "event_id"]
    )
    return spark.createDataFrame(
        [(k, float(v)) for k, v in out.items()], ["metric", "value"]
    )


_D4_SQL = """
WITH r AS (
  SELECT event_type, ts, event_id,
         LN(GREATEST(value, 1e-10))
           - LAG(LN(GREATEST(value, 1e-10))) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS lr
  FROM events
), d1 AS (
  SELECT event_type, ts, event_id, lr,
         LAG(lr) OVER w AS ylag,
         lr - LAG(lr) OVER w AS dy
  FROM r WHERE lr IS NOT NULL
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), d2 AS (
  SELECT event_type, ylag, dy,
         LAG(dy) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dylag
  FROM d1
), g AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(ylag) AS s_yl, SUM(dylag) AS s_dl, SUM(dy) AS s_dy,
         SUM(ylag*ylag) AS s_ylyl, SUM(ylag*dylag) AS s_yldl,
         SUM(dylag*dylag) AS s_dldl, SUM(ylag*dy) AS s_yldy,
         SUM(dylag*dy) AS s_dldy, SUM(dy*dy) AS s_dydy
  FROM d2 WHERE dylag IS NOT NULL GROUP BY event_type
), cr AS (
  SELECT *,
     n*(s_ylyl*s_dldl - s_yldl*s_yldl)
       - s_yl*(s_yl*s_dldl - s_yldl*s_dl)
       + s_dl*(s_yl*s_yldl - s_ylyl*s_dl) AS det
  FROM g
), b AS (
  SELECT *,
    (s_dy*(s_ylyl*s_dldl - s_yldl*s_yldl)
       - s_yl*(s_yldy*s_dldl - s_yldl*s_dldy)
       + s_dl*(s_yldy*s_yldl - s_ylyl*s_dldy)) / det AS b0,
    (n*(s_yldy*s_dldl - s_yldl*s_dldy)
       - s_dy*(s_yl*s_dldl - s_yldl*s_dl)
       + s_dl*(s_yl*s_dldy - s_yldy*s_dl)) / det AS b1,
    (n*(s_ylyl*s_dldy - s_yldy*s_yldl)
       - s_yl*(s_yl*s_dldy - s_yldy*s_dl)
       + s_dy*(s_yl*s_yldl - s_ylyl*s_dl)) / det AS b2,
    (n*s_dldl - s_dl*s_dl) / det AS inv11
  FROM cr WHERE ABS(det) >= 1e-250
), fin AS (
  SELECT event_type, n, inv11,
     s_dydy - 2*(b0*s_dy + b1*s_yldy + b2*s_dldy)
       + (n*b0*b0 + s_ylyl*b1*b1 + s_dldl*b2*b2
          + 2*s_yl*b0*b1 + 2*s_dl*b0*b2 + 2*s_yldl*b1*b2) AS rss,
     b1
  FROM b
), stats AS (
  SELECT event_type, n,
     CASE WHEN n < 8 OR rss <= 0 OR inv11 <= 0 THEN -1.0
          ELSE b1 / SQRT(rss / (n - 3) * inv11) END AS stat,
     (n < 8 OR rss <= 0 OR inv11 <= 0) AS degenerate
  FROM fin
)
SELECT event_type, ROUND(stat, 6) AS adf_stat,
       CASE WHEN degenerate THEN -1.0
            ELSE ROUND(CASE WHEN stat <= -3.43 THEN 0.01 WHEN stat <= -3.12 THEN 0.01 + (stat - (-3.43)) * 0.04838709677419355 WHEN stat <= -2.86 THEN 0.025 + (stat - (-3.12)) * 0.09615384615384608 WHEN stat <= -2.57 THEN 0.05 + (stat - (-2.86)) * 0.17241379310344826 WHEN stat <= -1.57 THEN 0.1 + (stat - (-2.57)) * 0.40000000000000013 WHEN stat <= -0.44 THEN 0.5 + (stat - (-1.57)) * 0.35398230088495575 WHEN stat <= -0.07 THEN 0.9 + (stat - (-0.44)) * 0.13513513513513495 WHEN stat <= 0.23 THEN 0.95 + (stat - (-0.07)) * 0.0833333333333334 WHEN stat <= 0.6 THEN 0.975 + (stat - (0.23)) * 0.04054054054054058 ELSE 0.99 END, 3) END AS p_value,
       n
FROM stats
UNION ALL
SELECT event_type, -1.0 AS adf_stat, -1.0 AS p_value, n
FROM cr WHERE ABS(det) < 1e-250
"""


@register(
    "d4_adf_stationarity",
    oracle=_D4_SQL,  # closed-form Cramer solve, identical arithmetic both engines
    doc="D4 ADF stationarity panel per series: the ADF(1) regression as "
    "ten distributed sum-of-product aggregates (one pass) + a 3×3 solve "
    "per series on the driver; p-value from asymptotic τ_μ quantiles "
    "(reference wraps statsmodels adfuller, distribution_evaluator.py:"
    "49-54 — same −1.0 degenerate sentinel).",
)
def d4_adf_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..evaluators.stationarity import adf_panel

    ev = Catalog(spark, sf_dir).table("events")
    d = TS.log_returns(ev, "value", ["event_type"], ["ts", "event_id"]).filter(
        F.col("log_ret").isNotNull()
    )
    rows = adf_panel(d, "log_ret", ["event_type"], ["ts", "event_id"])
    return spark.createDataFrame(
        [
            (r["event_type"], round(r["adf_stat"], 6), round(r["p_value"], 3), r["n"])
            for r in sorted(rows, key=lambda x: x["event_type"])
        ],
        "event_type STRING, adf_stat DOUBLE, p_value DOUBLE, n BIGINT",
    )


@register(
    "d5_spectral_distance",
    oracle=None,  # FFT kernel: not SQL-expressible
    doc="D5 spectral distance between two series: per-side normalized "
    "FFT power spectrum via one grouped-map task each, RMSE join "
    "(reference: composite_metric.py:50-56).",
)
def d5_spectral_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..evaluators.distribution import spectral_distance

    ev = Catalog(spark, sf_dir).table("events")
    v = spectral_distance(ev, "value", "event_type", "purchase", "click", ["ts", "event_id"])
    return spark.createDataFrame([("spectral_distance", float(round(v, 6)))], ["metric", "value"])


@register(
    "d9_tolerance_panel",
    oracle=None,  # multi-seed generate→evaluate orchestration
    doc="D9/A11 multi-seed tolerance analysis: block-bootstrap generate "
    "per seed → moment panel per seed → across-seed mean/std/min/max/"
    "range, max relative deviation and the DOIN margin "
    "min(2·max_rel_dev, 0.5) (reference: measure_tolerance.py:304-336).",
)
def d9_tolerance_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..evaluators.tolerance import tolerance_panel
    from ..generators import BlockBootstrapGenerator

    ev = (
        Catalog(spark, sf_dir)
        .table("events")
        .filter(F.col("event_type") == "click")
        .select("ts", "event_id", "value")
    )
    gen = BlockBootstrapGenerator(block_size=25).fit(ev, "value", ["ts", "event_id"])

    def metrics(seed: int) -> dict[str, float]:
        syn = gen.generate(spark, seed=seed, n_samples=400, n_series=1)
        r = TS.log_returns(syn, "price", ["series_id"], ["t"])
        row = r.agg(
            F.mean("log_ret").alias("mean"),
            F.stddev_pop("log_ret").alias("std"),
            F.min("price").alias("min_p"),
            F.max("price").alias("max_p"),
        ).first()
        return {
            "ret_mean": row["mean"] or 0.0,
            "ret_std": row["std"] or 0.0,
            "price_range": (row["max_p"] or 0.0) - (row["min_p"] or 0.0),
        }

    out = tolerance_panel(spark, metrics, seeds=[11, 22, 33])
    cols = [c for c in out.columns if c != "metric"]
    return out.select("metric", *[F.round(c, 6).alias(c) for c in cols])
