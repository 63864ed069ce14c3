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
