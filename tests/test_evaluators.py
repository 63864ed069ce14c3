"""Evaluator invariants mirroring the reference's tests (SURVEY §5.1):
metric-key presence + non-negativity, near-zero score for identical
series, and the delta identity delta == augmented − baseline
(reference: tests/test_predictive_evaluator.py:45-69)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from synthetic_datagen_spark.evaluators import (
    DistributionEvaluator,
    PredictiveEvaluator,
    composite_score,
    tolerance_panel,
)
from synthetic_datagen_spark.functions import timeseries as TS
from synthetic_datagen_spark.sources import Catalog


def test_identical_series_scores_near_zero(spark, sf_smoke):
    ev = Catalog(spark, sf_smoke).table("events").filter(F.col("event_type") == "click")
    tagged = ev.withColumn("tag", F.lit("a")).unionByName(
        ev.withColumn("tag", F.lit("b"))
    )
    m = DistributionEvaluator().evaluate(tagged, "value", "tag", "a", "b", ["ts", "event_id"])
    assert m["js_div"] < 1e-6
    assert m["ks_stat"] < 1e-9
    assert m["wasserstein"] < 1e-9
    assert abs(m["std_ratio"] - 1.0) < 1e-9
    assert m["hurst_diff"] < 1e-9
    assert m["spectral_dist"] < 1e-12
    s = composite_score(m)
    assert s["score"] < 1e-6


def test_different_series_score_positive(spark, sf_smoke):
    ev = Catalog(spark, sf_smoke).table("events")
    m = DistributionEvaluator().evaluate(
        ev, "value", "event_type", "purchase", "click", ["ts", "event_id"]
    )
    for k, v in m.items():
        assert v == v, f"{k} is NaN"
    s = composite_score(m)
    assert s["score"] > 0


def test_predictive_delta_identity(spark, sf_smoke):
    ev = Catalog(spark, sf_smoke).table("events").filter(
        F.col("event_type") == "view"
    ).select("ts", "event_id", "value")
    train, rest = TS.chrono_split(ev, 0.7, [], ["ts", "event_id"])
    val, test = TS.chrono_split(rest, 0.5, [], ["ts", "event_id"])
    syn = train.limit(60)  # stand-in synthetic
    out = PredictiveEvaluator(window=8).evaluate(
        train, syn, val, test, "value", [], ["ts", "event_id"]
    )
    assert math.isclose(
        out["delta_val_mae"],
        out["augmented_val_mae"] - out["baseline_val_mae"],
        abs_tol=1e-8,
    )
    assert out["baseline_val_mae"] > 0
    assert out["augmented_test_mae"] > 0
    assert out["helps"] in (0.0, 1.0)


def test_tolerance_panel(spark):
    def metric_fn(seed: int) -> dict[str, float]:
        return {"m1": 1.0 + 0.01 * (seed % 3), "m2": 5.0}

    p = tolerance_panel(spark, metric_fn, [1, 2, 3, 4]).collect()
    rows = {r.metric: r for r in p}
    assert set(rows) == {"m1", "m2"}
    assert rows["m2"].range == 0.0
    assert rows["m2"].recommended_tolerance == 0.0
    assert 0 < rows["m1"].recommended_tolerance <= 0.5
    assert rows["m1"].max >= rows["m1"].mean >= rows["m1"].min
