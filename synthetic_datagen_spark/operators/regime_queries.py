"""Regime-stack catalog entries (SURVEY §2.11 M5/M6, §2.10 G6/G7) —
rows-only (EM/MLE fits are not SQL-expressible; invariants live in
tests/test_regime.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..regime import RegimeModel, RegimeGenerator, fit_garch_grid, regime_features
from ..sources import Catalog
from .base import register


@register(
    "g7_regime_garch_generate",
    oracle=None,
    doc="Full regime pipeline: features (W1+W4+W5) → MLlib GaussianMixture "
    "regime labels (M5 scale path) → A8 per-regime stats + A7 transition "
    "matrix → Spark-parallel GARCH(1,1) grid MLE (M6) → per-series "
    "applyInPandas AR(1)+GARCH generation (G6/G7, W16).",
)
def g7_regime_garch_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        Catalog(spark, sf_dir)
        .table("events")
        .filter(F.col("event_type") == "click")
        .select("ts", "event_id", "value")
    )
    feats = regime_features(ev, "value", [], ["ts", "event_id"]).withColumn(
        "series", F.lit(0)
    )
    feats = feats.persist()
    model = RegimeModel(n_regimes=3, seed=42).fit(feats, ["series"])
    garch = fit_garch_grid(spark, model.regime_returns())
    p0 = ev.orderBy("ts", "event_id").select("value").first()[0]
    gen = RegimeGenerator(model, garch, p0=p0)
    out = gen.generate(spark, seed=42, n_samples=150, n_series=3)
    feats.unpersist()
    return out
