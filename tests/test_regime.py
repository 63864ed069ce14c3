"""Regime-stack invariants: transition matrix row-stochastic, GARCH
params stationary, generation deterministic (reference contracts from
regime_hmm_garch / test_regime_generator, SURVEY §5)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from synthetic_datagen_spark.regime import (
    RegimeGenerator,
    RegimeModel,
    fit_garch_grid,
    regime_features,
)
from synthetic_datagen_spark.sources import Catalog


@pytest.fixture(scope="module")
def fitted(spark, sf_smoke):
    ev = (
        Catalog(spark, sf_smoke)
        .table("events")
        .filter(F.col("event_type") == "click")
        .select("ts", "event_id", "value")
    )
    feats = regime_features(ev, "value", [], ["ts", "event_id"]).withColumn(
        "series", F.lit(0)
    ).persist()
    model = RegimeModel(n_regimes=3, seed=42).fit(feats, ["series"])
    garch = fit_garch_grid(spark, model.regime_returns())
    return ev, model, garch


def test_transition_matrix_row_stochastic(fitted):
    _, model, _ = fitted
    assert model.trans.shape == (3, 3)
    np.testing.assert_allclose(model.trans.sum(axis=1), 1.0, rtol=1e-9)
    assert (model.trans >= 0).all()
    np.testing.assert_allclose(model.start.sum(), 1.0, rtol=1e-9)


def test_per_regime_stats_complete(fitted):
    _, model, _ = fitted
    for r in range(3):
        s = model.stats[r]
        assert s["sigma"] > 0
        assert -0.99 <= s["ar1"] <= 0.99


def test_garch_params_stationary(fitted):
    _, _, garch = fitted
    assert garch, "grid fit returned nothing"
    for p in garch.values():
        assert p["alpha"] + p["beta"] < 1.0
        assert p["omega"] > 0
        assert np.isfinite(p["loglik"])


def test_regime_generation_deterministic(spark, fitted):
    ev, model, garch = fitted
    gen = RegimeGenerator(model, garch, p0=100.0)
    a = sorted(
        (r.series_id, r.t, r.regime, round(r.price, 9))
        for r in gen.generate(spark, 42, 100, n_series=2).collect()
    )
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = sorted(
            (r.series_id, r.t, r.regime, round(r.price, 9))
            for r in gen.generate(spark, 42, 100, n_series=2).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b
    c = sorted(
        (r.series_id, r.t, r.regime, round(r.price, 9))
        for r in gen.generate(spark, 7, 100, n_series=2).collect()
    )
    assert a != c
    raw = gen.generate(spark, 42, 100, n_series=2).collect()
    assert all(r.price > 0 for r in raw)
    assert all(0 <= r.regime < 3 for r in raw)
