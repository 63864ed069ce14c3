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




def _d4_autolag_oracle() -> str:
    from ..evaluators.adf_autolag import oracle_sql

    return oracle_sql()


@register(
    "d4_adf_stationarity",
    oracle=_d4_autolag_oracle(),  # generated Cholesky solve, identical tree both engines
    doc="D4 ADF stationarity panel per series with statsmodels-parity "
    "lag selection (maxlag=20, autolag=AIC — reference: "
    "distribution_evaluator.py:49-54): nested-model AIC on the maxlag-"
    "trimmed sample, refit of the chosen lag on its full sample, t-stat "
    "of y_{t-1}. Distributed Gram sums (one filtered-aggregate pass, "
    "map-side combined), per-series solve from a generated step list "
    "evaluated identically in Python (engine) and SQL (oracle); "
    "p-value from asymptotic τ_μ quantiles, −1.0 degenerate sentinel.",
)
def d4_adf_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..evaluators.adf_autolag import adf_autolag_panel

    ev = Catalog(spark, sf_dir).table("events")
    d = TS.log_returns(ev, "value", ["event_type"], ["ts", "event_id"]).filter(
        F.col("log_ret").isNotNull()
    )
    rows = adf_autolag_panel(d, "log_ret", ["event_type"], ["ts", "event_id"])
    return spark.createDataFrame(
        [
            (
                r["event_type"],
                round(r["adf_stat"], 6) if r["adf_stat"] != -1.0 else -1.0,
                round(r["p_value"], 3) if r["p_value"] != -1.0 else -1.0,
                r["used_lag"],
                r["n"],
            )
            for r in sorted(rows, key=lambda x: x["event_type"])
        ],
        "event_type STRING, adf_stat DOUBLE, p_value DOUBLE, used_lag BIGINT, n BIGINT",
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


@register(
    "m10_lstm_predictive_utility",
    oracle=None,  # SGD-trained recurrent predictor: rows-only + tests
    doc="M10/M11 predictive-utility A/B with the reference's predictor "
    "family: numpy LSTM(H) -> Dense(relu) -> Dense(1), adam, mse, early "
    "stopping with best-weight restore (predictive_evaluator.py:75-135; "
    "gradients verified against finite differences in tests). Training "
    "consumes a bounded sorted window sample driver-side like the "
    "reference's Keras loop; val/test MAE is a distributed mapInPandas "
    "scoring pass with broadcast weights.",
)
def m10_lstm_predictive_utility(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    out = PredictiveEvaluator(
        window=8, horizon=1, predictor="lstm",
        hidden=12, dense=8, epochs=8, patience=3, max_train_rows=1200, seed=42,
    ).evaluate(train, syn, val, test, "value", [], ["ts", "event_id"])
    return spark.createDataFrame(
        [(k, float(v)) for k, v in out.items()], ["metric", "value"]
    )


@register(
    "m13_external_predictor_eval",
    oracle=None,  # subprocess round-trip: rows-only + protocol tests
    doc="M13 external-predictor evaluation protocol: datasets hand off "
    "as CSVs + a normalization-params JSON, an out-of-process predictor "
    "(here a last-value-MAE stand-in) writes metrics JSON back, the "
    "synthetic series is rescaled to the real train's mean/std before "
    "the augmented run, and the baseline is memoized (M12) "
    "(reference: augmentation_evaluator.py:138-447, "
    "predictive_evaluator.py:291-411).",
)
def m13_external_predictor_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    import sys
    import tempfile
    import os

    from ..evaluators import ExternalPredictorEvaluator
    from ..generators import BlockBootstrapGenerator as BBG

    ev = (
        Catalog(spark, sf_dir)
        .table("events")
        .filter(F.col("event_type") == "click")
        # epoch-double ts so the synthetic index series unions cleanly
        .select(F.col("ts").cast("double").alias("ts"), "event_id", "value")
    )
    train, rest = TS.chrono_split(ev, 0.7, [], ["ts", "event_id"])
    val, test = TS.chrono_split(rest, 0.5, [], ["ts", "event_id"])
    gen = BBG(block_size=25).fit(train, "value", ["ts", "event_id"])
    syn = gen.generate(spark, seed=42, n_samples=200, n_series=1).select(
        F.col("t").cast("double").alias("ts"),
        F.col("t").alias("event_id"),
        F.col("price").alias("value"),
    )
    script = (
        "import argparse, json, pandas as pd\n"
        "p = argparse.ArgumentParser()\n"
        "for a in ('train','val','test','norm','out'):\n"
        "    p.add_argument('--'+a)\n"
        "a = p.parse_args()\n"
        "def mae(path):\n"
        "    s = pd.read_csv(path)['value']\n"
        "    return float(s.diff().abs().mean())\n"
        "json.dump({'val_mae': mae(a.val), 'test_mae': mae(a.test)}, open(a.out, 'w'))\n"
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "predictor.py")
        with open(path, "w") as f:
            f.write(script)
        out = ExternalPredictorEvaluator(
            [sys.executable, path], max_rows=5000
        ).evaluate(train, syn, val, test, ["ts", "event_id"])
    return spark.createDataFrame(
        [(k, float(v)) for k, v in out.items()], ["metric", "value"]
    )
