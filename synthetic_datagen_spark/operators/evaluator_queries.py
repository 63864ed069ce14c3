"""Evaluator catalog entries (SURVEY §2.9 D8/D9, §2.11 M10/M11) —
rows-only (they orchestrate multi-metric pipelines incl. FFT kernels)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..evaluators import DistributionEvaluator, PredictiveEvaluator, composite_score
from ..functions import timeseries as TS
from ..generators import BlockBootstrapGenerator
from ..sources import Catalog
from .base import pinned_parquet_oracle, register


@register(
    "d8_composite_score",
    # The raw metric floats drift in the last ulp across partition
    # layouts (float partial sums inside the distribution kernels merge
    # in shuffle order — caught by the r11 cross-layout check). The
    # PANEL is a report, so it quantizes to 9 significant digits at the
    # output boundary: the ~1e-16-relative layout drift is absorbed by
    # the 1e-9-relative quantum, making the panel itself a pure function
    # of the input set — re-validated across 32- vs 200-partition
    # layouts, then pinned. Internal consumers (composite_score, the GA
    # fitness) keep full precision.
    # DOCUMENTED RESIDUAL RISK (r11 advisor): quantization absorbs the
    # drift probabilistically, not by construction — a metric landing
    # within ~1e-16-relative of a 9th-significant-digit rounding
    # boundary (probability ~1e-7 per metric per layout) would still
    # flip the rounded value against the bit-exact pin, and only the
    # 32- and 200-partition layouts were validated. Accepted as-is: the
    # alternative (routing every distribution kernel through the dsum
    # decimal path) costs ~2x on a 7-kernel panel for a one-in-1e7
    # flake; if the pin ever flakes on a new layout, that is the fix.
    oracle=pinned_parquet_oracle("d8_composite_score"),
    pinned_sf="0.01",
    doc="D8 composite quality score between two series: full metric "
    "panel (JS/KS/W1/ACF/vol-cluster/Hurst/spectral) → weighted score "
    "(reference: composite_metric.py:66-153). Panel values are "
    "quantized to 9 significant digits (reporting precision; the "
    "metrics' statistical meaning saturates far above 1e-9 relative).",
)
def d8_composite_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    metrics = DistributionEvaluator().evaluate(
        ev, "value", "event_type", "purchase", "click", ["ts", "event_id"]
    )
    comps = composite_score(metrics)
    rows = [
        (k, float(f"{float(v):.9g}")) for k, v in {**metrics, **comps}.items()
    ]
    return spark.createDataFrame(rows, ["metric", "value"])


@register(
    "m11_predictive_utility",
    # The r11 cross-layout check originally caught a last-ulp drift
    # here (raw SUM(double) Gram/MAE partials merge in shuffle order).
    # FIXED at the kernel, not hidden: the ridge path now accumulates
    # its Gram and MAE sums in DECIMAL (predictive._dsum — associative,
    # hence layout-independent), making the whole A/B panel a pure
    # function of the input set. Re-validated across 32- vs
    # 200-partition layouts, then pinned (parquet capture at sf0.01).
    oracle=pinned_parquet_oracle("m11_predictive_utility"),
    pinned_sf="0.01",
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




# Pinned VALUES at sf0.01 (tools/pin_oracles.py): the sweep is
# deterministic end-to-end (seeded generators, chrono splits with
# unique tiebreakers, numpy fits over driver-ordered arrays) and the
# panel floats are pre-rounded by the builder. Validated bit-identical
# across independent processes AND across the builder (32 shuffle
# partitions) vs plain-gate (200) session layouts.
_PIN_RATIO_SWEEP = """
SELECT * FROM (VALUES
  ('bb_bs10', CAST(250 AS BIGINT), CAST(10 AS BIGINT), CAST(37.191855 AS DOUBLE), CAST(37.959761 AS DOUBLE), CAST(1.4469 AS DOUBLE), CAST(-0.6743 AS DOUBLE), 'GOOD', FALSE, FALSE),
  ('bb_bs40', CAST(250 AS BIGINT), CAST(40 AS BIGINT), CAST(36.951362 AS DOUBLE), CAST(37.807023 AS DOUBLE), CAST(2.0842 AS DOUBLE), CAST(-0.2692 AS DOUBLE), 'GOOD', TRUE, FALSE),
  ('bb_n100', CAST(100 AS BIGINT), CAST(25 AS BIGINT), CAST(37.267945 AS DOUBLE), CAST(37.531138 AS DOUBLE), CAST(1.2453 AS DOUBLE), CAST(0.4624 AS DOUBLE), 'GOOD', FALSE, FALSE),
  ('bb_n250', CAST(250 AS BIGINT), CAST(25 AS BIGINT), CAST(37.142631 AS DOUBLE), CAST(37.518472 AS DOUBLE), CAST(1.5773 AS DOUBLE), CAST(0.496 AS DOUBLE), 'GOOD', FALSE, TRUE),
  ('gr_n100', CAST(100 AS BIGINT), CAST(0 AS BIGINT), CAST(37.706932 AS DOUBLE), CAST(37.874887 AS DOUBLE), CAST(0.082 AS DOUBLE), CAST(-0.4492 AS DOUBLE), 'GOOD', FALSE, FALSE)
) AS t("label", "n_samples", "block_size", "augmented_val_mae", "augmented_test_mae", "val_improvement_pct", "test_improvement_pct", "verdict", "best_val", "best_test")
"""


@register(
    "ratio_sweep_panel",
    oracle=_PIN_RATIO_SWEEP,  # generate→fit→score orchestration is not
    # SQL-expressible, but it IS deterministic — pinned at the gate scale
    pinned_sf="0.01",
    doc="Augmentation ratio sweep — the reference's experiment harness "
    "as one query (run_ratio_sweep.py:50-176: n_samples sweep, "
    "block-size sweep at fixed n, head-n subsample of a pre-generated "
    "set; run_option_a_eval.py:67-98: multi-generator panel; "
    "augmentation_evaluator.py:75-93 metric keys/verdict; best-of "
    "selection run_ratio_sweep.py:167-168). Spark-first: real/val/test "
    "window frames and the baseline fit are shared across every sweep "
    "point instead of re-running the full pipeline per point.",
)
def ratio_sweep_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..generators import GrasyndaGenerator

    ev = (
        Catalog(spark, sf_dir)
        .table("events")
        .filter(F.col("event_type") == "click")
        .select("ts", "event_id", "value")
    )
    train, rest = TS.chrono_split(ev, 0.7, [], ["ts", "event_id"])
    val, test = TS.chrono_split(rest, 0.5, [], ["ts", "event_id"])
    # four generator fits + the sweep's window build all scan train;
    # materialize the split once instead of re-running the ordered-split
    # chain per consumer
    train = train.persist()

    def as_series(df: DataFrame) -> DataFrame:
        return df.select(
            F.col("t").alias("ts"), F.col("t").alias("event_id"),
            F.col("price").alias("value"),
        )

    # The four generator fits are independent chains of Spark jobs over
    # the shared persisted train split (eager aggregates + sorted
    # collects inside fit); run them from driver threads so each
    # chain's stragglers back-fill the others' idle executors (guide
    # §2.6 — the same overlap the sweep itself and the m10/m11
    # evaluators already use). Every fit consumes the same
    # deterministically-ordered inputs, so results are unchanged.
    from concurrent.futures import ThreadPoolExecutor

    def fit_bb(bs: int) -> BlockBootstrapGenerator:
        return BlockBootstrapGenerator(block_size=bs).fit(
            train, "value", ["ts", "event_id"]
        )

    def fit_gr():
        # Part 3 — head-n subsample of a pre-generated set from another
        # generator (run_ratio_sweep.py:130-152's TimeGAN part; O2
        # truncate = orderBy + limit so "first n, they're sequential"
        # is deterministic), rescaled to the real train's mean/std
        # first the way the reference's augmentation protocol
        # normalizes synthetic data before the augmented run
        # (augmentation_evaluator.py — the same J4 step m13 applies)
        gr = GrasyndaGenerator(n_states=8).fit(train, "value", ["ts", "event_id"])
        # persist: the walk otherwise re-generates for the stat agg,
        # the sweep's window build, and the union scan
        cached = as_series(
            gr.generate(spark, seed=42, n_samples=250, n_series=1)
            .orderBy("series_id", "t")
            .limit(100)
        ).persist()
        stat = cached.agg(
            F.mean("value").alias("m"), F.stddev_pop("value").alias("s")
        ).first()
        return cached, stat

    with ThreadPoolExecutor(max_workers=5) as pool:
        f_bb25 = pool.submit(fit_bb, 25)
        f_bb10 = pool.submit(fit_bb, 10)
        f_bb40 = pool.submit(fit_bb, 40)
        f_gr = pool.submit(fit_gr)
        f_tstat = pool.submit(
            lambda: train.agg(
                F.mean("value").alias("m"), F.stddev_pop("value").alias("s")
            ).first()
        )
        bb25, bb10, bb40 = f_bb25.result(), f_bb10.result(), f_bb40.result()
        sub_cached, gstat = f_gr.result()
        tstat = f_tstat.result()

    variants: list[tuple[str, DataFrame, dict]] = []
    # Part 1 — ratio sweep at fixed block size (run_ratio_sweep.py:68-90)
    for n in (100, 250):
        syn = as_series(bb25.generate(spark, seed=42, n_samples=n, n_series=1))
        variants.append((f"bb_n{n}", syn, {"n_samples": n, "block_size": 25}))
    # Part 2 — block-size sweep at fixed n (run_ratio_sweep.py:99-121)
    for bs, g in ((10, bb10), (40, bb40)):
        syn = as_series(g.generate(spark, seed=42, n_samples=250, n_series=1))
        variants.append((f"bb_bs{bs}", syn, {"n_samples": 250, "block_size": bs}))
    gs = gstat["s"] or 1.0
    sub = sub_cached.withColumn(
        "value",
        (F.col("value") - F.lit(gstat["m"])) / F.lit(gs if gs > 0 else 1.0)
        * F.lit(tstat["s"]) + F.lit(tstat["m"]),
    )
    variants.append(("gr_n100", sub, {"n_samples": 100, "block_size": 0}))

    rows = PredictiveEvaluator(window=12, horizon=1).sweep(
        train, variants, val, test, "value", [], ["ts", "event_id"]
    )
    train.unpersist()  # rows are driver-materialized past this point
    sub_cached.unpersist()  # the handle that was actually persisted
    # O5 best-of selection (run_ratio_sweep.py:167-168)
    best_val = max(rows, key=lambda r: r["val_improvement_pct"])["label"]
    best_test = max(rows, key=lambda r: r["test_improvement_pct"])["label"]
    return spark.createDataFrame(
        [
            (
                r["label"],
                r["n_samples"],
                r["block_size"],
                round(r["augmented_val_mae"], 6),
                round(r["augmented_test_mae"], 6),
                round(r["val_improvement_pct"], 4),
                round(r["test_improvement_pct"], 4),
                r["verdict"],
                r["label"] == best_val,
                r["label"] == best_test,
            )
            for r in sorted(rows, key=lambda r: r["label"])
        ],
        "label STRING, n_samples BIGINT, block_size BIGINT, "
        "augmented_val_mae DOUBLE, augmented_test_mae DOUBLE, "
        "val_improvement_pct DOUBLE, test_improvement_pct DOUBLE, "
        "verdict STRING, best_val BOOLEAN, best_test BOOLEAN",
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


_PIN_D5_SPECTRAL_DISTANCE = """
SELECT * FROM (VALUES
  ('spectral_distance', CAST(0.001357 AS DOUBLE))
) AS t("metric", "value")
"""


@register(
    "d5_spectral_distance",
    oracle=_PIN_D5_SPECTRAL_DISTANCE,  # r11 pinned VALUES at sf0.01 (tools/pin_oracles.py):
    # deterministic seeded computation, verified bit-identical across
    # independent processes AND under the plain-session gate layout
    pinned_sf="0.01",
    doc="D5 spectral distance between two series: per-side normalized "
    "FFT power spectrum via one grouped-map task each, RMSE join "
    "(reference: composite_metric.py:50-56).",
)
def d5_spectral_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..evaluators.distribution import spectral_distance

    ev = Catalog(spark, sf_dir).table("events")
    v = spectral_distance(ev, "value", "event_type", "purchase", "click", ["ts", "event_id"])
    return spark.createDataFrame([("spectral_distance", float(round(v, 6)))], ["metric", "value"])


_PIN_D9_TOLERANCE_PANEL = """
SELECT * FROM (VALUES
  ('ret_mean', CAST(-0.000241 AS DOUBLE), CAST(0.019417 AS DOUBLE), CAST(-0.018541 AS DOUBLE), CAST(0.020126 AS DOUBLE), CAST(0.038668 AS DOUBLE), CAST(84.548368 AS DOUBLE), CAST(0.5 AS DOUBLE)),
  ('ret_std', CAST(1.717442 AS DOUBLE), CAST(0.097737 AS DOUBLE), CAST(1.626742 AS DOUBLE), CAST(1.820953 AS DOUBLE), CAST(0.194211 AS DOUBLE), CAST(0.060271 AS DOUBLE), CAST(0.120541 AS DOUBLE)),
  ('price_range', CAST(64641.85147 AS DOUBLE), CAST(106776.580762 AS DOUBLE), CAST(2691.809631 AS DOUBLE), CAST(187936.33099 AS DOUBLE), CAST(185244.521359 AS DOUBLE), CAST(1.907348 AS DOUBLE), CAST(0.5 AS DOUBLE))
) AS t("metric", "mean", "std", "min", "max", "range", "max_rel_dev", "recommended_tolerance")
"""


@register(
    "d9_tolerance_panel",
    oracle=_PIN_D9_TOLERANCE_PANEL,  # r11 pinned VALUES at sf0.01 (tools/pin_oracles.py):
    # deterministic seeded computation, verified bit-identical across
    # independent processes AND under the plain-session gate layout
    pinned_sf="0.01",
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
    "d9_tolerance_v3_panel",
    oracle="""
WITH ev AS (
  SELECT event_type, event_id % 10 AS seed, value,
         LAG(value) OVER (PARTITION BY event_type, event_id % 10
                          ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type IN ('click', 'purchase')
), diffs AS (
  SELECT event_type, seed,
         CAST(ROUND(ABS(value - prev), 6) AS DECIMAL(18,6)) AS d
  FROM ev WHERE prev IS NOT NULL
), per_seed AS (
  SELECT CASE event_type WHEN 'click' THEN 'val_mae' ELSE 'test_mae' END AS metric,
         seed, CAST(SUM(d) AS DOUBLE) / COUNT(*) AS value
  FROM diffs GROUP BY 1, 2
), dec AS (
  SELECT metric, CAST(ROUND(value, 9) AS DECIMAL(18,9)) AS v FROM per_seed
), agg AS (
  SELECT metric, CAST(COUNT(*) AS BIGINT) AS n_seeds, SUM(v) AS s,
         SUM(v * v) AS s2, MIN(v) AS mn, MAX(v) AS mx
  FROM dec GROUP BY metric
), stats AS (
  SELECT metric, n_seeds,
         CAST(s AS DOUBLE) / n_seeds AS mean,
         SQRT(GREATEST(CAST(s2 AS DOUBLE) / n_seeds
              - (CAST(s AS DOUBLE) / n_seeds) * (CAST(s AS DOUBLE) / n_seeds), 0.0)) AS std,
         CAST(mn AS DOUBLE) AS mn, CAST(mx AS DOUBLE) AS mx
  FROM agg
), devs AS (
  SELECT metric, n_seeds, mean, std, mn, mx,
         GREATEST(mx - mean, mean - mn) / mean AS max_dev,
         3.0 * std / mean AS tol3
  FROM stats
)
SELECT metric, n_seeds, ROUND(mean, 8) AS mean, ROUND(std, 8) AS std,
       ROUND(mn, 8) AS min, ROUND(mx, 8) AS max,
       ROUND(std / mean, 6) AS cv, ROUND(max_dev, 6) AS max_dev,
       ROUND(tol3, 6) AS tolerance_3sigma,
       ROUND(GREATEST(tol3, max_dev) * 1.2, 4) AS recommended_tolerance
FROM devs ORDER BY metric
""",
    doc="D9 v3 tolerance analysis (reference: examples/scripts/"
    "tolerance_v3_real_testset.py:74-81): N independent per-seed scores "
    "of the SAME fixed evaluation -> across-seed CV, max relative "
    "deviation, tolerance_3sigma = 3·std/mean, and recommended = "
    "max(tolerance_3sigma, max_dev)·1.2. The per-seed scores here are "
    "the persistence-baseline MAEs of 10 deterministic event folds "
    "(event_id %% 10) on the real click (val) and purchase (test) "
    "streams — the reference's repeated-training variance measured on "
    "real test sets, with folds standing in for retrain seeds so the "
    "whole pipeline is exactly reproducible. All sums are DECIMAL "
    "(order-free) so the v3 aggregate is value-oracled, not rows-only "
    "like the v1/v2 panel (d9_tolerance_panel).",
)
def d9_tolerance_v3_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..evaluators.tolerance import tolerance_panel_v3

    ev = (
        Catalog(spark, sf_dir)
        .table("events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", (F.col("event_id") % 10).alias("seed"), "ts", "event_id", "value")
    )
    w = Window.partitionBy("event_type", "seed").orderBy("ts", "event_id")
    diffs = (
        ev.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNotNull())
        .withColumn(
            "d", F.round(F.abs(F.col("value") - F.col("prev")), 6).cast("decimal(18,6)")
        )
    )
    per_seed = (
        diffs.groupBy("event_type", "seed")
        .agg((F.sum("d").cast("double") / F.count("*")).alias("value"))
        .select(
            F.when(F.col("event_type") == "click", F.lit("val_mae"))
            .otherwise(F.lit("test_mae"))
            .alias("metric"),
            "seed",
            "value",
        )
    )
    return tolerance_panel_v3(per_seed).orderBy("metric")


_PIN_M10_LSTM_PREDICTIVE_UTILITY = """
SELECT * FROM (VALUES
  ('baseline_val_mae', CAST(36.8821766 AS DOUBLE)),
  ('baseline_test_mae', CAST(35.7125778 AS DOUBLE)),
  ('augmented_val_mae', CAST(35.7010525 AS DOUBLE)),
  ('augmented_test_mae', CAST(35.0092629 AS DOUBLE)),
  ('baseline_train_mae', CAST(36.9659843 AS DOUBLE)),
  ('augmented_train_mae', CAST(35.5273515 AS DOUBLE)),
  ('delta_val_mae', CAST(-1.18112411 AS DOUBLE)),
  ('delta_test_mae', CAST(-0.703314849 AS DOUBLE)),
  ('pct_val', CAST(-3.20242517 AS DOUBLE)),
  ('helps', CAST(1.0 AS DOUBLE))
) AS t("metric", "value")
"""


@register(
    "m10_lstm_predictive_utility",
    oracle=_PIN_M10_LSTM_PREDICTIVE_UTILITY,  # pinned VALUES at sf0.01
    # (tools/pin_oracles.py). RE-CAPTURED late-r11: the original pin
    # drifted in the last ulp between plain-session RUNS (avg("ae")
    # merged float partials in task-completion order — the r11 full
    # plain-session gate caught it). The scoring MAE now accumulates
    # through the associative decimal sum (predictive._dsum), making
    # the panel a pure function of the input set; re-validated across
    # 32- vs 200-partition layouts before re-capture. RE-CAPTURED again
    # r13-opt (3 of 10 cells, ≤2e-14 relative): the sandbox moved to an
    # AVX-512 host and OpenBLAS DYNAMIC_ARCH kernel dispatch shifted
    # the numpy LSTM training arithmetic by ulps — layout-independent
    # as before, but microarchitecture-scoped (see OPTIMIZATION_r13.md
    # "Inherited state"). r14: the query output now quantizes to 9
    # significant digits (the d8 boundary pattern) and the pin holds
    # the quantized cells — the ulp drift class above can no longer
    # reach the pinned values, retiring the per-host recapture cycle.
    pinned_sf="0.01",
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
    # 9-significant-digit quantization at the output boundary (the d8
    # pattern; r13 ADVICE): the LSTM training arithmetic is BLAS-
    # dispatched, so full-precision cells drifted by ≤2e-14 on each
    # host migration and forced a re-pin cycle. The metrics' meaning
    # saturates far above 1e-9 relative.
    return spark.createDataFrame(
        [(k, float(f"{float(v):.9g}")) for k, v in out.items()],
        ["metric", "value"],
    )


_PIN_M13_EXTERNAL_PREDICTOR_EVAL = """
SELECT * FROM (VALUES
  ('baseline_val_mae', CAST(48.93633333333334 AS DOUBLE)),
  ('baseline_test_mae', CAST(48.718333333333334 AS DOUBLE)),
  ('augmented_val_mae', CAST(48.93633333333334 AS DOUBLE)),
  ('augmented_test_mae', CAST(48.718333333333334 AS DOUBLE)),
  ('delta_val_mae', CAST(0.0 AS DOUBLE)),
  ('delta_test_mae', CAST(0.0 AS DOUBLE)),
  ('pct_val', CAST(0.0 AS DOUBLE)),
  ('helps', CAST(0.0 AS DOUBLE))
) AS t("metric", "value")
"""


@register(
    "m13_external_predictor_eval",
    oracle=_PIN_M13_EXTERNAL_PREDICTOR_EVAL,  # r11 pinned VALUES at sf0.01 (tools/pin_oracles.py):
    # deterministic seeded computation, verified bit-identical across
    # independent processes AND under the plain-session gate layout
    pinned_sf="0.01",
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
