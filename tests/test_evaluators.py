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


def test_tolerance_panel_v3_matches_numpy_reference(spark):
    """tolerance_panel_v3 must reproduce the reference v3 formulas
    (tolerance_v3_real_testset.py:74-81): population std, cv = std/mean,
    max_dev = max(|v-mean|/mean), tolerance_3sigma = 3*std/mean,
    recommended = max(tol_3sigma, max_dev) * 1.2."""
    import numpy as np

    from synthetic_datagen_spark.evaluators.tolerance import tolerance_panel_v3

    vals = [0.052, 0.0491, 0.0507, 0.0563, 0.0498]
    per_seed = spark.createDataFrame(
        [("val_mae", i, v) for i, v in enumerate(vals)]
        + [("flat", i, 2.5) for i in range(4)],
        "metric STRING, seed INT, value DOUBLE",
    )
    rows = {r.metric: r for r in tolerance_panel_v3(per_seed).collect()}

    m, s = np.mean(vals), np.std(vals)  # ddof=0, as the reference uses
    max_dev = max(abs(v - m) / m for v in vals)
    tol3 = 3 * s / m
    r = rows["val_mae"]
    assert r.n_seeds == len(vals)
    assert math.isclose(r.mean, round(m, 8), abs_tol=1e-10)
    assert math.isclose(r.std, round(s, 8), abs_tol=1e-8)
    assert math.isclose(r.cv, round(s / m, 6), abs_tol=1e-6)
    assert math.isclose(r.max_dev, round(max_dev, 6), abs_tol=1e-6)
    assert math.isclose(r.tolerance_3sigma, round(tol3, 6), abs_tol=1e-6)
    assert math.isclose(
        r.recommended_tolerance, round(max(tol3, max_dev) * 1.2, 4), abs_tol=1e-4
    )
    # zero-variance metric: every tolerance collapses to 0
    f = rows["flat"]
    assert f.std == 0.0 and f.cv == 0.0 and f.recommended_tolerance == 0.0
    assert f.mean == 2.5 and f.min == 2.5 and f.max == 2.5


def test_adf_autolag_matches_lstsq_replica(spark):
    """The distributed Gram + bordered-LDL autolag path must agree with
    an independent per-series lstsq replica of statsmodels adfuller
    (maxlag=20, autolag=AIC) — stat, chosen lag, and nobs."""
    import numpy as np

    from synthetic_datagen_spark.evaluators.adf_autolag import (
        adf_autolag_panel,
        adfuller_numpy,
    )

    rng = np.random.default_rng(7)
    series = {
        "walk": np.cumsum(rng.normal(0, 0.01, 1200)) + 1.3,
        "noise": rng.normal(0, 1, 900),
        "ar": np.sin(np.arange(800) * 0.3) + rng.normal(0, 0.1, 800),
    }
    rows = [
        (name, int(i), float(v))
        for name, x in series.items()
        for i, v in enumerate(x)
    ]
    df = spark.createDataFrame(rows, "series STRING, idx INT, y DOUBLE")
    got = {
        r["series"]: r for r in adf_autolag_panel(df, "y", ["series"], ["idx"])
    }
    for name, x in series.items():
        stat, lag, n = adfuller_numpy(x)
        assert got[name]["used_lag"] == lag, name
        assert got[name]["n"] == n, name
        assert abs(got[name]["adf_stat"] - stat) < 1e-5, (
            name, got[name]["adf_stat"], stat,
        )


def test_adf_autolag_partition_invariant(spark):
    """Same stats (to rounding) under different input partitionings."""
    import numpy as np

    from synthetic_datagen_spark.evaluators.adf_autolag import adf_autolag_panel

    rng = np.random.default_rng(11)
    rows = [("s", int(i), float(v)) for i, v in enumerate(rng.normal(0, 1, 600))]
    df = spark.createDataFrame(rows, "series STRING, idx INT, y DOUBLE")
    a = adf_autolag_panel(df, "y", ["series"], ["idx"])[0]
    b = adf_autolag_panel(df.repartition(13), "y", ["series"], ["idx"])[0]
    assert a["used_lag"] == b["used_lag"]
    assert round(a["adf_stat"], 6) == round(b["adf_stat"], 6)


def test_adf_autolag_short_series_sentinel(spark):
    """Degenerate input (fewer rows than any usable regression) yields
    the reference's −1 sentinel instead of raising."""
    from synthetic_datagen_spark.evaluators.adf_autolag import adf_autolag_panel

    rows = [("s", i, float(i % 3)) for i in range(5)]
    df = spark.createDataFrame(rows, "series STRING, idx INT, y DOUBLE")
    out = adf_autolag_panel(df, "y", ["series"], ["idx"])
    assert out[0]["adf_stat"] == -1.0 and out[0]["p_value"] == -1.0


def test_lstm_learns_predictable_series():
    """M10 sanity: on a deterministic AR-ish signal the LSTM beats the
    last-value (naive) predictor; same seed => identical weights."""
    import numpy as np

    from synthetic_datagen_spark.ml.lstm import NumpyLstm

    rng = np.random.default_rng(3)
    t = np.arange(1600, dtype=float)
    series = np.sin(t / 6.0) + 0.05 * rng.normal(size=len(t))
    W, H = 8, 1
    X = np.stack([series[i : i + W] for i in range(len(series) - W - H + 1)])
    y = series[W + H - 1 :]
    cut = 1200
    net = NumpyLstm(window=W, hidden=12, dense=8, epochs=15, patience=5, seed=4)
    net.fit(X[:cut], y[:cut], X[cut:], y[cut:])
    pred = net.predict(X[cut:])
    mae = float(np.mean(np.abs(pred - y[cut:])))
    naive = float(np.mean(np.abs(X[cut:, -1] - y[cut:])))
    assert mae < naive * 0.8, (mae, naive)

    net2 = NumpyLstm(window=W, hidden=12, dense=8, epochs=15, patience=5, seed=4)
    net2.fit(X[:cut], y[:cut], X[cut:], y[cut:])
    assert all(np.array_equal(net.params[k], net2.params[k]) for k in net.params)


def test_lstm_predictive_delta_identity(spark, sf_smoke):
    """The A/B protocol invariants hold for the LSTM predictor family
    too: delta == augmented - baseline, MAEs positive."""
    ev = Catalog(spark, sf_smoke).table("events").filter(
        F.col("event_type") == "view"
    ).select("ts", "event_id", "value")
    train, rest = TS.chrono_split(ev, 0.7, [], ["ts", "event_id"])
    val, test = TS.chrono_split(rest, 0.5, [], ["ts", "event_id"])
    syn = train.limit(60)
    out = PredictiveEvaluator(
        window=6, predictor="lstm", hidden=6, dense=4, epochs=3,
        patience=2, max_train_rows=400, seed=1,
    ).evaluate(train, syn, val, test, "value", [], ["ts", "event_id"])
    assert math.isclose(
        out["delta_val_mae"],
        out["augmented_val_mae"] - out["baseline_val_mae"],
        abs_tol=1e-8,
    )
    assert out["baseline_val_mae"] > 0 and out["augmented_test_mae"] > 0


def test_lstm_bptt_matches_finite_differences():
    """BPTT gradients agree with central finite differences to ~1e-6
    relative on every parameter tensor."""
    import numpy as np

    from synthetic_datagen_spark.ml.lstm import NumpyLstm

    rng = np.random.default_rng(0)
    net = NumpyLstm(window=5, hidden=3, dense=2, seed=1)
    p = {
        "Wx": rng.normal(0, 1, (1, 12)), "Wh": rng.normal(0, 0.5, (3, 12)),
        "b": rng.normal(0, 0.1, 12),
        "Wd": rng.normal(0, 0.5, (3, 2)), "bd": rng.normal(0, 0.1, 2),
        "Wo": rng.normal(0, 0.5, (2, 1)), "bo": rng.normal(0, 0.1, 1),
    }
    X = rng.normal(0, 1, (4, 5))
    y = rng.normal(0, 1, 4)

    def loss(pp):
        return 0.5 * float(np.mean((NumpyLstm._forward(pp, X) - y) ** 2))

    yh, fwd = NumpyLstm._forward(p, X, keep=True)
    grads = net._backward(p, X, yh - y, fwd)
    for k in p:
        gnum = np.zeros_like(p[k])
        it = np.nditer(p[k], flags=["multi_index"])
        for _ in it:
            idx = it.multi_index
            e = 1e-6
            p2 = {kk: vv.copy() for kk, vv in p.items()}
            p2[k][idx] += e
            lp = loss(p2)
            p2[k][idx] -= 2 * e
            lm = loss(p2)
            gnum[idx] = (lp - lm) / (2 * e)
        rel = np.abs(gnum - grads[k]).max() / (np.abs(gnum).max() + 1e-9)
        assert rel < 1e-5, (k, rel)


def test_external_predictor_protocol(spark, sf_smoke, tmp_path):
    """M13: the CSV + norm.json + metrics.json handshake with a real
    subprocess predictor (naive last-value, pandas), baseline memo hit
    on the second evaluation, delta identity."""
    import json
    import sys

    from synthetic_datagen_spark.evaluators import ExternalPredictorEvaluator

    pred = tmp_path / "predictor.py"
    marker = tmp_path / "calls.log"
    pred.write_text(
        "import argparse, json, pandas as pd\n"
        "p = argparse.ArgumentParser()\n"
        "for a in ('train','val','test','norm','out'):\n"
        "    p.add_argument('--'+a)\n"
        "a = p.parse_args()\n"
        f"open({str(marker)!r}, 'a').write('x')\n"
        "tr = pd.read_csv(a.train)['value']\n"
        "def mae(path):\n"
        "    s = pd.read_csv(path)['value']\n"
        "    return float((s.diff().abs()).mean())\n"
        "json.dump({'val_mae': mae(a.val) + 1e-9*len(tr), 'test_mae': mae(a.test)},\n"
        "          open(a.out, 'w'))\n"
    )
    from pyspark.sql import functions as F

    from synthetic_datagen_spark.functions import timeseries as TS
    from synthetic_datagen_spark.sources import Catalog

    ev = Catalog(spark, sf_smoke).table("events").filter(
        F.col("event_type") == "click"
    ).select("ts", "event_id", "value")
    train, rest = TS.chrono_split(ev, 0.7, [], ["ts", "event_id"])
    val, test = TS.chrono_split(rest, 0.5, [], ["ts", "event_id"])
    syn = train.limit(50)
    memo = str(tmp_path / "memo.json")
    e = ExternalPredictorEvaluator(
        [sys.executable, str(pred)], memo_path=memo, max_rows=2000
    )
    out = e.evaluate(train, syn, val, test, ["ts", "event_id"])
    assert out["baseline_val_mae"] > 0
    assert abs(
        out["delta_val_mae"] - (out["augmented_val_mae"] - out["baseline_val_mae"])
    ) < 1e-12
    calls_first = len(marker.read_text())
    out2 = e.evaluate(train, syn, val, test, ["ts", "event_id"])
    calls_second = len(marker.read_text()) - calls_first
    # baseline memoized: second evaluation only runs the augmented side
    assert calls_second == calls_first - 1
    assert out2["baseline_val_mae"] == out["baseline_val_mae"]
    assert json.load(open(memo))  # memo file populated


def test_distribution_reference_key_surface(spark, sf_smoke):
    """A reference caller's key handling works unchanged: the compat
    surface emits exactly the reference's evaluate() keys
    (distribution_evaluator.py:85-116) with the documented
    quality_score composition."""
    from pyspark.sql import functions as F

    from synthetic_datagen_spark.evaluators import DistributionEvaluator
    from synthetic_datagen_spark.sources import Catalog

    ev = Catalog(spark, sf_smoke).table("events")
    real = ev.filter(F.col("event_type") == "click").select(
        "ts", F.col("value").alias("v")
    ).withColumn("tag", F.lit("real"))
    syn = ev.filter(F.col("event_type") == "view").select(
        "ts", F.col("value").alias("v")
    ).withColumn("tag", F.lit("syn"))
    both = real.unionByName(syn)
    m = DistributionEvaluator().evaluate_reference_keys(
        both, "v", "tag", "real", "syn", ["ts"]
    )
    want = {
        "kl_divergence", "wasserstein_distance",
        "real_return_mean", "synthetic_return_mean",
        "real_return_std", "synthetic_return_std",
        "real_autocorr_lag1", "synthetic_autocorr_lag1",
        "real_autocorr_lag5", "synthetic_autocorr_lag5",
        "real_autocorr_lag10", "synthetic_autocorr_lag10",
        "real_adf_pvalue", "synthetic_adf_pvalue",
        "quality_score",
    }
    assert set(m) == want
    assert m["real_return_std"] > 0 and m["synthetic_return_std"] > 0
    assert 0.0 <= m["real_adf_pvalue"] <= 1.0
    assert abs(
        m["quality_score"]
        - (m["kl_divergence"] + 0.1 * m["wasserstein_distance"]
           + abs(m["real_return_std"] - m["synthetic_return_std"]))
    ) < 1e-12


def test_predictive_reference_key_surface(spark, sf_smoke):
    """Reference predictive-evaluator key compatibility
    (tests/test_predictive_evaluator.py:45-58): exact key set, delta
    identity, and per-split verdict signs."""
    from pyspark.sql import functions as F

    from synthetic_datagen_spark.evaluators import PredictiveEvaluator
    from synthetic_datagen_spark.functions import timeseries as TS
    from synthetic_datagen_spark.sources import Catalog

    ev = (
        Catalog(spark, sf_smoke)
        .table("events")
        .filter(F.col("event_type") == "click")
        .select("ts", "event_id", "value")
    )
    train, rest = TS.chrono_split(ev, 0.6, [], ["ts", "event_id"])
    val, test = TS.chrono_split(rest, 0.5, [], ["ts", "event_id"])
    syn = train.withColumn("value", F.col("value") * 1.01)
    m = PredictiveEvaluator(window=8).evaluate_reference_keys(
        train, syn, val, test, "value", [], ["ts", "event_id"]
    )
    want = {
        "baseline_mae_train", "baseline_mae_val", "baseline_mae_test",
        "augmented_mae_train", "augmented_mae_val", "augmented_mae_test",
        "mae_delta_val", "mae_delta_test",
        "mae_pct_change_val", "mae_pct_change_test",
        "synthetic_helps_val", "synthetic_helps_test",
        # size/config record (predictive_evaluator.py:253-261)
        "n_real_train", "n_synthetic", "n_augmented_train", "n_val",
        "n_test", "window_size", "horizon",
    }
    dist_keys = {k for k in m if k.startswith("dist_")}
    assert set(m) - dist_keys == want
    # secondary distribution panel, dist_-prefixed (:268-273)
    assert {"dist_kl_divergence", "dist_wasserstein_distance",
            "dist_quality_score"} <= dist_keys
    assert m["n_augmented_train"] == m["n_real_train"] + m["n_synthetic"]
    assert m["window_size"] == 8 and m["horizon"] == 1
    assert m["baseline_mae_val"] > 0 and m["baseline_mae_test"] > 0
    # train-split MAEs (predictive_evaluator.py:242,246): present,
    # positive, and the baseline fits ITS OWN train split at least as
    # well as the ridge generalizes to val (no exact bound — just sane)
    assert m["baseline_mae_train"] > 0 and m["augmented_mae_train"] > 0
    assert abs(
        m["mae_delta_test"] - (m["augmented_mae_test"] - m["baseline_mae_test"])
    ) < 1e-8
    assert m["synthetic_helps_test"] == (m["mae_delta_test"] < 0)


def test_distribution_reference_call_form(spark):
    """Full drop-in: the reference's evaluate(synthetic=df, real=df)
    pandas call form works against Spark underneath."""
    import numpy as np
    import pandas as pd

    from synthetic_datagen_spark.evaluators import DistributionEvaluator

    rng = np.random.default_rng(0)
    mk = lambda seed: pd.DataFrame(  # noqa: E731
        {
            "DATE_TIME": pd.date_range("2020-01-01", periods=400, freq="4h"),
            "typical_price": 1.3
            + np.cumsum(np.random.default_rng(seed).normal(0, 0.001, 400)),
        }
    )
    m = DistributionEvaluator().evaluate_reference(
        spark, synthetic=mk(1), real=mk(2)
    )
    assert "kl_divergence" in m and "quality_score" in m
    assert m["real_return_std"] > 0
    assert 0.0 <= m["real_adf_pvalue"] <= 1.0


def test_augmentation_metrics_reference_formulas():
    """augmentation_evaluator.py:75-93 — exact keys, signs, pct guard,
    and the GOOD/BAD verdict rule (val improvement strictly > 0)."""
    from synthetic_datagen_spark.evaluators import augmentation_metrics

    m = augmentation_metrics(0.10, 0.20, 0.08, 0.25)
    assert math.isclose(m["val_improvement"], 0.02)
    assert math.isclose(m["test_improvement"], -0.05)
    assert math.isclose(m["val_improvement_pct"], 20.0)
    assert math.isclose(m["test_improvement_pct"], -25.0)
    assert m["verdict"] == "GOOD"  # val improved, test verdict ignores test
    assert augmentation_metrics(0.1, 0.1, 0.1, 0.1)["verdict"] == "BAD"  # ties are BAD
    z = augmentation_metrics(0.0, 0.0, 0.1, 0.1)
    assert z["val_improvement_pct"] == 0.0 and z["test_improvement_pct"] == 0.0
    assert set(m) == {
        "baseline_val_mae", "baseline_test_mae",
        "augmented_val_mae", "augmented_test_mae",
        "val_improvement", "test_improvement",
        "val_improvement_pct", "test_improvement_pct", "verdict",
    }


def test_sweep_pool_matches_sequential(spark, sf_smoke):
    """r13-opt: the baseline fit+MAEs joined the variant thread pool
    (instead of running sequentially before it). Pooled rows must be
    BIT-identical to the sequential single-variant path — every leg is
    a layout-deterministic decimal-summed aggregate over the same
    persisted inputs, so submission order must not matter."""
    ev = Catalog(spark, sf_smoke).table("events").filter(
        F.col("event_type") == "view"
    ).select("ts", "event_id", "value")
    train, rest = TS.chrono_split(ev, 0.7, [], ["ts", "event_id"])
    val, test = TS.chrono_split(rest, 0.5, [], ["ts", "event_id"])
    variants = [
        ("a", train.limit(60), {"n_samples": 60}),
        ("b", train.limit(30), {"n_samples": 30}),
    ]
    e = PredictiveEvaluator(window=8)
    rows_pool = e.sweep(
        train, variants, val, test, "value", [], ["ts", "event_id"]
    )
    rows_seq = [
        e.sweep(train, [v], val, test, "value", [], ["ts", "event_id"])[0]
        for v in variants
    ]
    assert rows_pool == rows_seq  # dict equality: floats bit-identical


def test_ratio_sweep_shares_baseline_and_matches_evaluate(spark, sf_smoke, tmp_path):
    """sweep() rows carry the reference's metric keys, every row shares
    ONE baseline (computed once, memoized to baseline_file — M12 /
    augmentation_evaluator.py:112-127), and a sweep row's augmented MAEs
    equal a standalone evaluate() on the same variant."""
    import json as _json

    ev = Catalog(spark, sf_smoke).table("events").filter(
        F.col("event_type") == "view"
    ).select("ts", "event_id", "value")
    train, rest = TS.chrono_split(ev, 0.7, [], ["ts", "event_id"])
    val, test = TS.chrono_split(rest, 0.5, [], ["ts", "event_id"])
    syn_a = train.limit(60)
    syn_b = train.limit(30)
    e = PredictiveEvaluator(window=8)
    memo = str(tmp_path / "baseline.json")
    rows = e.sweep(
        train,
        [("a", syn_a, {"n_samples": 60}), ("b", syn_b, {"n_samples": 30})],
        val, test, "value", [], ["ts", "event_id"], baseline_file=memo,
    )
    assert [r["label"] for r in rows] == ["a", "b"]
    assert rows[0]["baseline_val_mae"] == rows[1]["baseline_val_mae"]
    assert rows[0]["verdict"] in ("GOOD", "BAD")
    assert rows[0]["n_samples"] == 60
    # memo file holds the shared baseline under a config+data key
    memo_obj = _json.load(open(memo))
    (memo_key,) = memo_obj.keys()
    assert _json.loads(memo_key)[:3] == [8, 1, "ridge"]  # window/horizon/predictor
    memo_val = memo_obj[memo_key]["val_mae"]
    assert math.isclose(memo_val, rows[0]["baseline_val_mae"], rel_tol=1e-12)
    # cross-check against the full evaluate() protocol on variant a
    full = e.evaluate(train, syn_a, val, test, "value", [], ["ts", "event_id"])
    assert math.isclose(rows[0]["augmented_val_mae"], full["augmented_val_mae"], rel_tol=1e-9)
    assert math.isclose(rows[0]["baseline_test_mae"], full["baseline_test_mae"], rel_tol=1e-9)
    # second sweep hits the memo (poison it and confirm the hit is used)
    poisoned = {memo_key: {"val_mae": 123.0, "test_mae": 456.0}}
    _json.dump(poisoned, open(memo, "w"))
    rows2 = e.sweep(
        train, [("a", syn_a, {})], val, test, "value", [], ["ts", "event_id"],
        baseline_file=memo,
    )
    assert rows2[0]["baseline_val_mae"] == 123.0
    # a DIFFERENT config must NOT reuse the stale entry (the key is a
    # config+data fingerprint, not the constant "baseline")
    rows3 = PredictiveEvaluator(window=9).sweep(
        train, [("a", syn_a, {})], val, test, "value", [], ["ts", "event_id"],
        baseline_file=memo,
    )
    assert rows3[0]["baseline_val_mae"] != 123.0


def test_augmentation_plugin_registered():
    """The reference's third evaluator entry point
    (pyproject.toml: augmentation_evaluator) resolves by name."""
    from synthetic_datagen_spark.evaluators import ExternalPredictorEvaluator
    from synthetic_datagen_spark.plugins import load_plugin

    assert load_plugin("sdg.evaluator", "augmentation") is ExternalPredictorEvaluator


def test_distribution_evaluate_arrays_call_form(spark):
    """The reference's array call form (distribution_evaluator.py:85-116
    — raw price ndarrays, same key set; PredictiveEvaluator's dist_
    hook calls exactly this)."""
    import numpy as np

    from synthetic_datagen_spark.evaluators import DistributionEvaluator

    rng = np.random.default_rng(0)
    p_real = 1.3 + np.cumsum(rng.standard_normal(200) * 0.0005)
    p_syn = 1.3 + np.cumsum(rng.standard_normal(200) * 0.0005)
    m = DistributionEvaluator().evaluate_arrays(p_syn, p_real, spark=spark)
    assert "kl_divergence" in m and "quality_score" in m
    assert m["kl_divergence"] >= 0
    assert abs(
        m["quality_score"]
        - (m["kl_divergence"] + 0.1 * m["wasserstein_distance"]
           + abs(m["real_return_std"] - m["synthetic_return_std"]))
    ) < 1e-12


def test_tolerance_panel_v3_zero_mean_yields_null_ratios(spark):
    """ADVICE r9: a metric whose per-seed mean is exactly 0 must yield
    NULL for the mean-relative columns (cv, max_dev, tolerance_3sigma,
    recommended) — an explicit guard, not a 0-division artifact — while
    mean/std/min/max stay well-defined."""
    from synthetic_datagen_spark.evaluators.tolerance import tolerance_panel_v3

    per_seed = spark.createDataFrame(
        [("signed", 0, -1.0), ("signed", 1, 1.0), ("ok", 0, 2.0), ("ok", 1, 2.0)],
        "metric STRING, seed INT, value DOUBLE",
    )
    rows = {r.metric: r for r in tolerance_panel_v3(per_seed).collect()}
    z = rows["signed"]
    assert z.mean == 0.0 and z.std == 1.0 and z.min == -1.0 and z.max == 1.0
    for c in ("cv", "max_dev", "tolerance_3sigma", "recommended_tolerance"):
        assert z[c] is None, c
    assert rows["ok"].cv == 0.0 and rows["ok"].recommended_tolerance == 0.0


def test_dsum_is_layout_independent(spark):
    """functions.stats.dsum — the r11 determinism kernel: the decimal
    accumulation must produce the SAME bits regardless of partition
    layout, where raw SUM(double) is allowed to drift in the last ulp.
    Uses values chosen so float addition is genuinely non-associative
    (mixed magnitudes)."""
    import math

    from synthetic_datagen_spark.functions.stats import dsum
    from pyspark.sql import functions as F

    vals = [(1e8 if i % 97 == 0 else math.pi * (i % 13 + 1) * 1e-4,) for i in range(20_000)]
    df = spark.createDataFrame(vals, "v DOUBLE")
    totals = {
        df.repartition(n).agg(dsum(F.col("v")).alias("s")).first()["s"]
        for n in (1, 3, 17, 64)
    }
    assert len(totals) == 1, f"dsum drifted across layouts: {totals}"


def test_dmean_dstd_matches_builtin_within_quantization(spark):
    """dmean_dstd must agree with avg/stddev_samp to well beyond the
    1e-12 quantization (semantic equivalence), while being exactly
    reproducible across layouts (determinism)."""
    from synthetic_datagen_spark.functions.stats import dmean_dstd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i % 5, 50.0 + ((i * 2654435761) % 1000) / 10.0) for i in range(5000)],
        "g INT, v DOUBLE",
    )
    det = {r["g"]: r for r in dmean_dstd(df, "v", ["g"]).collect()}
    ref = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(F.avg("v").alias("m"), F.stddev_samp("v").alias("s"))
        .collect()
    }
    for g in ref:
        assert abs(det[g]["mean_v"] - ref[g]["m"]) < 1e-9
        assert abs(det[g]["std_v"] - ref[g]["s"]) < 1e-9
    # layout invariance: repartitioned input gives identical bits
    det2 = {r["g"]: r for r in dmean_dstd(df.repartition(37), "v", ["g"]).collect()}
    for g in det:
        assert det[g]["mean_v"] == det2[g]["mean_v"]
        assert det[g]["std_v"] == det2[g]["std_v"]


def test_dsum_scaled_layout_independent_and_guard(spark):
    """stats.dsum_scaled (the primitive fast sibling of dsum) must be
    bit-identical across layouts, agree with plain summation to the
    1e-6 quantum, and long_sum_safe must reject regimes where the
    64-bit path could wrap."""
    from synthetic_datagen_spark.functions.stats import dsum_scaled, long_sum_safe
    from pyspark.sql import functions as F

    vals = [(((i * 2654435761) % 10_000) / 7.0,) for i in range(30_000)]
    df = spark.createDataFrame(vals, "v DOUBLE")
    totals = {
        df.repartition(n).agg(dsum_scaled(F.col("v")).alias("s")).first()["s"]
        for n in (1, 5, 31)
    }
    assert len(totals) == 1, f"dsum_scaled drifted: {totals}"
    exact = sum(v[0] for v in vals)
    assert abs(next(iter(totals)) - exact) < 30_000 * 1e-6 + 1e-6
    # guard arithmetic: per-row quantized term must stay under 2^52
    assert long_sum_safe(1e3, 10**6)
    assert not long_sum_safe(1e47, 10)          # per-term overflow
    assert not long_sum_safe(1e9, 10**8)        # total could wrap
    assert long_sum_safe(None, None)            # empty input


def test_dsum_nan_contract(spark):
    """dsum skips NaN terms (they become NULL under the decimal cast,
    like SQL NULLs) where raw SUM(double) poisons the total to NaN —
    the documented contract callers rely on pre-checking."""
    import math

    from synthetic_datagen_spark.functions.stats import dsum
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (2.0,), (None,)], "v DOUBLE"
    )
    raw = df.agg(F.sum("v")).first()[0]
    det = df.agg(dsum(F.col("v"))).first()[0]
    assert math.isnan(raw)          # double sum: NaN propagates
    assert det == 3.0               # dsum: NaN skipped like NULL
