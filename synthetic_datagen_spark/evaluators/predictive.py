"""M10/M11 — predictive-utility A/B evaluation (THE metric).

reference: sdg_plugins/evaluator/predictive_evaluator.py:169-287 —
train a predictor on real data (baseline), retrain on synthetic+real
(augmented), compare val/test MAE: does the synthetic data *help* a
downstream model?

Spark-first split of labor (SURVEY §3.3):
  * supervised X/y windows (W10) build distributedly;
  * predictor families (pluggable, like the reference's subprocess
    predictor swap — :370-394):
      - "ridge" (scale path, default): closed-form normal equations
        from DISTRIBUTED X'X / X'y aggregates — no training row ever
        reaches the driver, only the (W+1)² Gram matrix;
      - "lstm" (fidelity path, M10): the reference's architecture
        (LSTM(H) → Dense(relu) → Dense(1), adam, mse, early stopping
        with best-weight restore — predictive_evaluator.py:75-135)
        implemented in numpy (ml/lstm.py); trains on a bounded sorted
        window sample driver-side exactly like the reference's Keras
        loop, scores distributed via broadcast weights + mapInPandas.
  * MAE/deltas are Spark aggregates (avg(abs(pred-y))).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F


def _xy(df: DataFrame, window: int, horizon: int, value_col: str,
        partition_cols: list[str], order_cols: list[str]) -> DataFrame:
    from ..functions import timeseries as TS

    d = TS.supervised_windows(df, value_col, window, horizon, partition_cols, order_cols)
    return d.select(F.col("x"), F.col("y"))


def _dsum(expr):
    """Layout-deterministic sum — see functions.stats.dsum: the ridge
    A/B drifted in the last ulp across partition layouts until the
    Gram/MAE partials moved to associative decimal accumulation."""
    from ..functions.stats import dsum

    return dsum(expr)


def _det_agg(df: DataFrame, terms: list, bound: "F.Column"):
    """Deterministic multi-sum with the fast-path/fallback protocol:
    run every term through the primitive long-quantized sum
    (stats.dsum_scaled) TOGETHER with count(*) and ONE per-row bound
    (``bound`` must satisfy |term| ≤ bound for every term — e.g.
    max(|x|,|y|,1)² dominates every Gram outer product) — max and
    count are order-independent and overflow-free, so the post-hoc
    check (stats.long_sum_safe) is sound even when the long sums
    themselves wrapped. Only on a failed check does the aggregate
    re-run through the DECIMAL path (stats.dsum). Common regime = one
    codegen-friendly primitive pass; extreme-scale regime stays
    correct automatically. ``terms`` is [(alias, Column)]; returns the
    result Row (with ``_n_rows``)."""
    from ..functions.stats import dsum, dsum_scaled, long_sum_safe

    try:
        row = df.agg(
            *[dsum_scaled(c).alias(a) for a, c in terms],
            F.max(bound).alias("_mx"),
            F.count("*").alias("_n_rows"),
        ).first()
        if long_sum_safe(row["_mx"], row["_n_rows"]):
            return row
    except Exception as e:  # noqa: BLE001
        # Spark 4 runs ANSI mode by default, so an out-of-range term
        # THROWS (ARITHMETIC_OVERFLOW / CAST_OVERFLOW) instead of
        # wrapping — caught at sf0.001 by the plan audit, where a
        # diverging synthetic price series overflowed the quantized
        # Gram terms. That throw IS the guard in ANSI sessions;
        # long_sum_safe above covers non-ANSI sessions, where the same
        # regime wraps silently. Anything else propagates.
        if "OVERFLOW" not in str(e).upper():
            raise
    # bounds exceeded — exact decimal accumulation instead
    return df.agg(
        *[dsum(c).alias(a) for a, c in terms],
        F.count("*").alias("_n_rows"),
    ).first()


def _gram(df: DataFrame, window: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Distributed X'X, X'y over (x: array<double>, y) with intercept."""
    # append 1.0 for the intercept; aggregate outer products via
    # explode-free expression: sum over rows of x_i * x_j as a matrix of
    # aggregate expressions (W+1 ≤ ~33 → (W+1)² ≤ ~1.1k sums, one pass).
    n = window + 1
    xi = [F.element_at("x", i + 1) for i in range(window)] + [F.lit(1.0)]
    terms = []
    for i in range(n):
        for j in range(i, n):
            terms.append((f"g_{i}_{j}", xi[i] * xi[j]))
    for i in range(n):
        terms.append((f"b_{i}", xi[i] * F.col("y")))
    # per-row bound dominating every outer product: max(|x|, |y|, 1)²
    base = F.greatest(
        F.array_max(F.transform("x", lambda v: F.abs(v))),
        F.abs(F.col("y")),
        F.lit(1.0),
    )
    row = _det_agg(df, terms, base * base)
    G = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            G[i, j] = G[j, i] = row[f"g_{i}_{j}"]
    b = np.array([row[f"b_{i}"] for i in range(n)])
    return G, b, int(row["_n_rows"])


def augmentation_metrics(
    baseline_val_mae: float,
    baseline_test_mae: float,
    augmented_val_mae: float,
    augmented_test_mae: float,
) -> dict:
    """The reference AugmentationEvaluator's exact comparison dict
    (augmentation_evaluator.py:75-93): improvements are baseline −
    augmented (positive = synthetic helped), pct guards a zero baseline
    to 0.0, and the verdict is "GOOD" iff val improved, else "BAD"."""
    out = {
        "baseline_val_mae": float(baseline_val_mae),
        "baseline_test_mae": float(baseline_test_mae),
        "augmented_val_mae": float(augmented_val_mae),
        "augmented_test_mae": float(augmented_test_mae),
        "val_improvement": float(baseline_val_mae - augmented_val_mae),
        "test_improvement": float(baseline_test_mae - augmented_test_mae),
        "val_improvement_pct": (
            (baseline_val_mae - augmented_val_mae) / baseline_val_mae * 100
            if baseline_val_mae > 0
            else 0.0
        ),
        "test_improvement_pct": (
            (baseline_test_mae - augmented_test_mae) / baseline_test_mae * 100
            if baseline_test_mae > 0
            else 0.0
        ),
    }
    out["verdict"] = "GOOD" if out["val_improvement"] > 0 else "BAD"
    return out


class PredictiveEvaluator:
    def __init__(
        self,
        window: int = 16,
        horizon: int = 1,
        ridge: float = 1e-3,
        predictor: str = "ridge",
        hidden: int = 32,
        dense: int = 16,
        epochs: int = 50,
        patience: int = 10,
        max_train_rows: int = 4096,
        seed: int = 42,
    ):
        if predictor not in ("ridge", "lstm"):
            raise ValueError(f"unknown predictor {predictor!r}")
        self.window = window
        self.horizon = horizon
        self.ridge = ridge
        self.predictor = predictor
        self.hidden = hidden
        self.dense = dense
        self.epochs = epochs
        self.patience = patience
        self.max_train_rows = max_train_rows
        self.seed = seed

    def _fit(self, train: DataFrame) -> np.ndarray:
        G, b, m = _gram(train, self.window)
        lam = self.ridge * max(m, 1)
        return np.linalg.solve(G + lam * np.eye(len(b)), b)

    def _mae(self, df: DataFrame, w: np.ndarray) -> float:
        # deterministic avg: guarded long-quantized sum / count
        # (_det_agg) — with the Gram summed the same way, the whole
        # ridge A/B panel is a pure function of the input set,
        # independent of layout
        pred = F.lit(float(w[-1]))
        for i in range(self.window):
            pred = pred + F.element_at("x", i + 1) * float(w[i])
        ae = F.abs(pred - F.col("y"))
        row = _det_agg(df, [("s", ae)], ae)
        return float(row["s"]) / max(int(row["_n_rows"]), 1)

    # ------------------------------------------------------- lstm path --
    def _collect_xy(self, df: DataFrame, cap: int) -> tuple[np.ndarray, np.ndarray]:
        """Bounded, deterministically-ordered sample (sorted on (y, x)
        so partitioning can never reorder the training stream)."""
        rows = df.orderBy("y", "x").limit(cap).collect()
        X = np.array([r["x"] for r in rows], dtype=np.float64)
        y = np.array([r["y"] for r in rows], dtype=np.float64)
        return X, y

    def _fit_lstm(self, train: DataFrame, val: DataFrame):
        from ..ml.lstm import NumpyLstm

        X, y = self._collect_xy(train, self.max_train_rows)
        Xv, yv = self._collect_xy(val, self.max_train_rows // 2)
        net = NumpyLstm(
            window=self.window,
            hidden=self.hidden,
            dense=self.dense,
            epochs=self.epochs,
            patience=self.patience,
            seed=self.seed,
        ).fit(X, y, Xv, yv)
        return net.export()

    def _mae_lstm(self, df: DataFrame, export: dict) -> float:
        """Distributed scoring: broadcast weights, batch forward inside
        mapInPandas, MAE as a Spark aggregate."""
        import pandas as pd

        from ..ml.lstm import NumpyLstm

        def score(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["x"].to_numpy())
                yh = NumpyLstm.predict_with(export, X)
                yield pd.DataFrame({"ae": np.abs(yh - pdf["y"].to_numpy())})

        # deterministic avg (see _dsum): the per-row |err| terms are
        # bit-deterministic (broadcast weights, per-row forward pass),
        # so a decimal sum makes the MAE layout-independent as well
        row = (
            df.mapInPandas(score, "ae double")
            .agg(_dsum(F.col("ae")).alias("s"), F.count("*").alias("m"))
            .first()
        )
        return float(row["s"]) / max(int(row["m"]), 1)

    def evaluate(
        self,
        real_train: DataFrame,
        synthetic: DataFrame,
        val: DataFrame,
        test: DataFrame,
        value_col: str,
        partition_cols: list[str],
        order_cols: list[str],
    ) -> dict[str, float]:
        """Full A/B protocol → metric dict with the reference's keys
        (baseline/augmented MAE on val+test, deltas, pct, verdict)."""
        mk = lambda d: _xy(d, self.window, self.horizon, value_col, partition_cols, order_cols)  # noqa: E731
        xy_real = mk(real_train).persist()
        xy_val = mk(val).persist()
        xy_test = mk(test).persist()
        xy_aug = mk(synthetic).unionByName(xy_real).persist()  # J2 union
        try:
            return self._evaluate_inner(xy_real, xy_val, xy_test, xy_aug)
        finally:
            # unpersist even when a fit/mae raises — a long-lived session
            # must not accumulate orphaned cached frames
            for d in (xy_real, xy_val, xy_test, xy_aug):
                d.unpersist()

    def _evaluate_inner(self, xy_real, xy_val, xy_test, xy_aug) -> dict[str, float]:
        if self.predictor == "lstm":
            from concurrent.futures import ThreadPoolExecutor

            # same overlap the linear branch below has used since r11:
            # the two fits (collect jobs + pure per-instance numpy
            # training) and the six scoring scans are independent —
            # driver threads overlap the Spark jobs; every fit consumes
            # the same deterministically-ordered sample and every scan
            # the same broadcast weights, so results are unchanged
            with ThreadPoolExecutor(max_workers=6) as pool:
                f_base = pool.submit(self._fit_lstm, xy_real, xy_val)
                f_aug = pool.submit(self._fit_lstm, xy_aug, xy_val)
                m_base, m_aug = f_base.result(), f_aug.result()
                maes = list(
                    pool.map(
                        lambda p: self._mae_lstm(*p),
                        [
                            (xy_val, m_base), (xy_test, m_base),
                            (xy_val, m_aug), (xy_test, m_aug),
                            (xy_real, m_base), (xy_aug, m_aug),
                        ],
                    )
                )
        else:
            from concurrent.futures import ThreadPoolExecutor

            # the two Gram fits, then the six MAE scans, are independent
            # Spark jobs — overlap them from driver threads (same plans,
            # identical results; persisted inputs are shared)
            with ThreadPoolExecutor(max_workers=6) as pool:
                f_base = pool.submit(self._fit, xy_real)
                f_aug = pool.submit(self._fit, xy_aug)
                w_base, w_aug = f_base.result(), f_aug.result()
                maes = list(
                    pool.map(
                        lambda p: self._mae(*p),
                        [
                            (xy_val, w_base), (xy_test, w_base),
                            (xy_val, w_aug), (xy_test, w_aug),
                            # train-split MAEs (reference
                            # predictive_evaluator.py:99-135 fits report
                            # mae_train alongside val/test)
                            (xy_real, w_base), (xy_aug, w_aug),
                        ],
                    )
                )
        out = {
            "baseline_val_mae": maes[0],
            "baseline_test_mae": maes[1],
            "augmented_val_mae": maes[2],
            "augmented_test_mae": maes[3],
            "baseline_train_mae": maes[4],
            "augmented_train_mae": maes[5],
        }
        out["delta_val_mae"] = out["augmented_val_mae"] - out["baseline_val_mae"]
        out["delta_test_mae"] = out["augmented_test_mae"] - out["baseline_test_mae"]
        out["pct_val"] = (
            100.0 * out["delta_val_mae"] / out["baseline_val_mae"]
            if out["baseline_val_mae"]
            else 0.0
        )
        out["helps"] = float(out["delta_val_mae"] < 0 and out["delta_test_mae"] < 0)
        return out

    def sweep(
        self,
        real_train: DataFrame,
        variants: list[tuple[str, DataFrame, dict]],
        val: DataFrame,
        test: DataFrame,
        value_col: str,
        partition_cols: list[str],
        order_cols: list[str],
        baseline_file: str | None = None,
        max_workers: int = 4,
    ) -> list[dict]:
        """Augmentation sweep — evaluate many synthetic variants against
        ONE shared baseline (reference: run_ratio_sweep.py:50-176 and
        run_option_a_eval.py:67-98 loop generator configs through
        AugmentationEvaluator; augmentation_evaluator.py:66-93 computes
        the per-variant metric dict, :112-127 memoizes the baseline).

        ``variants`` is ``[(label, synthetic_df, meta), ...]``; each
        result row is ``{label, **meta, **augmentation_metrics(...)}``.

        Spark-first restructuring: the reference re-runs the whole
        pipeline per sweep point (a training subprocess each); here the
        real/val/test window frames build ONCE and stay persisted across
        the sweep, the baseline fits once (optionally memoized to
        ``baseline_file`` — M12, same contract as the reference's JSON
        memo), and only the synthetic windows + one Gram fit + two MAE
        scans run per variant. Ridge variants overlap from driver
        threads (independent Spark jobs over shared persisted inputs);
        the lstm predictor trains driver-side, so variants run
        sequentially (results are seed-deterministic either way).
        """
        mk = lambda d: _xy(d, self.window, self.horizon, value_col, partition_cols, order_cols)  # noqa: E731
        xy_real = mk(real_train).persist()
        xy_val = mk(val).persist()
        xy_test = mk(test).persist()
        try:
            return self._sweep_inner(
                mk, xy_real, xy_val, xy_test, variants, baseline_file, max_workers
            )
        finally:
            # unpersist even when a variant's fit/mae raises (no leaked
            # cached frames in a long-lived session)
            for d in (xy_real, xy_val, xy_test):
                d.unpersist()

    def _sweep_inner(
        self, mk, xy_real, xy_val, xy_test, variants, baseline_file, max_workers
    ) -> list[dict]:
        def fit(xy_train: DataFrame):
            if self.predictor == "lstm":
                return self._fit_lstm(xy_train, xy_val)
            return self._fit(xy_train)

        def mae(xy: DataFrame, model) -> float:
            if self.predictor == "lstm":
                return self._mae_lstm(xy, model)
            return self._mae(xy, model)

        def baseline_maes() -> dict:
            w = fit(xy_real)
            return {"val_mae": mae(xy_val, w), "test_mae": mae(xy_test, w)}

        def get_base() -> dict:
            if not baseline_file:
                return baseline_maes()
            import json

            from .memo import json_memo

            # key by config + data identity (same pattern as
            # ExternalPredictorEvaluator._fingerprint): reusing one
            # baseline_file across different splits or window/horizon/
            # predictor settings must recompute, not return a stale
            # baseline. The fitted callable itself is not fingerprinted.
            # deterministic fingerprint: a raw SUM(double) key would
            # vary in the last ulp with partition layout, silently
            # missing the memo on every layout change (min/max/count
            # are already order-independent)
            fp = xy_real.agg(
                F.count("*").alias("n"),
                _dsum(F.col("y")).alias("s"),
                F.min("y").alias("lo"),
                F.max("y").alias("hi"),
            ).first()
            key = json.dumps(
                [
                    self.window, self.horizon, self.predictor,
                    f"{fp['n']}:{fp['s']}:{fp['lo']}:{fp['hi']}",
                ]
            )
            return json_memo(baseline_file, key, baseline_maes)

        def variant_maes(item: tuple[str, DataFrame, dict]) -> tuple[float, float]:
            _, syn, _ = item
            xy_aug = mk(syn).unionByName(xy_real)  # J2 union
            w = fit(xy_aug)
            return mae(xy_val, w), mae(xy_test, w)

        def assemble(item, vm: tuple[float, float], base: dict) -> dict:
            label, _, meta = item
            row = {"label": label, **meta}
            row.update(
                augmentation_metrics(base["val_mae"], base["test_mae"], *vm)
            )
            return row

        if self.predictor == "lstm" or len(variants) <= 1:
            base = get_base()
            results = [assemble(v, variant_maes(v), base) for v in variants]
        else:
            from concurrent.futures import ThreadPoolExecutor

            # The baseline fit+MAEs only feed the final row assembly, so
            # they run IN the pool alongside the variants instead of
            # sequentially before it (guide §2.6); one extra worker so
            # the baseline never displaces a variant slot. Same jobs
            # over the same persisted inputs — only submission order
            # changes, so every number is unchanged.
            with ThreadPoolExecutor(
                max_workers=min(max_workers, len(variants)) + 1
            ) as pool:
                f_base = pool.submit(get_base)
                f_vms = [pool.submit(variant_maes, v) for v in variants]
                base = f_base.result()
                results = [
                    assemble(v, f.result(), base) for v, f in zip(variants, f_vms)
                ]
        return results

    def evaluate_reference_keys(
        self,
        real_train: DataFrame,
        synthetic: DataFrame,
        val: DataFrame,
        test: DataFrame,
        value_col: str,
        partition_cols: list[str],
        order_cols: list[str],
        include_distribution: bool = True,
    ) -> dict[str, float]:
        """The reference's exact output keys
        (predictive_evaluator.py:169-287 / tests/test_predictive_
        evaluator.py:45-58): {baseline,augmented}_mae_{train,val,test}
        (train included — predictive_evaluator.py:242,246), mae_delta_*,
        mae_pct_change_*, synthetic_helps_*, the size/config record
        (n_real_train, n_synthetic, n_augmented_train, n_val, n_test,
        window_size, horizon — :253-261), and the secondary
        ``dist_``-prefixed distribution panel on synthetic vs train
        (:268-273, via DistributionEvaluator.evaluate_arrays'
        distributed twin) — so a reference caller's key handling works
        unchanged. Per-split verdicts mirror the reference (delta < 0
        per split); the internal `helps` requires both splits."""
        m = self.evaluate(
            real_train, synthetic, val, test, value_col, partition_cols, order_cols
        )
        out = {
            "baseline_mae_train": m["baseline_train_mae"],
            "baseline_mae_val": m["baseline_val_mae"],
            "baseline_mae_test": m["baseline_test_mae"],
            "augmented_mae_train": m["augmented_train_mae"],
            "augmented_mae_val": m["augmented_val_mae"],
            "augmented_mae_test": m["augmented_test_mae"],
            "mae_delta_val": m["delta_val_mae"],
            "mae_delta_test": m["delta_test_mae"],
            "synthetic_helps_val": m["delta_val_mae"] < 0,
            "synthetic_helps_test": m["delta_test_mae"] < 0,
        }
        for split in ("val", "test"):
            base = out[f"baseline_mae_{split}"]
            out[f"mae_pct_change_{split}"] = (
                100.0 * out[f"mae_delta_{split}"] / base if base else 0.0
            )
        # size/config record (predictive_evaluator.py:253-261; the
        # reference counts raw price rows, not windows)
        n_train, n_syn = real_train.count(), synthetic.count()
        out.update(
            {
                "n_real_train": n_train,
                "n_synthetic": n_syn,
                "n_augmented_train": n_train + n_syn,
                "n_val": val.count(),
                "n_test": test.count(),
                "window_size": self.window,
                "horizon": self.horizon,
            }
        )
        if include_distribution:
            # secondary distribution panel, dist_-prefixed
            # (predictive_evaluator.py:268-273); best-effort like the
            # reference's try/except
            try:
                from .distribution import DistributionEvaluator

                tag = F.lit("syn")
                both = (
                    real_train.select(
                        F.lit("real").alias("tag"), *order_cols,
                        F.col(value_col).alias("value"),
                    )
                    .unionByName(
                        synthetic.select(
                            tag.alias("tag"), *order_cols,
                            F.col(value_col).alias("value"),
                        )
                    )
                )
                dist = DistributionEvaluator().evaluate_reference_keys(
                    both, "value", "tag", "real", "syn", list(order_cols)
                )
                out.update({f"dist_{k}": v for k, v in dist.items()})
            except Exception:  # noqa: BLE001 — parity with :274-275
                pass
        return out
