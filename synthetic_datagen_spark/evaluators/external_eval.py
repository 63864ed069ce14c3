"""M13 — external-predictor evaluation protocol (reference:
augmentation_evaluator.py:138-447 / predictive_evaluator.py:291-411:
hand the datasets to an out-of-process predictor as CSV files plus a
normalization-params JSON, run it with a timeout, parse the metrics
JSON back, and memoize the expensive baseline run).

The reference hard-wires one predictor repo; this engine generalizes
the same handshake into a documented file contract so ANY predictor
can plug in:

  cmd --train train.csv --val val.csv --test test.csv \
      --norm norm.json --out metrics.json

  * train/val/test: header CSVs with the series columns;
  * norm.json: {"mean": μ, "std": σ} of the REAL training values —
    the normalization handoff (augmentation_evaluator.py:250-274);
  * metrics.json (written by the predictor): {"val_mae": …,
    "test_mae": …} at minimum.

A/B protocol: baseline run on real train; augmented run on real +
synthetic, with the synthetic series rescaled to the real train's
(μ, σ) exactly like the reference's z-score handoff; deltas/verdict
computed like M11. The baseline memoizes via M12's JSON memo keyed on
(cmd, dataset fingerprint), so GA loops pay it once.

Scale note: the external-predictor hatch is inherently single-process
(the reference shells out per evaluation too); datasets cross to CSV
via bounded driver exports. The DISTRIBUTED escape hatch for per-row
transforms remains sources/external.pipe_through_process (S9).
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile

from pyspark.sql import DataFrame, functions as F

from .memo import json_memo


class ExternalPredictorEvaluator:
    def __init__(
        self,
        cmd: list[str],
        value_col: str = "value",
        timeout: float = 3600.0,  # reference's predictor timeout
        memo_path: str | None = None,
        max_rows: int = 100_000,
    ):
        self.cmd = list(cmd)
        self.value_col = value_col
        self.timeout = timeout
        self.memo_path = memo_path
        self.max_rows = max_rows

    # ---------------------------------------------------------- utils --
    def _export_csv(self, df: DataFrame, path: str, order_cols: list[str]) -> None:
        (
            df.orderBy(*order_cols)
            .limit(self.max_rows)
            .toPandas()
            .to_csv(path, index=False)
        )

    def _fingerprint(self, df: DataFrame) -> str:
        """Cheap dataset identity for the baseline memo key: count +
        sum + min/max of the value column (one distributed aggregate)."""
        r = df.agg(
            F.count("*").alias("n"),
            F.sum(self.value_col).alias("s"),
            F.min(self.value_col).alias("lo"),
            F.max(self.value_col).alias("hi"),
        ).first()
        return f"{r['n']}:{r['s']}:{r['lo']}:{r['hi']}"

    def _run(
        self, train_csv: str, val_csv: str, test_csv: str, norm: dict, tmp: str,
        tag: str = "m",
    ) -> dict:
        # per-run file names so the baseline and augmented runs can
        # execute concurrently (the --norm/--out paths are explicit args
        # in the child contract, so the names are not part of it)
        norm_path = os.path.join(tmp, f"norm_{tag}.json")
        out_path = os.path.join(tmp, f"metrics_{tag}.json")
        with open(norm_path, "w") as f:
            json.dump(norm, f)
        subprocess.run(
            self.cmd
            + [
                "--train", train_csv, "--val", val_csv, "--test", test_csv,
                "--norm", norm_path, "--out", out_path,
            ],
            capture_output=True,
            timeout=self.timeout,
            check=True,
        )
        with open(out_path) as f:
            return json.load(f)

    # ------------------------------------------------------- evaluate --
    def evaluate(
        self,
        real_train: DataFrame,
        synthetic: DataFrame,
        val: DataFrame,
        test: DataFrame,
        order_cols: list[str],
    ) -> dict[str, float]:
        v = self.value_col
        stats = real_train.agg(
            F.mean(v).alias("mu"), F.stddev_pop(v).alias("sd")
        ).first()
        mu, sd = float(stats["mu"]), float(stats["sd"] or 1.0)
        norm = {"mean": mu, "std": sd}

        # normalization handoff: rescale the synthetic series to the
        # real train's (μ, σ) so the predictor sees one scale
        s_stats = synthetic.agg(
            F.mean(v).alias("mu"), F.stddev_pop(v).alias("sd")
        ).first()
        s_mu, s_sd = float(s_stats["mu"] or 0.0), float(s_stats["sd"] or 1.0) or 1.0
        syn_scaled = synthetic.withColumn(
            v, (F.col(v) - F.lit(s_mu)) / F.lit(s_sd) * F.lit(sd) + F.lit(mu)
        )

        with tempfile.TemporaryDirectory() as tmp:
            t_csv = os.path.join(tmp, "train.csv")
            a_csv = os.path.join(tmp, "train_aug.csv")
            v_csv = os.path.join(tmp, "val.csv")
            x_csv = os.path.join(tmp, "test.csv")
            # the four exports are independent bounded collect jobs and
            # the baseline/augmented predictor runs are pure functions of
            # their (disjoint) files — overlap both phases on driver
            # threads (guide §2.6); results are unchanged by submission
            # order.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=4) as pool:
                list(
                    pool.map(
                        lambda job: self._export_csv(*job),
                        [
                            (real_train, t_csv, order_cols),
                            (real_train.unionByName(syn_scaled), a_csv, order_cols),
                            (val, v_csv, order_cols),
                            (test, x_csv, order_cols),
                        ],
                    )
                )

            def run_baseline() -> dict:
                return self._run(t_csv, v_csv, x_csv, norm, tmp, tag="base")

            def run_baseline_memoized() -> dict:
                if self.memo_path:
                    key = json.dumps([self.cmd, self._fingerprint(real_train)])
                    return json_memo(self.memo_path, key, run_baseline)
                return run_baseline()

            with ThreadPoolExecutor(max_workers=2) as pool:
                f_base = pool.submit(run_baseline_memoized)
                f_aug = pool.submit(
                    self._run, a_csv, v_csv, x_csv, norm, tmp, "aug"
                )
                base = f_base.result()
                aug = f_aug.result()

        out = {
            "baseline_val_mae": float(base["val_mae"]),
            "baseline_test_mae": float(base["test_mae"]),
            "augmented_val_mae": float(aug["val_mae"]),
            "augmented_test_mae": float(aug["test_mae"]),
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
