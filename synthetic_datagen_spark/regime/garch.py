"""M6 — GARCH(1,1) grid-search MLE, parallelized across the grid.

reference: regime_hmm_garch.py:23-62 — a 6×8 (α, β) grid; per candidate
a sequential σ² recursion (W16: σ²_t = ω + α r²_{t-1} + β σ²_{t-1})
scores the Gaussian log-likelihood; ω is set from the unconditional
variance ω = var·(1-α-β).

Spark design: the grid × regimes cross product is a small DataFrame;
each (regime, α, β) cell is one applyInPandas task running the numpy
scan over that regime's return vector (broadcast once). 48 cells × K
regimes all evaluate concurrently across executors; the argmax per
regime is a window top-1 — the reference's driver loop becomes one
shuffle-free fan-out + one tiny aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

ALPHAS = [0.02, 0.05, 0.08, 0.12, 0.16, 0.2]
BETAS = [0.5, 0.6, 0.68, 0.75, 0.8, 0.85, 0.9, 0.94]


def _loglik(r: np.ndarray, omega: float, alpha: float, beta: float) -> float:
    """Gaussian log-likelihood under the GARCH(1,1) variance recursion."""
    n = len(r)
    sig2 = np.empty(n)
    sig2[0] = max(r.var(), 1e-12)
    r2 = r * r
    for t in range(1, n):  # W16 sequential recurrence — per-task numpy
        sig2[t] = omega + alpha * r2[t - 1] + beta * sig2[t - 1]
    sig2 = np.maximum(sig2, 1e-12)
    return float(-0.5 * np.sum(np.log(2 * np.pi * sig2) + r2 / sig2))


def fit_garch_grid(
    spark: SparkSession,
    regime_returns: DataFrame,
    max_points_per_regime: int = 200_000,
) -> dict[int, dict]:
    """Fit (ω, α, β) per regime by grid MLE.

    regime_returns: (regime, idx, log_ret). Returns
    {regime: {omega, alpha, beta, loglik}}.
    """
    # bounded, ordered per-regime return vectors, shipped to tasks via
    # the grouped-map input itself (no driver collect of raw returns)
    w = Window.partitionBy("regime").orderBy("idx")
    bounded = (
        regime_returns.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_points_per_regime)
        .select("regime", "idx", "log_ret")
    )
    grid = spark.createDataFrame(
        [(a, b) for a in ALPHAS for b in BETAS if a + b < 0.999], ["alpha", "beta"]
    )
    cells = bounded.crossJoin(F.broadcast(grid))

    schema = T.StructType(
        [
            T.StructField("regime", T.IntegerType()),
            T.StructField("alpha", T.DoubleType()),
            T.StructField("beta", T.DoubleType()),
            T.StructField("omega", T.DoubleType()),
            T.StructField("loglik", T.DoubleType()),
        ]
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("idx")
        r = pdf["log_ret"].to_numpy()
        a = float(pdf["alpha"].iloc[0])
        b = float(pdf["beta"].iloc[0])
        var = max(float(r.var()), 1e-12)
        omega = var * (1.0 - a - b)
        ll = _loglik(r - r.mean(), omega, a, b) if len(r) >= 5 else -np.inf
        return pd.DataFrame(
            {
                "regime": [int(pdf["regime"].iloc[0])],
                "alpha": [a],
                "beta": [b],
                "omega": [omega],
                "loglik": [ll],
            }
        )

    scored = cells.groupBy("regime", "alpha", "beta").applyInPandas(score, schema)
    top = Window.partitionBy("regime").orderBy(F.desc("loglik"), "alpha", "beta")
    best = (
        scored.withColumn("_rk", F.row_number().over(top))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
        .collect()
    )
    return {
        int(r["regime"]): {
            "omega": r["omega"],
            "alpha": r["alpha"],
            "beta": r["beta"],
            "loglik": r["loglik"],
        }
        for r in best
    }
