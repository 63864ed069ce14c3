"""M6 — GARCH(1,1) grid-search MLE, parallelized across the grid.

reference: regime_hmm_garch.py:23-62 — a 6×8 (α, β) grid; per candidate
a sequential σ² recursion (W16: σ²_t = ω + α r²_{t-1} + β σ²_{t-1})
scores the Gaussian log-likelihood; ω is set from the unconditional
variance ω = var·(1-α-β).

Spark design: one grouped-map task per regime; inside the task the σ²
recursion runs over ALL grid cells simultaneously as a (T × 45) numpy
vector recursion — the per-step work is a length-45 vector op, so the
whole grid costs one pass over the returns. Regimes parallelize across
executors; the per-regime argmax happens in the task. (The alternative
— one task per grid cell — shuffles the returns ×45; vectorizing the
grid inside the regime task moves that ×45 into registers.)
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


def _loglik_grid(
    r: np.ndarray, omegas: np.ndarray, alphas: np.ndarray, betas: np.ndarray
) -> np.ndarray:
    """Vectorized W16: σ² recursion for ALL grid cells at once — each
    step is a length-|grid| vector op, so the full grid is one pass."""
    n = len(r)
    r2 = r * r
    sig2 = np.full(len(alphas), max(r.var(), 1e-12))
    ll = -0.5 * (np.log(2 * np.pi * sig2) + r2[0] / sig2)
    for t in range(1, n):
        sig2 = np.maximum(omegas + alphas * r2[t - 1] + betas * sig2, 1e-12)
        ll += -0.5 * (np.log(2 * np.pi * sig2) + r2[t] / sig2)
    return ll


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
    grid = [(a, b) for a in ALPHAS for b in BETAS if a + b < 0.999]
    g_alphas = np.array([a for a, _ in grid])
    g_betas = np.array([b for _, b in grid])

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
        var = max(float(r.var()), 1e-12)
        omegas = var * (1.0 - g_alphas - g_betas)
        if len(r) >= 5:
            ll = _loglik_grid(r - r.mean(), omegas, g_alphas, g_betas)
        else:
            ll = np.full(len(grid), -np.inf)
        # argmax with the (alpha, beta) tie-break order of the grid
        best = int(np.lexsort((g_betas, g_alphas, -ll))[0])
        return pd.DataFrame(
            {
                "regime": [int(pdf["regime"].iloc[0])],
                "alpha": [g_alphas[best]],
                "beta": [g_betas[best]],
                "omega": [omegas[best]],
                "loglik": [float(ll[best])],
            }
        )

    best_rows = bounded.groupBy("regime").applyInPandas(score, schema).collect()
    return {
        int(r["regime"]): {
            "omega": r["omega"],
            "alpha": r["alpha"],
            "beta": r["beta"],
            "loglik": r["loglik"],
        }
        for r in best_rows
    }
