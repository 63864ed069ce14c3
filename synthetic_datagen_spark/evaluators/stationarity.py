"""D4 — ADF stationarity test, distributed-OLS formulation
(reference: distribution_evaluator.py:49-54 wraps statsmodels
``adfuller``; statsmodels is not available here, and collecting the
series to the driver would not survive 100 TB anyway).

Design: the ADF(1) regression  Δy_t = α + β·y_{t-1} + γ·Δy_{t-1} + ε
needs only the 3×3 Gram matrix X'X, X'y and y'y — ten sum-of-product
aggregates per series, one distributed pass, then a closed-form solve
of the tiny system on the driver. The t-statistic on β is the ADF stat.

The p-value interpolates the asymptotic Dickey-Fuller τ_μ quantiles
(Fuller 1976, constant-only case) — an approximation of statsmodels'
MacKinnon surface, accurate to ~1e-2 in p, with the reference's −1.0
sentinel on degenerate input (distribution_evaluator.py:53-54).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F

# asymptotic τ_μ quantiles (constant, no trend), Fuller 1976 Tab. 8.5.2
_P = np.array([0.01, 0.025, 0.05, 0.10, 0.50, 0.90, 0.95, 0.975, 0.99])
_TAU = np.array([-3.43, -3.12, -2.86, -2.57, -1.57, -0.44, -0.07, 0.23, 0.60])


def _tau_pvalue(stat: float) -> float:
    return float(np.clip(np.interp(stat, _TAU, _P), 0.001, 0.999))


def adf_panel(
    df: DataFrame,
    value_col: str,
    series_cols: list[str],
    order_cols: list[str],
) -> list[dict]:
    """Per-series ADF(1): returns [{series…, adf_stat, p_value, n}].

    One window pass builds (dy, ylag, dylag); one groupBy computes all
    Gram sums; the 3×3 solve runs on the driver per series (K tiny
    systems for K series).
    """
    w = Window.partitionBy(*series_cols).orderBy(*order_cols)
    y = F.col(value_col)
    d = (
        df.withColumn("_ylag", F.lag(value_col).over(w))
        .withColumn("_dy", y - F.col("_ylag"))
        .withColumn("_dylag", F.lag("_dy").over(w))
        .filter(F.col("_dylag").isNotNull())
    )
    c = {"yl": F.col("_ylag"), "dl": F.col("_dylag"), "dy": F.col("_dy")}
    agg = d.groupBy(*series_cols).agg(
        F.count("*").alias("n"),
        F.sum(c["yl"]).alias("s_yl"),
        F.sum(c["dl"]).alias("s_dl"),
        F.sum(c["dy"]).alias("s_dy"),
        F.sum(c["yl"] * c["yl"]).alias("s_ylyl"),
        F.sum(c["yl"] * c["dl"]).alias("s_yldl"),
        F.sum(c["dl"] * c["dl"]).alias("s_dldl"),
        F.sum(c["yl"] * c["dy"]).alias("s_yldy"),
        F.sum(c["dl"] * c["dy"]).alias("s_dldy"),
        F.sum(c["dy"] * c["dy"]).alias("s_dydy"),
    )
    out = []
    for r in agg.collect():
        n = r["n"]
        key = {k: r[k] for k in series_cols}
        stat_p = adf_closed_form(
            n, r["s_yl"], r["s_dl"], r["s_dy"], r["s_ylyl"], r["s_yldl"],
            r["s_dldl"], r["s_yldy"], r["s_dldy"], r["s_dydy"],
        )
        out.append({**key, "adf_stat": stat_p[0], "p_value": stat_p[1], "n": n})
    return out


def adf_closed_form(
    n, s_yl, s_dl, s_dy, s_ylyl, s_yldl, s_dldl, s_yldy, s_dldy, s_dydy
) -> tuple[float, float]:
    """Closed-form Cramer solve of the ADF(1) normal equations from the
    ten Gram sums — EXACTLY the arithmetic the SQL oracle mirrors
    (explicit cofactors, no np.linalg), so both engines agree to fp.

    Sentinel (-1, -1) on: n < 8, singular system, non-positive residual
    variance or β-variance (reference's degenerate-input convention)."""
    if n < 8:
        return -1.0, -1.0
    # determinant of the symmetric 3x3 X'X
    det = (
        n * (s_ylyl * s_dldl - s_yldl * s_yldl)
        - s_yl * (s_yl * s_dldl - s_yldl * s_dl)
        + s_dl * (s_yl * s_yldl - s_ylyl * s_dl)
    )
    if abs(det) < 1e-250:
        return -1.0, -1.0
    # Cramer: replace column k with X'y
    det_b0 = (
        s_dy * (s_ylyl * s_dldl - s_yldl * s_yldl)
        - s_yl * (s_yldy * s_dldl - s_yldl * s_dldy)
        + s_dl * (s_yldy * s_yldl - s_ylyl * s_dldy)
    )
    det_b1 = (
        n * (s_yldy * s_dldl - s_yldl * s_dldy)
        - s_dy * (s_yl * s_dldl - s_yldl * s_dl)
        + s_dl * (s_yl * s_dldy - s_yldy * s_dl)
    )
    det_b2 = (
        n * (s_ylyl * s_dldy - s_yldy * s_yldl)
        - s_yl * (s_yl * s_dldy - s_yldy * s_dl)
        + s_dy * (s_yl * s_yldl - s_ylyl * s_dl)
    )
    b0, b1, b2 = det_b0 / det, det_b1 / det, det_b2 / det
    # (X'X)^-1[1,1] = cofactor_11 / det
    inv11 = (n * s_dldl - s_dl * s_dl) / det
    btxtxb = (
        n * b0 * b0 + s_ylyl * b1 * b1 + s_dldl * b2 * b2
        + 2 * s_yl * b0 * b1 + 2 * s_dl * b0 * b2 + 2 * s_yldl * b1 * b2
    )
    rss = s_dydy - 2 * (b0 * s_dy + b1 * s_yldy + b2 * s_dldy) + btxtxb
    dof = n - 3
    if dof <= 0 or rss <= 0 or inv11 <= 0:
        return -1.0, -1.0
    se_beta = float(np.sqrt(rss / dof * inv11))
    stat = float(b1 / se_beta)
    return stat, _tau_pvalue(stat)
