"""D8 — composite quality score (reference: composite_metric.py:66-153).

Weighted sum of normalized metric deviations / total weight; weights
overridable per stage (reference optimize_staged.py:74-94). Lower is
better; 0 = indistinguishable."""

from __future__ import annotations

# the reference's exact weight profile (composite_metric.py:78-90),
# keyed to our evaluator's metric names (same semantics: ratio
# deviations for ac/vol-cluster/std, normalized raw-kurtosis diff)
DEFAULT_WEIGHTS: dict[str, float] = {
    "js_div": 3.0,           # reference key: js_divergence
    "ks_stat": 2.0,          # ks_statistic
    "ac_lag1": 2.0,
    "ac_lag5": 1.5,
    "ac_lag24": 1.0,
    "hurst_diff": 2.0,
    "vol_cluster": 1.5,
    "spectral_dist": 1.5,    # spectral
    "skew_diff": 1.0,
    "kurt_diff": 1.0,
    "std_dev": 2.0,          # std_ratio deviation |ratio − 1|
}


def composite_score(
    metrics: dict[str, float], weights: dict[str, float] | None = None
) -> dict[str, float]:
    """Returns {"score": ..., plus each weighted component}."""
    w = dict(DEFAULT_WEIGHTS)
    if weights:
        w.update(weights)
    comps: dict[str, float] = {}
    total_w = 0.0
    acc = 0.0
    for key, weight in w.items():
        if weight <= 0:
            continue
        if key == "std_dev":
            v = abs(metrics.get("std_ratio", 1.0) - 1.0)
        else:
            v = metrics.get(key)
            if v is None:
                continue
        if v != v:  # NaN guard
            continue
        comps[f"w_{key}"] = weight * v
        acc += weight * v
        total_w += weight
    comps["score"] = acc / total_w if total_w else float("nan")
    return comps
