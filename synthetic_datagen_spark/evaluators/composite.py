"""D8 — composite quality score (reference: composite_metric.py:66-153).

Weighted sum of normalized metric deviations / total weight; weights
overridable per stage (reference optimize_staged.py:74-94). Lower is
better; 0 = indistinguishable."""

from __future__ import annotations

# reference weight profile (composite_metric.py:77-90), keyed to the
# metric names produced by DistributionEvaluator.evaluate
DEFAULT_WEIGHTS: dict[str, float] = {
    "js_div": 2.0,
    "ks_stat": 1.5,
    "wasserstein": 1.0,
    "std_dev": 2.0,          # |std_ratio - 1|
    "ac1_diff": 1.5,
    "ac5_diff": 0.5,
    "ac10_diff": 0.5,
    "ac24_diff": 0.5,
    "vol_cluster_diff": 1.5,
    "hurst_diff": 1.0,
    "spectral_dist": 1.0,
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
