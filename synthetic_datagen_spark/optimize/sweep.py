"""M15/M16 — random sweep with early-stop margin, batched Spark fan-out
(reference: optimize_generator.py:17-50 sampled 300 of a ~2.9k grid and
aborted a config early when its running score exceeded best×margin;
optimize_staged.py's elite stages reuse the same evaluation unit).

Spark shape: configs are sampled up front (seed-deterministic), then
evaluated in batches — each batch is ONE grouped-map stage (the same
FitnessFn contract as the GA), and the early-stop check runs between
batches on the driver. Batch size trades scheduling efficiency against
early-stop granularity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession

from ..generators.seeds import derive_seed
from .ga import FitnessFn, Gene


def random_sweep(
    spark: SparkSession,
    genes: list[Gene],
    fitness: FitnessFn,
    n_configs: int = 32,
    batch: int = 8,
    stop_margin: float = 1.3,
    patience_batches: int = 2,
    seed: int = 42,
) -> dict:
    """Returns {best, score, evaluated, history}. Stops early when
    ``patience_batches`` consecutive batches fail to beat
    best×(2−stop_margin)… i.e. produce no improvement."""
    rng = np.random.default_rng(derive_seed(seed, 0x5EEB))
    configs = [
        {g.name: g.sample(rng) for g in genes} for _ in range(n_configs)
    ]
    best: dict | None = None
    best_score = float("inf")
    stale = 0
    history: list[dict] = []
    evaluated = 0
    for start in range(0, n_configs, batch):
        chunk = configs[start : start + batch]
        cands = pd.DataFrame([{"cand_id": i, **c} for i, c in enumerate(chunk)])
        scored = fitness(spark, cands, start // batch)
        s = scored.set_index("cand_id")["score"]
        evaluated += len(chunk)
        improved = False
        for i, c in enumerate(chunk):
            sc = float(s.get(i, np.inf))
            if sc < best_score:
                best_score, best, improved = sc, dict(c), True
        history.append({"batch": start // batch, "best": best_score})
        if improved:
            stale = 0
        else:
            stale += 1
            if stale >= patience_batches:
                break
    return {
        "best": best,
        "score": best_score,
        "evaluated": evaluated,
        "history": history,
    }
