"""G6/G7 — regime-conditional generation: Markov regime sequence +
AR(1) mean + GARCH(1,1) variance, per-series sequential scan fanned out
with applyInPandas (reference: regime_hmm_garch.py:157-186,
regime_conditional.py:163-179).

Each synthetic series is one grouped-map task seeded by
splitmix64(base_seed, series_id); the fitted model (K×K matrix, K stat
dicts, K GARCH params) broadcasts as closure constants. Thousands of
series/seeds parallelize across executors while each walk stays a tight
numpy loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..generators.seeds import derive_seed
from .model import RegimeModel


class RegimeGenerator:
    def __init__(self, model: RegimeModel, garch: dict[int, dict] | None = None, p0: float = 100.0):
        self.model = model
        self.garch = garch or {}
        self.p0 = p0

    def generate(self, spark: SparkSession, seed: int, n_samples: int, n_series: int = 1) -> DataFrame:
        trans = self.model.trans
        start = self.model.start
        stats = self.model.stats
        garch = self.garch
        p0 = float(self.p0)
        if trans is None:
            raise RuntimeError("model not fitted")
        trans_cum = np.cumsum(trans, axis=1)
        start_cum = np.cumsum(start)
        k = len(start)

        schema = T.StructType(
            [
                T.StructField("series_id", T.LongType()),
                T.StructField("t", T.LongType()),
                T.StructField("regime", T.IntegerType()),
                T.StructField("price", T.DoubleType()),
            ]
        )

        def walk(pdf: pd.DataFrame) -> pd.DataFrame:
            out = []
            for sid in pdf["id"]:
                rng = np.random.default_rng(derive_seed(seed, int(sid)))
                # G6: regime path
                regimes = np.empty(n_samples - 1, dtype=np.int64)
                s = int(np.searchsorted(start_cum, rng.random(), side="right"))
                for t in range(n_samples - 1):
                    s = min(int(np.searchsorted(trans_cum[s], rng.random(), side="right")), k - 1)
                    regimes[t] = s
                # G7: AR(1) mean + GARCH variance recursion (W16)
                rets = np.empty(n_samples - 1)
                prev_r = 0.0
                sig2 = np.array([stats[r]["sigma"] ** 2 for r in range(k)])
                cur_sig2 = float(sig2[regimes[0]]) if k else 1e-6
                for t in range(n_samples - 1):
                    st = stats[regimes[t]]
                    g = garch.get(int(regimes[t]))
                    if g is not None:
                        cur_sig2 = g["omega"] + g["alpha"] * prev_r * prev_r + g["beta"] * cur_sig2
                        vol = np.sqrt(max(cur_sig2, 1e-18))
                    else:
                        vol = max(st["sigma"], 1e-9)
                    r = st["mu"] + st["ar1"] * (prev_r - st["mu"]) + vol * rng.standard_normal()
                    rets[t] = r
                    prev_r = r
                cum = np.clip(np.concatenate([[0.0], np.cumsum(rets)]), -600.0, 600.0)
                prices = np.clip(p0 * np.exp(cum), 1e-300, 1e300)
                out.append(
                    pd.DataFrame(
                        {
                            "series_id": np.full(n_samples, sid, dtype=np.int64),
                            "t": np.arange(n_samples, dtype=np.int64),
                            "regime": np.concatenate([[regimes[0]], regimes]).astype(np.int32),
                            "price": prices,
                        }
                    )
                )
            return (
                pd.concat(out)
                if out
                else pd.DataFrame(columns=["series_id", "t", "regime", "price"])
            )

        return (
            spark.range(n_series)
            .repartition(max(1, min(n_series, 64)), "id")
            .groupBy("id")
            .applyInPandas(walk, schema)
        )
