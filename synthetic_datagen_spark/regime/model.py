"""M5/A8 — regime labeling + per-regime statistics, Spark-first.

The reference fits a GaussianHMM (hmmlearn, driver-side, ≤16k rows —
regime_hmm_garch.py:85-93). hmmlearn is not a dependency of this
engine; the scale path named in SURVEY §2.11 M5 is used as the primary:
MLlib GaussianMixture (seed-pinned EM, distributed) provides emission
clusters → arg-max labels, and the Markov transition structure is
estimated from the labeled sequence with the A7 lead-pair aggregate.
At 100 TB the GMM fit is a few distributed passes and labeling is a
single scan; nothing sequential happens on the driver.

Per-regime stats (A8, reference regime_hmm_garch.py:96-127): mean, std,
skewness, AR(1), count of returns — with the sparse-regime fallback
(global params for regimes with too few points).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pyspark.ml.clustering import GaussianMixture
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame, Window, functions as F


@dataclass
class RegimeModel:
    n_regimes: int = 4
    seed: int = 42
    min_points: int = 10
    # fitted state
    trans: np.ndarray | None = None        # K×K row-stochastic
    start: np.ndarray | None = None        # K start probs
    stats: dict[int, dict] = field(default_factory=dict)
    labeled: DataFrame | None = None

    _FEATS = ["log_ret", "vol_short", "vol_ratio"]

    def fit(self, features: DataFrame, partition_cols: list[str]) -> "RegimeModel":
        """features: output of ``regime_features`` (must carry idx)."""
        va = VectorAssembler(inputCols=self._FEATS, outputCol="_fv")
        sc = StandardScaler(inputCol="_fv", outputCol="_fs", withMean=True, withStd=True)
        d = va.transform(features)
        scaler = sc.fit(d)
        d = scaler.transform(d)
        # 30 iters @ 1e-3 converges on every series we label (each EM
        # iteration is a full distributed pass — halving iters halves
        # the fit cost; labels are arg-max cluster ids, insensitive to
        # the last 1e-3 of log-likelihood).
        gmm = GaussianMixture(k=self.n_regimes, seed=self.seed, featuresCol="_fs",
                              predictionCol="regime", maxIter=30, tol=1e-3)
        model = gmm.fit(d)
        labeled = model.transform(d).drop("_fv", "_fs", "probability")
        labeled = labeled.persist()
        self.labeled = labeled

        # A7 transition counts over the labeled sequence
        w = Window.partitionBy(*partition_cols).orderBy("idx")
        pairs = (
            labeled.withColumn("_nxt", F.lead("regime").over(w))
            .filter(F.col("_nxt").isNotNull())
            .groupBy("regime", "_nxt")
            .count()
            .collect()
        )
        k = self.n_regimes
        tm = np.zeros((k, k))
        for r in pairs:
            tm[r["regime"], r["_nxt"]] = r["count"]
        tm += 1e-6  # Laplace floor so every regime stays reachable
        self.trans = tm / tm.sum(axis=1, keepdims=True)

        freq = np.zeros(k)
        counts = labeled.groupBy("regime").count().collect()
        for r in counts:
            freq[r["regime"]] = r["count"]
        self.start = freq / freq.sum()

        # A8 per-regime return stats with AR(1) via corr-with-lag
        lag_r = F.lag("log_ret").over(w)
        stats_rows = (
            labeled.withColumn("_lr", lag_r)
            .groupBy("regime")
            .agg(
                F.count("*").alias("n"),
                F.mean("log_ret").alias("mu"),
                F.stddev_pop("log_ret").alias("sigma"),
                F.skewness("log_ret").alias("skew"),
                F.corr("log_ret", "_lr").alias("ar1"),
            )
            .collect()
        )
        glob = features.agg(
            F.mean("log_ret").alias("mu"), F.stddev_pop("log_ret").alias("sigma")
        ).first()
        for s in stats_rows:
            sparse = s["n"] < self.min_points
            self.stats[s["regime"]] = {
                "n": s["n"],
                "mu": glob["mu"] if sparse else s["mu"],
                "sigma": glob["sigma"] if sparse else (s["sigma"] or glob["sigma"]),
                "skew": 0.0 if sparse else (s["skew"] or 0.0),
                "ar1": 0.0 if sparse or s["ar1"] is None else float(np.clip(s["ar1"], -0.99, 0.99)),
            }
        for r in range(k):  # regimes GMM never emitted
            self.stats.setdefault(
                r, {"n": 0, "mu": glob["mu"], "sigma": glob["sigma"], "skew": 0.0, "ar1": 0.0}
            )
        return self

    def regime_returns(self) -> DataFrame:
        """(regime, idx, log_ret) of the labeled training stream — input
        to the GARCH grid and the hybrid block pools."""
        if self.labeled is None:
            raise RuntimeError("fit() first")
        return self.labeled.select("regime", "idx", "log_ret")

    # ---------------------------------------------------- artifacts --
    # S6: pure-JSON model I/O (reference: regime_hmm_garch.py:193-200,
    # regime_conditional.py:188-195 — HMM/GARCH models serialize as
    # plain JSON; the labeled training frame is data, not model, and is
    # re-derivable, so it is not persisted).
    def save(self, path: str) -> None:
        import json
        import os

        if self.trans is None:
            raise RuntimeError("fit() first")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(
                {
                    "n_regimes": self.n_regimes,
                    "seed": self.seed,
                    "min_points": self.min_points,
                    "trans": self.trans.tolist(),
                    "start": self.start.tolist(),
                    "stats": {str(k): v for k, v in self.stats.items()},
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "RegimeModel":
        import json

        with open(path) as f:
            d = json.load(f)
        m = cls(n_regimes=d["n_regimes"], seed=d["seed"], min_points=d["min_points"])
        m.trans = np.array(d["trans"])
        m.start = np.array(d["start"])
        m.stats = {int(k): v for k, v in d["stats"].items()}
        return m
