"""M14 — genetic-algorithm hyperparameter search, GA loop on the driver
with the population's fitness evaluations fanned out as ONE Spark job
per generation (reference: app/ga_optimizer.py:46-589; the reference
runs DEAP sequentially / per-candidate subprocesses, optimize_staged.py:
213-218 — here a generation is a single grouped-map stage, so pop×seeds
tasks schedule across the whole cluster and crash isolation comes from
Spark task retry instead of subprocesses).

Pieces kept from the reference's design: typed gene bounds (float/int/
log-space, ga_optimizer.py:46-118), tournament-3 selection, two-point
crossover, per-gene mutation, elitism (HallOfFame), early-stop patience.
Everything is seed-deterministic: the GA rng derives from (seed, gen)
and each fitness evaluation from (seed, cand_id, eval_seed), so the
search trajectory is identical under any partitioning.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

from ..generators.seeds import derive_seed


@dataclass(frozen=True)
class Gene:
    name: str
    lo: float
    hi: float
    kind: str = "float"  # float | int | log

    def sample(self, rng: np.random.Generator) -> float:
        if self.kind == "log":
            v = float(np.exp(rng.uniform(np.log(self.lo), np.log(self.hi))))
        else:
            v = float(rng.uniform(self.lo, self.hi))
        return self.clip(v)

    def clip(self, v: float) -> float:
        v = float(np.clip(v, self.lo, self.hi))
        return float(round(v)) if self.kind == "int" else v


FitnessFn = Callable[[SparkSession, pd.DataFrame, int], pd.DataFrame]
"""(spark, candidates[cand_id + gene cols], gen) -> pdf[cand_id, score]."""


@dataclass
class GAOptimizer:
    genes: list[Gene]
    fitness: FitnessFn
    pop_size: int = 16
    n_gens: int = 8
    seed: int = 42
    tourn: int = 3
    cx_prob: float = 0.7
    mut_prob: float = 0.3
    mut_sigma: float = 0.15  # relative to gene range
    elite: int = 2
    patience: int = 4
    history: list[dict] = field(default_factory=list)

    # ------------------------------------------------------------------
    def optimize(self, spark: SparkSession, init_pop: list[dict] | None = None) -> dict:
        """Run the GA; returns {best, score, history, pop, scores} —
        final population + scores so a stage loop (M15) can carry elites
        into its next stage. ``init_pop`` seeds the population (padded
        with random samples / truncated to pop_size)."""
        rng = np.random.default_rng(derive_seed(self.seed, 0x6A))
        pop = [dict(c) for c in (init_pop or [])][: self.pop_size]
        pop = [
            {g.name: g.clip(c.get(g.name, g.sample(rng))) for g in self.genes}
            for c in pop
        ]
        while len(pop) < self.pop_size:
            pop.append({g.name: g.sample(rng) for g in self.genes})
        best: dict | None = None
        best_score = float("inf")
        stale = 0
        scores = np.array([])
        for gen in range(self.n_gens):
            scores = self._evaluate(spark, pop, gen)
            order = np.argsort(scores)
            gen_best = float(scores[order[0]])
            self.history.append(
                {"gen": gen, "best": gen_best, "mean": float(np.mean(scores))}
            )
            if gen_best < best_score - 1e-12:
                best_score = gen_best
                best = dict(pop[order[0]])
                stale = 0
            else:
                stale += 1
                if stale >= self.patience:
                    break
            if gen < self.n_gens - 1:
                pop = self._next_gen(
                    pop, scores, np.random.default_rng(derive_seed(self.seed, gen + 1))
                )
        return {
            "best": best,
            "score": best_score,
            "history": self.history,
            "pop": pop,
            "scores": scores,
        }

    # ------------------------------------------------------------------
    def _evaluate(self, spark: SparkSession, pop: list[dict], gen: int) -> np.ndarray:
        cands = pd.DataFrame([{"cand_id": i, **c} for i, c in enumerate(pop)])
        scored = self.fitness(spark, cands, gen)
        s = scored.set_index("cand_id")["score"]
        return np.array([float(s.get(i, np.inf)) for i in range(len(pop))])

    def _next_gen(
        self, pop: list[dict], scores: np.ndarray, rng: np.random.Generator
    ) -> list[dict]:
        order = np.argsort(scores)
        nxt = [dict(pop[i]) for i in order[: self.elite]]
        names = [g.name for g in self.genes]
        while len(nxt) < len(pop):
            a = self._tournament(pop, scores, rng)
            b = self._tournament(pop, scores, rng)
            child = dict(a)
            if rng.random() < self.cx_prob and len(names) >= 2:
                # two-point crossover over the gene vector
                i, j = sorted(rng.choice(len(names), size=2, replace=False))
                for nm in names[i : j + 1]:
                    child[nm] = b[nm]
            for g in self.genes:
                if rng.random() < self.mut_prob:
                    span = g.hi - g.lo
                    child[g.name] = g.clip(child[g.name] + rng.normal(0.0, self.mut_sigma * span))
            nxt.append(child)
        return nxt

    def _tournament(
        self, pop: list[dict], scores: np.ndarray, rng: np.random.Generator
    ) -> dict:
        idx = rng.integers(0, len(pop), size=self.tourn)
        return pop[int(idx[np.argmin(scores[idx])])]


# ----------------------------------------------------------------------
def moment_match_fitness(
    returns_pool: np.ndarray,
    real_stats: dict[str, float],
    n_samples: int = 512,
    n_seeds: int = 3,
    base_seed: int = 42,
    weights: dict[str, float] | None = None,
) -> FitnessFn:
    """Built-in fitness: block-bootstrap-lite generation + composite
    moment-matching score, one grouped-map task per candidate (the
    reference's per-candidate train→generate→evaluate unit,
    ga_optimizer.py:467-513, as a Spark stage).

    Genes understood: block_size (int), lam (blend weight in [0,1]).
    Score = w_std·|std_ratio−1| + w_ac1·|ac1_diff| + w_mean·|mean_diff| —
    the D8 weighted recipe reduced to its three dominant terms, averaged
    over n_seeds; per-stage ``weights`` reweight the objective like the
    reference's stage-specific weight dicts (optimize_staged.py:74-94).
    """
    pool = np.asarray(returns_pool, dtype=np.float64)
    r_std = real_stats["std"]
    r_ac1 = real_stats["ac1"]
    r_mean = real_stats["mean"]
    wts = {"std": 1.0, "ac1": 1.0, "mean": 10.0, **(weights or {})}
    w_std, w_ac1, w_mean = wts["std"], wts["ac1"], wts["mean"]

    schema = T.StructType(
        [
            T.StructField("cand_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def fitness(spark: SparkSession, cands: pd.DataFrame, gen: int) -> pd.DataFrame:
        sdf = spark.createDataFrame(cands)

        def eval_one(pdf: pd.DataFrame) -> pd.DataFrame:
            row = pdf.iloc[0]
            cid = int(row["cand_id"])
            bs = max(2, int(row.get("block_size", 30)))
            lam = float(row.get("lam", 0.3))
            scores = []
            for sd in range(n_seeds):
                rng = np.random.default_rng(derive_seed(base_seed, gen, cid, sd))
                n_blocks = max(1, len(pool) - bs + 1)
                n_slots = int(np.ceil(n_samples / bs))
                starts = rng.integers(0, n_blocks, size=n_slots)
                rets = np.concatenate([pool[s : s + bs] for s in starts])[:n_samples].copy()
                # blend block boundaries (W12) with weight lam
                for b in range(1, n_slots):
                    i = b * bs
                    if i < len(rets):
                        rets[i] = (1 - lam) * rets[i] + lam * rets[i - 1]
                std = rets.std()
                ac1 = float(np.corrcoef(rets[:-1], rets[1:])[0, 1]) if std > 0 else 0.0
                s = (
                    w_std * abs(std / r_std - 1.0 if r_std > 0 else 1.0)
                    + w_ac1 * abs(ac1 - r_ac1)
                    + w_mean * abs(rets.mean() - r_mean)
                )
                scores.append(s)
            return pd.DataFrame({"cand_id": [cid], "score": [float(np.mean(scores))]})

        return (
            sdf.repartition(max(1, len(cands)), "cand_id")
            .groupBy("cand_id")
            .applyInPandas(eval_one, schema)
            .toPandas()
        )

    return fitness
