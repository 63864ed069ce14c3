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
    resume_file: str | None = None  # per-generation checkpoint JSON
    meta_log: str | None = None     # append-only CSV of every evaluation
    stage_num: int = 0              # stage column in the meta-log
    fitness_tag: str | None = None  # caller-supplied fitness/data identity

    # ------------------------------------------------------- durability --
    # The search trajectory is a pure function of (genes, seed, data):
    # the init rng, each generation's breeding rng, and every fitness
    # evaluation seed derive from (seed, gen), never from a continuous
    # stream. A checkpoint at any generation boundary therefore resumes
    # BIT-IDENTICALLY — the reference persists the same way
    # (ga_optimizer.py:580-589 _save_resume/_load_resume; meta-log CSV
    # header + per-individual rows, :220-228,:430-439).

    def _config_fp(self) -> str:
        """Fingerprint of the GA parameters that shape the search
        trajectory, plus the caller's optional ``fitness_tag``. Stored in
        each checkpoint; a resume file whose fingerprint does not match
        the current configuration is REJECTED — silently returning a
        previous run's done-state from a different gene space / seed
        would be a wrong optimum with no error.

        The fitness *callable itself is NOT fingerprinted* (there is no
        reliable hash of a closure plus the data it captures). Callers
        whose fitness or underlying data can change between runs should
        pass ``fitness_tag`` — e.g.
        ``json.dumps([predictor_cfg, data_fingerprint])`` — so a resumed
        run with a changed objective is rejected rather than silently
        continuing toward the wrong optimum."""
        import hashlib
        import json

        payload = {
            "genes": [(g.name, g.lo, g.hi, g.kind) for g in self.genes],
            "pop_size": self.pop_size,
            "n_gens": self.n_gens,
            "seed": self.seed,
            "tourn": self.tourn,
            "cx_prob": self.cx_prob,
            "mut_prob": self.mut_prob,
            "mut_sigma": self.mut_sigma,
            "elite": self.elite,
            "patience": self.patience,
            "stage_num": self.stage_num,
            "fitness_tag": self.fitness_tag,
        }
        return hashlib.md5(
            json.dumps(payload, sort_keys=True).encode()
        ).hexdigest()[:16]

    def _save_state(self, state: dict) -> None:
        if not self.resume_file:
            return
        import json
        import os

        state = {"config_fp": self._config_fp(), **state}
        os.makedirs(os.path.dirname(self.resume_file) or ".", exist_ok=True)
        tmp = self.resume_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=2)
        os.replace(tmp, self.resume_file)  # atomic: never a torn JSON

    def _load_state(self) -> dict | None:
        if not self.resume_file:
            return None
        import json
        import os

        if not os.path.exists(self.resume_file):
            return None
        with open(self.resume_file) as f:
            state = json.load(f)
        if state.get("config_fp") != self._config_fp():
            detail = (
                "predates fingerprinting"
                if "config_fp" not in state
                else "was written by a GA with a different configuration "
                "(genes/seed/pop_size/fitness_tag/…)"
            )
            raise RuntimeError(
                f"resume file {self.resume_file} {detail}; delete it to "
                "start fresh"
            )
        return state

    def _meta_append(self, gen: int, pop: list[dict], scores: np.ndarray) -> None:
        """Reference meta-training log: one CSV row per individual per
        generation — `stage,generation,individual,<sorted genes>,fitness`
        (ga_optimizer.py:228,438)."""
        if not self.meta_log:
            return
        import os

        names = sorted(g.name for g in self.genes)
        write_header = not os.path.exists(self.meta_log)
        os.makedirs(os.path.dirname(self.meta_log) or ".", exist_ok=True)
        with open(self.meta_log, "a") as f:
            if write_header:
                f.write("stage,generation,individual," + ",".join(names) + ",fitness\n")
            for idx, (cand, sc) in enumerate(zip(pop, scores)):
                vals = ",".join(str(cand.get(k, "")) for k in names)
                f.write(f"{self.stage_num},{gen},{idx},{vals},{float(sc)}\n")
            f.flush()

    def _meta_truncate(self, start_gen: int) -> None:
        """On resume, drop this stage's meta rows for generations that
        will re-run: a crash in the window between _meta_append(gen) and
        _save_state(next_gen=gen+1) leaves gen's rows logged but the
        checkpoint pointing at gen — without this, the re-evaluated
        generation would append a duplicate block."""
        import os

        if not self.meta_log or not os.path.exists(self.meta_log):
            return
        with open(self.meta_log) as f:
            lines = f.readlines()
        keep = []
        for ln in lines:
            parts = ln.split(",", 2)
            if (
                len(parts) >= 2
                and parts[0] == str(self.stage_num)
                and parts[1].isdigit()
                and int(parts[1]) >= start_gen
            ):
                continue
            keep.append(ln)
        if len(keep) != len(lines):
            tmp = self.meta_log + ".tmp"
            with open(tmp, "w") as f:
                f.writelines(keep)
            os.replace(tmp, self.meta_log)

    # ------------------------------------------------------------------
    def optimize(self, spark: SparkSession, init_pop: list[dict] | None = None) -> dict:
        """Run the GA; returns {best, score, history, pop, scores} —
        final population + scores so a stage loop (M15) can carry elites
        into its next stage. ``init_pop`` seeds the population (padded
        with random samples / truncated to pop_size).

        With ``resume_file`` set, a checkpoint is written after every
        generation; a killed run re-invoked with the same arguments
        skips completed generations and finishes bit-identically to an
        uninterrupted run (pinned in tests/test_optimize.py)."""
        state = self._load_state()
        if state is not None and state.get("done"):
            return {
                "best": state["best"],
                "score": state["best_score"],
                "history": state["history"],
                "pop": state["pop"],
                "scores": np.array(state["scores"]),
            }
        if state is not None:
            pop = state["pop"]
            best = state["best"]
            best_score = state["best_score"]
            stale = state["stale"]
            self.history = list(state["history"])
            scores = np.array(state["scores"])
            start_gen = state["next_gen"]
            self._meta_truncate(start_gen)
        else:
            rng = np.random.default_rng(derive_seed(self.seed, 0x6A))
            pop = [dict(c) for c in (init_pop or [])][: self.pop_size]
            pop = [
                {g.name: g.clip(c.get(g.name, g.sample(rng))) for g in self.genes}
                for c in pop
            ]
            while len(pop) < self.pop_size:
                pop.append({g.name: g.sample(rng) for g in self.genes})
            best = None
            best_score = float("inf")
            stale = 0
            scores = np.array([])
            start_gen = 0
        stopped = False
        for gen in range(start_gen, self.n_gens):
            scores = self._evaluate(spark, pop, gen)
            self._meta_append(gen, pop, scores)
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
                    stopped = True
            if not stopped and gen < self.n_gens - 1:
                pop = self._next_gen(
                    pop, scores, np.random.default_rng(derive_seed(self.seed, gen + 1))
                )
            self._save_state(
                {
                    "next_gen": gen + 1,
                    "pop": pop,
                    "scores": [float(s) for s in scores],
                    "best": best,
                    "best_score": best_score,
                    "stale": stale,
                    "history": self.history,
                    "done": stopped or gen == self.n_gens - 1,
                }
            )
            if stopped:
                break
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
