"""M15 — elite staged optimizer with gene freezing over the M14 GA
(reference: examples/scripts/optimize_staged.py:55-383 — a sequence of
stages, each a GA run with its own population size, generation budget,
SHRINKING mutation scale, elite carry-over, and stage-specific fitness
weights; later stages refine around the global best while early-decided
genes effectively freeze).

Spark shape: the stage loop is driver control flow; every generation of
every stage is still ONE grouped-map fitness job (M14's fan-out), so
the cluster sees a steady stream of embarrassingly-parallel stages.

Freezing: a stage may pin genes (`freeze=("block_size",)`) to the
current global best — implemented by collapsing the gene's bounds to
that value, so sampling, crossover, and mutation all respect the freeze
without special-casing the GA (the reference's midpoint-freeze protocol
where settled parameters stop moving in later stages).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import numpy as np

from pyspark.sql import SparkSession

from ..generators.seeds import derive_seed
from .ga import FitnessFn, GAOptimizer, Gene


@dataclass(frozen=True)
class Stage:
    name: str
    pop_size: int = 12
    n_gens: int = 4
    mut_sigma: float = 0.15     # fraction of gene range (shrinks per stage)
    elite_keep: int = 3
    tourn: int = 3
    freeze: tuple[str, ...] = ()
    weights: dict | None = None  # stage-specific fitness weights


@dataclass
class StagedOptimizer:
    genes: list[Gene]
    fitness_factory: Callable[[dict | None], FitnessFn]
    stages: list[Stage]
    seed: int = 42
    stage_results: list[dict] = field(default_factory=list)
    resume_file: str | None = None  # stage-level resume JSON (reference layout)
    meta_log: str | None = None     # shared meta-training CSV across stages

    def optimize(self, spark: SparkSession) -> dict:
        """Run all stages; returns {best, score, stages: [per-stage
        summaries]}. The global best is monotone non-increasing.

        With ``resume_file`` set, stage completion persists the
        reference's resume layout (`best_params` / `best_fitness` /
        `completed_stages`, ga_optimizer.py:284-289 + carry-elites so
        the next stage seeds identically) and each stage's GA
        checkpoints per generation to `<resume_file>.stage<i>` — a
        killed run resumes mid-stage, bit-identically."""
        import hashlib
        import json
        import os

        # every input shaping the trajectory; a stale resume file from a
        # different configuration must never short-circuit with a wrong
        # optimum (same contract as GAOptimizer._load_state)
        config_fp = hashlib.md5(
            json.dumps(
                {
                    "genes": [(g.name, g.lo, g.hi, g.kind) for g in self.genes],
                    "stages": [
                        (
                            st.name, st.pop_size, st.n_gens, st.mut_sigma,
                            st.elite_keep, st.tourn, sorted(st.freeze),
                            st.weights,
                        )
                        for st in self.stages
                    ],
                    "seed": self.seed,
                },
                sort_keys=True,
            ).encode()
        ).hexdigest()[:16]

        global_best: dict | None = None
        global_score = float("inf")
        carry: list[dict] = []
        start_stage = 0
        if self.resume_file and os.path.exists(self.resume_file):
            with open(self.resume_file) as f:
                state = json.load(f)
            if state.get("config_fp") != config_fp:
                raise RuntimeError(
                    f"resume file {self.resume_file} was written by a staged "
                    "run with a different configuration (genes/stages/seed); "
                    "delete it (and its .stage<i> siblings) to start fresh"
                )
            global_best = state.get("best_params")
            global_score = state.get("best_fitness", float("inf"))
            carry = state.get("carry", [])
            self.stage_results = state.get("stage_results", [])
            start_stage = state.get("completed_stages", 0)
        for si, st in enumerate(self.stages):
            if si < start_stage:
                continue
            frozen = {
                name: global_best[name]
                for name in st.freeze
                if global_best is not None and name in global_best
            }
            stage_genes = [
                Gene(g.name, frozen[g.name], frozen[g.name], g.kind)
                if g.name in frozen
                else g
                for g in self.genes
            ]
            # init: elites from the previous stage + mutations of the
            # global best at this stage's (smaller) mutation scale
            rng = np.random.default_rng(derive_seed(self.seed, 0x515, si))
            init = [dict(c) for c in carry[: st.elite_keep]]
            if global_best is not None:
                while len(init) < st.pop_size // 2:
                    child = dict(global_best)
                    for g in stage_genes:
                        span = g.hi - g.lo
                        if span > 0:
                            child[g.name] = g.clip(
                                child[g.name] + rng.normal(0.0, st.mut_sigma * span)
                            )
                    init.append(child)
            ga = GAOptimizer(
                genes=stage_genes,
                fitness=self.fitness_factory(st.weights),
                pop_size=st.pop_size,
                n_gens=st.n_gens,
                seed=derive_seed(self.seed, si),
                tourn=st.tourn,
                mut_sigma=st.mut_sigma,
                elite=st.elite_keep,
                resume_file=(
                    f"{self.resume_file}.stage{si}" if self.resume_file else None
                ),
                meta_log=self.meta_log,
                stage_num=si,
            )
            res = ga.optimize(spark, init_pop=init)
            n_evals = st.pop_size * len(res["history"])
            # re-score the stage best under DEFAULT weights so stages
            # compare on one objective (the reference re-evaluates its
            # stage winners on the balanced score before promoting)
            if st.weights is not None and res["best"] is not None:
                import pandas as pd

                neutral = self.fitness_factory(None)
                scored = neutral(
                    spark, pd.DataFrame([{"cand_id": 0, **res["best"]}]), 10_000 + si
                )
                promote_score = float(scored.set_index("cand_id")["score"].iloc[0])
            else:
                promote_score = res["score"]
            if res["best"] is not None and promote_score < global_score:
                global_score = promote_score
                global_best = dict(res["best"])
            order = np.argsort(res["scores"]) if len(res["scores"]) else []
            carry = [dict(res["pop"][i]) for i in order[: st.elite_keep]]
            self.stage_results.append(
                {
                    "stage": si,
                    "name": st.name,
                    "stage_best": res["score"],
                    "global_best": global_score,
                    "n_evals": n_evals,
                    "frozen": ",".join(sorted(frozen)) or "",
                }
            )
            if self.resume_file:
                tmp = self.resume_file + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(
                        {
                            "config_fp": config_fp,
                            "best_params": global_best,
                            "best_fitness": global_score,
                            "completed_stages": si + 1,
                            "carry": carry,
                            "stage_results": self.stage_results,
                        },
                        f,
                        indent=2,
                    )
                os.replace(tmp, self.resume_file)
        return {
            "best": global_best,
            "score": global_score,
            "stages": self.stage_results,
        }
