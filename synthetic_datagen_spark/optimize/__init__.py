"""GA / sweep / staged optimizers with Spark-parallel fitness fan-out
(SURVEY §2.11 M14-M16)."""

from .ga import Gene, GAOptimizer, moment_match_fitness
from .staged import Stage, StagedOptimizer
from .sweep import random_sweep

__all__ = [
    "Gene",
    "GAOptimizer",
    "moment_match_fitness",
    "Stage",
    "StagedOptimizer",
    "random_sweep",
]
