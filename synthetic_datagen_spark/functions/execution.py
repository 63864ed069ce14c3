"""Scale-adaptive execution-conf scopes (optimization round r13).

Under AQE every materialized exchange becomes its own driver sub-job,
so a chain that materializes a handful of shuffles over a TINY frame
(a contracted CC edge set, a below-cutoff LSH candidate scaffold) pays
the per-job scheduling floor many times over while AQE's re-planning
has nothing to improve — the frames are orders of magnitude below any
advisory partition size. When a *measured* input size sits below an
explicit threshold, run the scope with AQE off and a small static
shuffle width: same plans, same results (every caller's kernel is
layout-independent by construction — min-aggregations, per-row folds,
exact rescores — and the callers' outputs are value/oracle-pinned),
one job per materialization instead of one per exchange.

A big input leaves every conf untouched, so cluster runs keep AQE's
skew/coalesce handling where it matters. This is the cluster behavior
(coalesce tiny shuffles) minus the per-stage job overhead, not a
local[32] constant: the thresholds are data-size cutoffs (env-tunable),
not core counts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


class narrow_build_confs:
    """Context manager: AQE off + static narrow shuffle width while the
    measured unit count is at or below ``threshold``; no-op otherwise.
    Restores the caller's confs on exit."""

    def __init__(
        self,
        spark: SparkSession,
        n_units: int,
        threshold: int,
        parts_env: str = "SPARK_GRAFT_TINY_PARTS",
        default_parts: str = "8",
    ):
        self.spark = spark
        self.apply = n_units <= threshold
        self.parts = os.environ.get(parts_env, default_parts)
        self.saved: dict[str, str] = {}

    def __enter__(self):
        if self.apply:
            conf = self.spark.conf
            for k, v in (
                ("spark.sql.adaptive.enabled", "false"),
                ("spark.sql.shuffle.partitions", self.parts),
            ):
                self.saved[k] = conf.get(k)
                conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            self.spark.conf.set(k, v)
        return False
