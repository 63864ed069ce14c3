"""Generator queries (SURVEY §2.10) — rows-only driver checks (the
generators are not SQL-expressible; their invariants are covered by
tests/test_generators.py: seed determinism under repartitioning,
chain continuity, moment fidelity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..generators import BlockBootstrapGenerator, GrasyndaGenerator
from ..sources import Catalog
from .base import register


def _train_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return ev.filter(F.col("event_type") == "click").select("ts", "event_id", "value")


@register(
    "g4_block_bootstrap",
    oracle=None,
    doc="G4 block bootstrap: windowed block indexing + hash-seeded block "
    "choice + log-space ratio chaining (no applyInPandas, no driver "
    "loop) — reference: block_bootstrap_generator.py:50-103.",
)
def g4_block_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen = BlockBootstrapGenerator(block_size=25).fit(
        _train_series(spark, sf_dir), "value", ["ts", "event_id"]
    )
    return gen.generate(spark, seed=42, n_samples=200, n_series=4)


@register(
    "g5_grasynda",
    oracle=None,
    doc="G5 Grasynda graph walk: DataFrame-built quantile states + "
    "transition matrix, per-series applyInPandas walk with "
    "splitmix64(seed, series_id) RNG — reference: "
    "grasynda_generator.py:53-149.",
)
def g5_grasynda(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen = GrasyndaGenerator(n_states=8).fit(
        _train_series(spark, sf_dir), "value", ["ts", "event_id"]
    )
    return gen.generate(spark, seed=42, n_samples=200, n_series=4)
