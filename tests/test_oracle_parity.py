"""Differential tests: every registered query with an oracle must match
DuckDB exactly at sf0.001 (the full sf0.01 gate runs via
tools/check_oracle.py and the driver)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from synthetic_datagen_spark.operators import REGISTRY
from tools.check_oracle import compare, duck_con

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, con):
    spec = REGISTRY[name]
    spark_pd = spec.build(spark, SF_DIR).toPandas()
    if spec.oracle is None:
        assert len(spark_pd) >= 0  # rows-only: builder runs
        return
    if spec.pinned_sf is not None and not SF_DIR.endswith("sf" + spec.pinned_sf):
        # pinned-value oracle: the literals were captured at another sf
        # (the driver's sf0.01 gate checks them); here just run the
        # builder like a rows-only query
        assert len(spark_pd) >= 0
        return
    duck_pd = con.execute(spec.oracle).df()
    errs = compare(name, spark_pd, duck_pd)
    assert not errs, f"{name}: {errs}"
