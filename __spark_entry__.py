"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``synthetic_datagen_spark.operators`` — this
module only adapts the registry to the driver's calling convention.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from synthetic_datagen_spark.operators import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return REGISTRY["flagship_series_panel"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # events.parquet timestamps vary by writer: ns needs
            # nanosAsLong; tz-less us would read as TIMESTAMP_NTZ under
            # PySpark 4 unless inferTimestampNTZ is off (the catalog also
            # rebases NTZ → LTZ defensively). TZ pins hour-extraction
            # parity with DuckDB's naive timestamps.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return spec.build(spark, sf_dir)

        return run

    return {name: _wrap(spec) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
