"""synthetic_datagen_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of harveybc/synthetic-datagen.

Architecture (Spark-first, not a port):
  - ``session``    : SparkSession factory with scale-oriented defaults.
  - ``schemas``    : explicit StructTypes for every table (no inferSchema).
  - ``sources``    : readers/writers (parquet/csv/json) + the testdata catalog.
  - ``functions``  : column-expression building blocks (time-series windows,
                     moments, distribution distances, text analysis, vectors).
  - ``operators``  : the named query catalog — each entry is a DataFrame
                     builder plus a DuckDB-runnable ANSI-SQL oracle.
  - ``generators`` : seed-deterministic synthetic-series generators.
  - ``streaming``  : Structured Streaming variants of the batch operators.
"""

__version__ = "0.1.0"
