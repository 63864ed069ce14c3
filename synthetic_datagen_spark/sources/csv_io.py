"""S1-S3 — CSV source/sink with schema validation
(reference: app/data_processor.py:19-39).

S1 load_csv: explicit schema (never inferSchema at scale), timestamp
parse, P2 schema predicate (required columns present — reference raises
on missing typical_price, data_processor.py:22-23).
S2 load_multiple_csv: multi-path scan → sort → keep-first dedup.
S3 save_csv: header, no index column. ``single_file`` coalesces to one
part for reference-compatible output; leave False at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F, types as T

TYPICAL_PRICE = T.StructType(
    [
        T.StructField("DATE_TIME", T.TimestampType()),
        T.StructField("typical_price", T.DoubleType()),
    ]
)


class SchemaError(ValueError):
    pass


def load_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType = TYPICAL_PRICE,
    required: list[str] | None = None,
) -> DataFrame:
    """S1 — header CSV with explicit schema + required-column check."""
    df = spark.read.schema(schema).option("header", True).csv(path)
    for col in required or [f.name for f in schema.fields]:
        if col not in df.columns:
            raise SchemaError(f"required column {col!r} missing from {path}")
    return df


def load_multiple_csv(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType = TYPICAL_PRICE,
    ts_col: str = "DATE_TIME",
) -> DataFrame:
    """S2 — union of several CSVs, time-ordered, duplicate timestamps
    dropped keep-first (first path wins, like pandas concat order).

    keep-first is made deterministic with a source-rank column: the
    reference's `~duplicated(keep='first')` depends on concat order, so
    rank-by-path reproduces it exactly under any partitioning.
    """
    parts = []
    for rank, p in enumerate(paths):
        parts.append(load_csv(spark, p, schema).withColumn("_src", F.lit(rank)))
    df = parts[0]
    for d in parts[1:]:
        df = df.unionByName(d)
    w = F.row_number().over(Window.partitionBy(ts_col).orderBy("_src"))
    return (
        df.withColumn("_rn", w)
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
        .orderBy(ts_col)
    )


def save_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S3 — header CSV sink; optionally a single part file."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)
