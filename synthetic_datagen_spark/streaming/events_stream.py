"""Structured Streaming variants of the batch operators (SURVEY §2.13).

The reference is 100 % batch; these are the engine's extension surface
for the events stream: watermarked tumbling rollups (the streaming form
of `hourly_rollup`), keep-first dedup within the watermark (streaming
P3), and session windows per user.

Design: identical column logic to the batch operators — the same
expressions compose over a `readStream` source, so batch/stream parity
is by construction. State size is bounded by the watermark; shuffle
keys match the batch plans (window start × type, user_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import EVENTS


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events rows (parquet dir). In production the
    same plan hangs off Kafka — only this reader changes."""
    r = spark.readStream.schema(EVENTS)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def stream_hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming hypertable rollup: tumbling 1 h windows per event_type,
    late rows admitted within the watermark. Partial aggregation happens
    pre-shuffle exactly as in the batch `hourly_rollup`."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.avg("value").alias("avg_value"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "avg_value",
            "sum_value",
        )
    )


def stream_dedup_keep_first(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming P3 keep-first dedup on event_id — state expires with the
    watermark, so memory stays bounded on an infinite stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_session_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based) with event counts and value
    sums — the sessionization operator the batch surface lacks."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
