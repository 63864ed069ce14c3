"""Streaming-operator tests: batch/stream parity on a bounded file
source (availableNow trigger → memory sink)."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest

from pyspark.sql import functions as F

from synthetic_datagen_spark.sources import Catalog
from synthetic_datagen_spark.streaming import (
    read_events_stream,
    stream_dedup_keep_first,
    stream_hourly_rollup,
    stream_session_stats,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke):
    """Re-materialize events as µs-timestamp parquet for the file source."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    ev = Catalog(spark, sf_smoke).table("events")
    ev.write.mode("overwrite").parquet(d + "/once")
    # two appends of the same rows → duplicate event_ids for dedup test
    ev.write.mode("append").parquet(d + "/twice")
    ev.write.mode("append").parquet(d + "/twice")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(stream_df, mode: str = "append"):
    name = "t" + uuid.uuid4().hex[:8]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def test_stream_hourly_rollup_matches_batch(spark, events_dir, sf_smoke):
    src = read_events_stream(spark, events_dir + "/once")
    name = _run(stream_hourly_rollup(src, watermark="0 seconds"), mode="append")
    got = {
        (r.hour_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in spark.sql(f"select * from {name}").collect()
    }
    ev = Catalog(spark, sf_smoke).table("events")
    exp = {
        (r.h, r.event_type): (r.n, round(r.s, 6))
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    # append mode emits only windows the watermark has closed; with a
    # bounded source + 0s watermark everything but the last hour closes
    assert got
    for k, v in got.items():
        assert exp[k] == v
    missing = set(exp) - set(got)
    last_hour = max(h for h, _ in exp)
    assert all(h == last_hour for h, _ in missing)


def test_stream_dedup(spark, events_dir, sf_smoke):
    src = read_events_stream(spark, events_dir + "/twice")
    name = _run(stream_dedup_keep_first(src, watermark="365 days"))
    n = spark.sql(f"select count(*) as n from {name}").first().n
    expected = Catalog(spark, sf_smoke).table("events").count()
    assert n == expected  # duplicates dropped across files


def test_stream_session_stats(spark, events_dir):
    src = read_events_stream(spark, events_dir + "/once")
    name = _run(stream_session_stats(src, gap="10 minutes", watermark="0 seconds"))
    rows = spark.sql(f"select * from {name}").collect()
    assert rows
    for r in rows:
        assert r.session_end > r.session_start
        assert r.n_events >= 1
