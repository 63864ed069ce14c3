"""Property tests for the time-series function library — mirrors the
reference's unit-test invariants (SURVEY §5.1):
  - returns↔prices round-trip (reference: tests/test_data_processor.py:19-23)
  - sliding-window shape identities (:26-31)
  - chronological split proportions (timegan_generator.py:103-109)
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from synthetic_datagen_spark.functions import timeseries as TS
from synthetic_datagen_spark.sources import Catalog


def _events(spark, sf_smoke):
    return Catalog(spark, sf_smoke).table("events")


def test_returns_price_roundtrip(spark, sf_smoke):
    ev = _events(spark, sf_smoke)
    w = TS.series_window(["event_type"], ["ts", "event_id"])
    d = TS.log_returns(ev, "value", ["event_type"], ["ts", "event_id"])
    d = d.withColumn("p0", F.first("value").over(w))
    d = TS.reconstruct_prices(d, "log_ret", "p0", ["event_type"], ["ts", "event_id"])
    bad = d.filter(F.abs(F.col("price") - F.col("value")) > 1e-9 * F.col("value")).count()
    assert bad == 0


def test_sliding_window_shape(spark, sf_smoke):
    ev = _events(spark, sf_smoke)
    n = ev.filter(F.col("event_type") == "click").count()
    wdf = TS.sliding_windows(
        ev.filter(F.col("event_type") == "click"),
        "value", 16, ["event_type"], ["ts", "event_id"],
    )
    rows = wdf.count()
    assert rows == n - 16 + 1  # (N - W + 1) windows, all full-length
    sizes = wdf.select(F.size("window_vec").alias("s")).distinct().collect()
    assert [r["s"] for r in sizes] == [16]


def test_supervised_windows_alignment(spark, sf_smoke):
    ev = _events(spark, sf_smoke).filter(F.col("event_type") == "view")
    d = TS.supervised_windows(ev, "value", 8, 3, ["event_type"], ["ts", "event_id"])
    # y must equal the value 3 rows after the window end: check via self-join
    w = TS.series_window(["event_type"], ["ts", "event_id"])
    chk = d.withColumn("expect_y", F.lead("value", 3).over(w))
    bad = chk.filter(F.col("y") != F.col("expect_y")).count()
    assert bad == 0
    assert d.filter(F.col("y").isNull()).count() == 0


def test_chrono_split_fractions(spark, sf_smoke):
    ev = _events(spark, sf_smoke)
    train, val = TS.chrono_split(ev, 0.85, ["event_type"], ["ts", "event_id"])
    n, nt = ev.count(), train.count()
    assert nt + val.count() == n
    assert math.isclose(nt / n, 0.85, abs_tol=0.02)


def test_rolling_std_min_periods(spark, sf_smoke):
    ev = _events(spark, sf_smoke)
    d = TS.rolling_std(ev, "value", 10, ["event_type"], ["ts", "event_id"], min_periods=10)
    # first 9 rows of each series must be NULL
    w = TS.series_window(["event_type"], ["ts", "event_id"])
    d = d.withColumn("rn", F.row_number().over(w))
    assert d.filter((F.col("rn") < 10) & F.col("roll_std").isNotNull()).count() == 0
    assert d.filter((F.col("rn") >= 10) & F.col("roll_std").isNull()).count() == 0
