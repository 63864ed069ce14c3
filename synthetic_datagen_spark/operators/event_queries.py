"""Event-analytics queries over `events`: sessionization, funnel
conversion, cohort retention — the interactive-analytics triad every
OLAP engine ships next to its relational core (beyond-reference
surface, same spirit as the resample/pivot extras).

Parity notes: all time arithmetic runs on epoch MICROSECONDS (BIGINT,
exact in both engines — never float seconds); session/funnel orderings
carry event_id tiebreakers; cohort math is pure integer day offsets
from the corpus epoch, sidestepping engine week-truncation semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources import Catalog
from .base import register

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Catalog(spark, sf_dir).table("events")


@register(
    "event_sessionization",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
), g AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN ts_us - LAG(ts_us) OVER w > {_GAP_US}
              OR LAG(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS boundary
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), s AS (
  SELECT user_id, ts_us,
         SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         MAX(ts_us) - MIN(ts_us) AS dur_us
  FROM s GROUP BY user_id, session_id
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events,
       CAST(MAX(dur_us) AS BIGINT) AS max_session_dur_us
FROM per_session GROUP BY user_id ORDER BY user_id
""",
    doc="Batch sessionization: a new session starts after a 30-minute "
    "silence. Boundary flags via LAG, session ids via running SUM — "
    "both windows share one (user_id) partition spec, so the plan is "
    "a single hash-partition exchange followed by two hash aggs; no "
    "global sort, no SinglePartition. The batch twin of the streaming "
    "session-window parity query (streaming/stateful.py), on exact "
    "integer microseconds.",
)
def event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    boundary = F.when(
        (F.col("ts_us") - F.lag("ts_us").over(w) > _GAP_US)
        | F.lag("ts_us").over(w).isNull(),
        1,
    ).otherwise(0)
    s = e.withColumn("boundary", boundary).withColumn(
        "session_id",
        F.sum("boundary").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.max("n_events").cast("bigint").alias("max_session_events"),
            F.max("dur_us").cast("bigint").alias("max_session_dur_us"),
        )
        .orderBy("user_id")
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
), staged AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS first_view
  FROM e GROUP BY user_id
), clicks AS (
  SELECT e.user_id, MIN(e.ts_us) AS first_click
  FROM e JOIN staged s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts_us > s.first_view
  GROUP BY e.user_id
), purchases AS (
  SELECT e.user_id, MIN(e.ts_us) AS first_purchase
  FROM e JOIN clicks c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts_us > c.first_click
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM staged WHERE first_view IS NOT NULL) AS n_view,
       (SELECT COUNT(*) FROM clicks) AS n_view_click,
       (SELECT COUNT(*) FROM purchases) AS n_view_click_purchase,
       ROUND((SELECT COUNT(*) FROM clicks)
             / CAST((SELECT COUNT(*) FROM staged WHERE first_view IS NOT NULL) AS DOUBLE), 6)
         AS click_conversion,
       ROUND((SELECT COUNT(*) FROM purchases)
             / CAST(GREATEST((SELECT COUNT(*) FROM clicks), 1) AS DOUBLE), 6)
         AS purchase_conversion
""",
    doc="Ordered funnel view -> click -> purchase: each stage requires "
    "an event strictly after the user's previous-stage timestamp. "
    "Spark computes all three stage timestamps with conditional MINs "
    "over ONE user-partitioned window chain (single shuffle on "
    "user_id, no self-joins); the oracle spells the same semantics as "
    "staged joins, which pins the ordering logic from an independent "
    "direction. Output is the stage-count funnel with conversion "
    "rates.",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    wu = Window.partitionBy("user_id")
    fv = F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(wu)
    e2 = e.withColumn("first_view", fv)
    fc = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts_us") > F.col("first_view")),
            F.col("ts_us"),
        )
    ).over(wu)
    e3 = e2.withColumn("first_click", fc)
    fp = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts_us") > F.col("first_click")),
            F.col("ts_us"),
        )
    ).over(wu)
    per_user = (
        e3.withColumn("first_purchase", fp)
        .select("user_id", "first_view", "first_click", "first_purchase")
        .distinct()
    )
    return per_user.agg(
        F.count(F.col("first_view")).alias("n_view"),
        F.count(F.col("first_click")).alias("n_view_click"),
        F.count(F.col("first_purchase")).alias("n_view_click_purchase"),
        F.round(
            F.count(F.col("first_click")) / F.count(F.col("first_view")).cast("double"),
            6,
        ).alias("click_conversion"),
        F.round(
            F.count(F.col("first_purchase"))
            / F.greatest(F.count(F.col("first_click")), F.lit(1)).cast("double"),
            6,
        ).alias("purchase_conversion"),
    )


@register(
    "cohort_retention_weekly",
    oracle="""
WITH e AS (
  SELECT user_id,
         CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day_no
  FROM events
), first_day AS (
  SELECT user_id, MIN(day_no) AS day0 FROM e GROUP BY user_id
), cohorts AS (
  SELECT user_id, day0, CAST(FLOOR((day0 - 19723) / 7) AS BIGINT) AS cohort_week
  FROM first_day
), active AS (
  SELECT DISTINCT c.cohort_week, e.user_id,
         CAST(FLOOR((e.day_no - c.day0) / 7) AS BIGINT) AS week_offset
  FROM e JOIN cohorts c ON e.user_id = c.user_id
), sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM cohorts GROUP BY cohort_week
)
SELECT a.cohort_week, a.week_offset,
       COUNT(*) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       ROUND(COUNT(*) / CAST(s.cohort_size AS DOUBLE), 6) AS retention_frac
FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week
GROUP BY a.cohort_week, a.week_offset, s.cohort_size
ORDER BY a.cohort_week, a.week_offset
""",
    doc="Weekly cohort retention: cohort = integer week of a user's "
    "first event (day 19723 = 2024-01-01 anchors week 0), activity = "
    "distinct (user, week-offset) presence. All integer epoch-day "
    "arithmetic — engine week-truncation semantics (Monday vs Sunday "
    "starts) never enter. Plan: two hash aggs on user_id (first-day + "
    "activity dedup share the shuffle key) and a broadcast of the "
    "tiny cohort-size side.",
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select(
        "user_id",
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)).cast("bigint").alias("day_no"),
    )
    first_day = e.groupBy("user_id").agg(F.min("day_no").alias("day0"))
    cohorts = first_day.withColumn(
        "cohort_week", F.floor((F.col("day0") - 19723) / 7).cast("bigint")
    )
    active = (
        e.join(cohorts, "user_id")
        .select(
            "cohort_week",
            "user_id",
            F.floor((F.col("day_no") - F.col("day0")) / 7).cast("bigint").alias("week_offset"),
        )
        .distinct()
    )
    sizes = cohorts.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return (
        active.join(F.broadcast(sizes), "cohort_week")
        .groupBy("cohort_week", "week_offset", "cohort_size")
        .agg(F.count("*").alias("n_active"))
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 6
            ).alias("retention_frac"),
        )
        .orderBy("cohort_week", "week_offset")
    )
