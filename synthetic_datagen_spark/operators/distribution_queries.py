"""Distribution-distance queries (SURVEY §2.9) — the reference's
evaluator surface, run here between two event-type populations (the
union-with-tag two-sample form).

All relational: histograms join on bin, ECDFs are windowed running
counts, Hurst is a grouped R/S plan — nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import distances as D
from ..sources import Catalog
from .base import register

_A, _B = "purchase", "click"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Catalog(spark, sf_dir).table("events")


@register(
    "d1_js_divergence",
    oracle=f"""
WITH counts AS (
  SELECT LEAST(CAST(FLOOR(value / 5.0) AS BIGINT), 99) AS bin,
         SUM(CASE WHEN event_type = '{_A}' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN event_type = '{_B}' THEN 1 ELSE 0 END) AS cb
  FROM events
  WHERE event_type IN ('{_A}', '{_B}') AND value BETWEEN 0.0 AND 500.0
  GROUP BY 1
), tot AS (SELECT SUM(ca) AS ta, SUM(cb) AS tb FROM counts)
SELECT ROUND(SUM(
         0.5 * (ca / ta + 1e-10) * LN((ca / ta + 1e-10) / ((ca / ta + cb / tb) / 2 + 1e-10))
       + 0.5 * (cb / tb + 1e-10) * LN((cb / tb + 1e-10) / ((ca / ta + cb / tb) / 2 + 1e-10))
       ), 6) AS js_div
FROM counts, tot
""",
    doc="D1 Jensen-Shannon divergence over shared-range 100-bin "
    "histograms (reference: distribution_evaluator.py:27-36; the "
    "reference mislabels JS² as 'kl_divergence' — we compute true JS).",
)
def d1_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = D.js_divergence(_events(spark, sf_dir), "value", "event_type", _A, _B, 0.0, 500.0)
    return r.select(F.round("js_div", 6).alias("js_div"))


@register(
    "d2_wasserstein",
    oracle=f"""
WITH counts AS (
  SELECT value AS v,
         SUM(CASE WHEN event_type = '{_A}' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN event_type = '{_B}' THEN 1 ELSE 0 END) AS cb
  FROM events WHERE event_type IN ('{_A}', '{_B}')
  GROUP BY value
), tot AS (SELECT SUM(ca) AS ta, SUM(cb) AS tb FROM counts),
ecdf AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / ta AS fa,
         SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / tb AS fb
  FROM counts, tot
), gaps AS (
  SELECT (LEAD(v) OVER (ORDER BY v) - v) * ABS(fa - fb) AS g FROM ecdf
)
SELECT ROUND(SUM(g), 6) AS w1 FROM gaps
""",
    doc="D2 exact 1-D Wasserstein-1 = ∫|Fa-Fb|dx via windowed ECDFs "
    "(reference: distribution_evaluator.py:39-40, scipy parity).",
)
def d2_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = D.wasserstein_1d(_events(spark, sf_dir), "value", "event_type", _A, _B)
    return r.select(F.round("w1", 6).alias("w1"))


@register(
    "d3_ks_statistic",
    oracle=f"""
WITH counts AS (
  SELECT value AS v,
         SUM(CASE WHEN event_type = '{_A}' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN event_type = '{_B}' THEN 1 ELSE 0 END) AS cb
  FROM events WHERE event_type IN ('{_A}', '{_B}')
  GROUP BY value
), tot AS (SELECT SUM(ca) AS ta, SUM(cb) AS tb FROM counts),
ecdf AS (
  SELECT SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / ta AS fa,
         SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / tb AS fb
  FROM counts, tot
)
SELECT ROUND(MAX(ABS(fa - fb)), 6) AS ks_stat FROM ecdf
""",
    doc="D3 two-sample KS statistic sup|Fa-Fb| "
    "(reference: composite_metric.py:103, scipy ks_2samp parity).",
)
def d3_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = D.ks_statistic(_events(spark, sf_dir), "value", "event_type", _A, _B)
    return r.select(F.round("ks_stat", 6).alias("ks_stat"))


@register(
    "d6_hurst_exponent",
    oracle="""
WITH idx AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS i
  FROM events
), d AS (
  SELECT event_type, i - 1 AS i,
         value - LAG(value) OVER (PARTITION BY event_type ORDER BY i) AS dv
  FROM idx
), dd AS (
  SELECT event_type, i, dv FROM d WHERE dv IS NOT NULL
), e AS (
  SELECT event_type, i, dv, lag, CAST(FLOOR(i / lag) AS BIGINT) AS seg
  FROM dd CROSS JOIN (SELECT UNNEST(generate_series(2, 100)) AS lag) l
), centered AS (
  SELECT event_type, lag, seg, i, dv,
         dv - AVG(dv) OVER (PARTITION BY event_type, lag, seg) AS cd
  FROM e
), cum AS (
  SELECT event_type, lag, seg, i, dv,
         SUM(cd) OVER (PARTITION BY event_type, lag, seg ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM centered
), seg_stats AS (
  SELECT event_type, lag, seg,
         MAX(c) - MIN(c) AS R,
         STDDEV_POP(dv) AS S,
         COUNT(*) AS m
  FROM cum
  GROUP BY event_type, lag, seg
  HAVING COUNT(*) = lag AND STDDEV_POP(dv) > 1e-10
), per_lag AS (
  SELECT event_type, lag, AVG(R / S) AS rs
  FROM seg_stats GROUP BY event_type, lag
  HAVING AVG(R / S) > 0
), ll AS (
  SELECT event_type, LN(lag) AS lx, LN(rs) AS ly FROM per_lag
)
SELECT event_type,
       ROUND(LEAST(GREATEST(CORR(lx, ly) * STDDEV_SAMP(ly) / STDDEV_SAMP(lx), 0.0), 1.0), 6) AS hurst
FROM ll GROUP BY event_type
""",
    doc="D6 Hurst exponent via grouped rescaled-range analysis, lags "
    "2..100, least-squares slope in log-log space, clipped to [0,1] "
    "(reference: composite_metric.py:25-47) — fully relational, four "
    "shuffles on (series, lag) keys, no driver loop.",
)
def d6_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = D.hurst_rs(_events(spark, sf_dir), "value", ["event_type"], ["ts", "event_id"])
    return h.select("event_type", F.round("hurst", 6).alias("hurst"))


@register(
    "d7_moment_ratio_panel",
    oracle=f"""
WITH r AS (
  SELECT event_type,
         LN(GREATEST(value, 1e-10))
           - LAG(LN(GREATEST(value, 1e-10))) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS lr
  FROM events WHERE event_type IN ('{_A}', '{_B}')
), s AS (
  SELECT event_type, AVG(lr) AS mean_r, STDDEV_POP(lr) AS std_r,
         MIN(lr) AS min_r, MAX(lr) AS max_r
  FROM r WHERE lr IS NOT NULL GROUP BY event_type
)
SELECT ROUND(a.std_r / b.std_r, 6) AS std_ratio,
       ROUND(CASE WHEN ABS(b.mean_r) > 1e-10 THEN a.mean_r / b.mean_r ELSE 0.0 END, 6) AS mean_ratio,
       ROUND((a.max_r - a.min_r) / (b.max_r - b.min_r), 6) AS range_ratio
FROM (SELECT * FROM s WHERE event_type = '{_A}') a,
     (SELECT * FROM s WHERE event_type = '{_B}') b
""",
    doc="D7 moment-ratio panel between two series with ÷0 guards "
    "(reference: evaluate_all_generators.py:115-171) — two stat rows "
    "joined, pure arithmetic.",
)
def d7_moment_ratio_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import timeseries as TS

    ev = _events(spark, sf_dir).filter(F.col("event_type").isin(_A, _B))
    d = TS.log_returns(ev, "value", ["event_type"], ["ts", "event_id"], out_col="lr")
    s = (
        d.filter(F.col("lr").isNotNull())
        .groupBy("event_type")
        .agg(
            F.avg("lr").alias("mean_r"),
            F.stddev_pop("lr").alias("std_r"),
            F.min("lr").alias("min_r"),
            F.max("lr").alias("max_r"),
        )
    )
    a = s.filter(F.col("event_type") == _A).alias("a")
    b = s.filter(F.col("event_type") == _B).alias("b")
    return a.crossJoin(b).select(
        F.round(F.col("a.std_r") / F.col("b.std_r"), 6).alias("std_ratio"),
        F.round(
            F.when(
                F.abs(F.col("b.mean_r")) > 1e-10, F.col("a.mean_r") / F.col("b.mean_r")
            ).otherwise(0.0),
            6,
        ).alias("mean_ratio"),
        F.round(
            (F.col("a.max_r") - F.col("a.min_r")) / (F.col("b.max_r") - F.col("b.min_r")), 6
        ).alias("range_ratio"),
    )
