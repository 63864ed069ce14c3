"""Time-series window queries over the `events` table (SURVEY §2.5).

`events` plays the reference's typical_price role with event_type as the
series key — so every window is partitioned (series-parallel), which is
exactly the discipline that survives 100 TB: the global-order windows of
the reference's single series become per-series windows here.

Parity notes: running window sums/maxes evaluate left-to-right in frame
order on both engines → bit-identical; `ln`/`exp` may differ in the last
ulp between libms → rounded to 6 dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import timeseries as TS
from ..sources import Catalog
from .base import register

_SERIES = ["event_type"]
_ORDER = ["ts", "event_id"]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Catalog(spark, sf_dir).table("events")


@register(
    "w1_log_returns",
    oracle="""
WITH r AS (
  SELECT event_id, event_type,
         LN(GREATEST(value, 1e-10))
           - LAG(LN(GREATEST(value, 1e-10))) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS log_ret
  FROM events
)
SELECT event_id, event_type, ROUND(log_ret, 6) AS log_ret
FROM r WHERE log_ret IS NOT NULL
""",
    doc="W1 log-returns per series (reference: app/data_processor.py:44-47) "
    "with the P5 clip-before-log guard (regime_hmm_garch.py:67).",
)
def w1_log_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = TS.log_returns(_events(spark, sf_dir), "value", _SERIES, _ORDER)
    return d.filter(F.col("log_ret").isNotNull()).select(
        "event_id", "event_type", F.round("log_ret", 6).alias("log_ret")
    )


@register(
    "w2_price_reconstruction",
    oracle="""
WITH r AS (
  SELECT event_id, event_type, ts,
         LN(GREATEST(value, 1e-10))
           - LAG(LN(GREATEST(value, 1e-10))) OVER w AS log_ret,
         FIRST_VALUE(value) OVER w AS p0
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_id, event_type,
       ROUND(EXP(SUM(COALESCE(log_ret, 0.0)) OVER (
                 PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             + LN(p0)), 6) AS price
FROM r
""",
    doc="W2 price reconstruction exp(cumsum(log_ret)+log(p0)) — the "
    "multiplicative chain as a log-space prefix sum "
    "(reference: app/data_processor.py:50-54). Round-trips W1 exactly.",
)
def w2_price_reconstruction(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = TS.series_window(_SERIES, _ORDER)
    d = TS.log_returns(_events(spark, sf_dir), "value", _SERIES, _ORDER)
    d = d.withColumn("p0", F.first("value").over(w))
    d = TS.reconstruct_prices(d, "log_ret", "p0", _SERIES, _ORDER, out_col="price")
    return d.select("event_id", "event_type", F.round("price", 6).alias("price"))


@register(
    "w4_rolling_volatility",
    oracle="""
WITH r AS (
  SELECT event_id, event_type, ts,
         LN(GREATEST(value, 1e-10))
           - LAG(LN(GREATEST(value, 1e-10))) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS log_ret
  FROM events
)
SELECT event_id, event_type,
       ROUND(STDDEV_SAMP(log_ret) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6) AS vol20
FROM r
QUALIFY COUNT(log_ret) OVER (
        PARTITION BY event_type ORDER BY ts, event_id
        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) >= 5
""",
    doc="W4 rolling std of returns (20-row trailing frame, min_periods=5) "
    "— reference: regime_hmm_garch.py:68-70 (pandas rolling std, ddof=1).",
)
def w4_rolling_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = TS.log_returns(_events(spark, sf_dir), "value", _SERIES, _ORDER)
    d = TS.rolling_std(d, "log_ret", 20, _SERIES, _ORDER, out_col="vol20", min_periods=5)
    return d.filter(F.col("vol20").isNotNull()).select(
        "event_id", "event_type", F.round("vol20", 6).alias("vol20")
    )


@register(
    "w6_autocorrelation_panel",
    oracle="""
WITH r AS (
  SELECT event_type, ts, event_id,
         LN(GREATEST(value, 1e-10))
           - LAG(LN(GREATEST(value, 1e-10))) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS log_ret
  FROM events
), lagged AS (
  SELECT event_type, log_ret,
         LAG(log_ret, 1)  OVER w AS l1,
         LAG(log_ret, 5)  OVER w AS l5,
         LAG(log_ret, 10) OVER w AS l10,
         LAG(log_ret, 24) OVER w AS l24
  FROM r
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type,
       ROUND(CORR(log_ret, l1), 6)  AS ac1,
       ROUND(CORR(log_ret, l5), 6)  AS ac5,
       ROUND(CORR(log_ret, l10), 6) AS ac10,
       ROUND(CORR(log_ret, l24), 6) AS ac24
FROM lagged
GROUP BY event_type
""",
    doc="W6/J1 lag-k autocorrelation panel, k∈{1,5,10,24} — corr-with-lag, "
    "no self-join (reference: distribution_evaluator.py:43-46,101-103).",
)
def w6_autocorrelation_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = TS.series_window(_SERIES, _ORDER)
    d = TS.log_returns(_events(spark, sf_dir), "value", _SERIES, _ORDER)
    aggs = [
        F.round(F.corr("log_ret", f"l{k}"), 6).alias(f"ac{k}") for k in (1, 5, 10, 24)
    ]
    return (
        d.select(
            "event_type",
            "log_ret",
            *[F.lag("log_ret", k).over(w).alias(f"l{k}") for k in (1, 5, 10, 24)],
        )
        .groupBy("event_type")
        .agg(*aggs)
    )


@register(
    "w7_volatility_clustering",
    oracle="""
WITH r AS (
  SELECT event_type, ts, event_id,
         ABS(LN(GREATEST(value, 1e-10))
           - LAG(LN(GREATEST(value, 1e-10))) OVER (PARTITION BY event_type ORDER BY ts, event_id)) AS abs_ret
  FROM events
), lagged AS (
  SELECT event_type, abs_ret,
         LAG(abs_ret) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS abs_ret_l1
  FROM r
)
SELECT event_type, ROUND(CORR(abs_ret, abs_ret_l1), 6) AS vol_cluster
FROM lagged
GROUP BY event_type
""",
    doc="W7 volatility clustering = lag-1 autocorr of |returns| "
    "(reference: composite_metric.py:59-63).",
)
def w7_volatility_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = TS.log_returns(_events(spark, sf_dir), "value", _SERIES, _ORDER)
    out = TS.volatility_clustering(d, "log_ret", _SERIES, _ORDER, out_col="vc")
    return out.select("event_type", F.round("vc", 6).alias("vol_cluster"))


@register(
    "w8_leverage_effect",
    oracle="""
WITH r AS (
  SELECT event_type, ts, event_id,
         LN(GREATEST(value, 1e-10))
           - LAG(LN(GREATEST(value, 1e-10))) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS log_ret
  FROM events
), led AS (
  SELECT event_type, log_ret,
         ABS(LEAD(log_ret) OVER (PARTITION BY event_type ORDER BY ts, event_id)) AS abs_lead
  FROM r
)
SELECT event_type, ROUND(CORR(log_ret, abs_lead), 6) AS leverage
FROM led
GROUP BY event_type
""",
    doc="W8 leverage effect corr(r_t, |r_{t+1}|) "
    "(reference: evaluate_all_generators.py:77-82).",
)
def w8_leverage_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = TS.log_returns(_events(spark, sf_dir), "value", _SERIES, _ORDER)
    out = TS.leverage_effect(d, "log_ret", 1, _SERIES, _ORDER, out_col="lev")
    return out.select("event_type", F.round("lev", 6).alias("leverage"))


@register(
    "w9_max_drawdown",
    oracle="""
WITH peaks AS (
  SELECT event_type,
         (value - MAX(value) OVER w) / MAX(value) OVER w AS dd
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, ROUND(MIN(dd), 6) AS max_drawdown
FROM peaks
GROUP BY event_type
""",
    doc="W9 running-max drawdown min((p-peak)/peak) "
    "(reference: evaluate_all_generators.py:110-113).",
)
def w9_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = TS.max_drawdown(_events(spark, sf_dir), "value", _SERIES, _ORDER, out_col="mdd")
    return out.select("event_type", F.round("mdd", 6).alias("max_drawdown"))


@register(
    "w15_chrono_split_counts",
    oracle="""
WITH ranked AS (
  SELECT event_type,
         PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS pr
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN pr <= 0.85 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       CAST(SUM(CASE WHEN pr > 0.85 THEN 1 ELSE 0 END) AS BIGINT) AS n_val
FROM ranked
GROUP BY event_type
""",
    doc="W15 chronological 85/15 train-val split sizes per series "
    "(reference: timegan_generator.py:103-109).",
)
def w15_chrono_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    train, val = TS.chrono_split(_events(spark, sf_dir), 0.85, _SERIES, _ORDER)
    t = train.groupBy("event_type").agg(F.count("*").alias("n_train"))
    v = val.groupBy("event_type").agg(F.count("*").alias("n_val"))
    return t.join(v, "event_type", "outer").fillna(0, ["n_train", "n_val"])


@register(
    "hourly_rollup",
    oracle="""
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_value,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling-window rollup (batch form of the streaming hypertable "
    "rollup): hash-agg on (hour, type); decimal sums for exactness.",
)
def hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    dec = F.col("value").cast("decimal(12,2)")
    return (
        ev.groupBy(
            F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(dec).cast("double") / F.count("*"), 6).alias("avg_value"),
            F.sum(dec).cast("double").alias("sum_value"),
        )
    )


@register(
    "cyclical_time_features",
    oracle="""
SELECT event_id,
       ROUND(SIN(2 * PI() * EXTRACT(hour FROM ts) / 24.0), 6) + 0.0 AS hour_sin,
       ROUND(COS(2 * PI() * EXTRACT(hour FROM ts) / 24.0), 6) + 0.0 AS hour_cos,
       ROUND(SIN(2 * PI() * (CAST(EXTRACT(isodow FROM ts) AS INT) - 1) / 5.0), 6) + 0.0 AS dow_sin,
       ROUND(COS(2 * PI() * (CAST(EXTRACT(isodow FROM ts) AS INT) - 1) / 5.0), 6) + 0.0 AS dow_cos,
       ROUND(SIN(2 * PI() * (EXTRACT(month FROM ts) - 1) / 12.0), 6) + 0.0 AS month_sin,
       ROUND(COS(2 * PI() * (EXTRACT(month FROM ts) - 1) / 12.0), 6) + 0.0 AS month_cos
FROM events
""",
    doc="Temporal feature matrix — sin/cos cyclical encodings with the "
    "reference's trading-week dow period of 5 "
    "(reference: app/data_processor.py:70-92). The oracle adds `+ 0.0` "
    "after each ROUND: DuckDB's ROUND(SIN(...),6) preserves IEEE -0.0 "
    "where Spark's BigDecimal-backed round emits +0.0, and the driver's "
    "byte-level hash distinguishes the two zero encodings (the r1-r6 "
    "hash failure). IEEE `x + 0.0` maps -0.0 to +0.0 under "
    "round-to-nearest, matching Spark exactly.",
)
def cyclical_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = TS.cyclical_time_features(_events(spark, sf_dir), "ts")
    cols = ["hour_sin", "hour_cos", "dow_sin", "dow_cos", "month_sin", "month_cos"]
    # `+ 0.0` mirrors the oracle's -0.0 normalization (Spark's round
    # already emits +0.0 today; this pins the contract either way).
    return d.select(
        "event_id", *[(F.round(c, 6) + F.lit(0.0)).alias(c) for c in cols]
    )


@register(
    "w3_sliding_window_stats",
    oracle="""
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER w AS rn,
         SUM(value) OVER (w ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS s,
         FIRST_VALUE(value) OVER (w ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS wf
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type, rn - 8 AS window_id,
       ROUND(wf, 6) AS win_first,
       ROUND(value, 6) AS win_last,
       ROUND(s / 8.0, 6) AS win_mean
FROM r WHERE rn >= 8
""",
    doc="W3 overlapping sliding windows (W=8): the reference's (N-W+1, W) "
    "matrix (app/data_processor.py:59-65) as long-form (series, window_id, "
    "array) rows; stats computed JVM-side from the array via F.aggregate / "
    "element_at so the collect_list path itself is exercised.",
)
def w3_sliding_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = TS.sliding_windows(_events(spark, sf_dir), "value", 8, _SERIES, _ORDER)
    vec = F.col("window_vec")
    win_sum = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x)
    return d.select(
        "event_type",
        "window_id",
        F.round(F.element_at(vec, 1), 6).alias("win_first"),
        F.round(F.element_at(vec, -1), 6).alias("win_last"),
        F.round(win_sum / 8.0, 6).alias("win_mean"),
    )


@register(
    "w5_volatility_ratio",
    oracle="""
WITH r AS (
  SELECT event_type, ts, event_id,
         LN(GREATEST(value, 1e-10))
           - LAG(LN(GREATEST(value, 1e-10))) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS log_ret
  FROM events
), v AS (
  SELECT event_type, ts, event_id,
         STDDEV_SAMP(log_ret) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS vs,
         COUNT(log_ret)       OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ns,
         STDDEV_SAMP(log_ret) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vl,
         COUNT(log_ret)       OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS nl
  FROM r
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_id, event_type,
       ROUND(CASE WHEN vl > 1e-10 THEN vs / vl ELSE 1.0 END, 6) AS vol_ratio
FROM v WHERE ns >= 5 AND nl >= 20
""",
    doc="W5 short/long volatility ratio with divide-by-zero guard "
    "(reference: regime_hmm_garch.py:70, regime_bootstrap_hybrid.py:45); "
    "5- vs 20-row rolling stds on full windows only.",
)
def w5_volatility_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = TS.log_returns(_events(spark, sf_dir), "value", _SERIES, _ORDER)
    d = TS.rolling_std(d, "log_ret", 5, _SERIES, _ORDER, out_col="vs", min_periods=5)
    d = TS.rolling_std(d, "log_ret", 20, _SERIES, _ORDER, out_col="vl", min_periods=20)
    return (
        d.filter(F.col("vs").isNotNull() & F.col("vl").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.round(TS.vol_ratio("vs", "vl"), 6).alias("vol_ratio"),
        )
    )


@register(
    "w10_supervised_xy",
    oracle="""
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER w AS rn,
         SUM(value) OVER (w ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS s,
         LEAD(value, 4) OVER w AS y
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type, rn - 8 AS window_id,
       ROUND(value, 6) AS x_last,
       ROUND(s / 8.0, 6) AS x_mean,
       ROUND(y, 6) AS y
FROM r WHERE rn >= 8 AND y IS NOT NULL
""",
    doc="W10 supervised (X, y) windowing: 8-row input window, horizon-4 "
    "target via lead (reference: predictive_evaluator.py:54-72).",
)
def w10_supervised_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = TS.supervised_windows(_events(spark, sf_dir), "value", 8, 4, _SERIES, _ORDER)
    vec = F.col("x")
    return d.select(
        "event_type",
        "window_id",
        F.round(F.element_at(vec, -1), 6).alias("x_last"),
        F.round(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x) / 8.0, 6).alias("x_mean"),
        F.round("y", 6).alias("y"),
    )


@register(
    "w11_window_zero_mean",
    oracle="""
WITH r AS (
  SELECT event_id, event_type, value,
         CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1) / 16) AS BIGINT) AS block_id
  FROM events
)
SELECT event_id, event_type, block_id,
       ROUND(value - AVG(value) OVER (PARTITION BY event_type, block_id), 6) AS centered
FROM r
""",
    doc="W11 per-window zero-mean correction: subtract the block mean from "
    "each element (reference: typical_price_generator.py:147-149) — "
    "tumbling 16-row blocks per series, mean via partitioned window agg.",
)
def w11_window_zero_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = TS.series_window(_SERIES, _ORDER)
    d = _events(spark, sf_dir).withColumn(
        "block_id", F.floor((F.row_number().over(w) - 1) / 16).cast("long")
    )
    wb = Window.partitionBy("event_type", "block_id")
    return d.select(
        "event_id",
        "event_type",
        "block_id",
        F.round(F.col("value") - F.avg("value").over(wb), 6).alias("centered"),
    )


@register(
    "w12_block_smoothing",
    oracle="""
WITH r AS (
  SELECT event_id, event_type, value,
         (ROW_NUMBER() OVER w - 1) % 16 AS pos,
         LAG(value) OVER w AS prev
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_id, event_type,
       ROUND(CASE WHEN pos = 0 AND prev IS NOT NULL
                  THEN 0.7 * value + 0.3 * prev ELSE value END, 6) AS smoothed
FROM r
""",
    doc="W12 block-boundary smoothing: blend each block's first element "
    "with the previous block's last, b[0] = (1-λ)·b[0] + λ·prev, λ=0.3 "
    "(reference: regime_bootstrap_hybrid.py:171-180).",
)
def w12_block_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = TS.series_window(_SERIES, _ORDER)
    d = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        "value",
        ((F.row_number().over(w) - 1) % 16).alias("pos"),
        F.lag("value").over(w).alias("prev"),
    )
    smoothed = F.when(
        (F.col("pos") == 0) & F.col("prev").isNotNull(),
        0.7 * F.col("value") + 0.3 * F.col("prev"),
    ).otherwise(F.col("value"))
    return d.select("event_id", "event_type", F.round(smoothed, 6).alias("smoothed"))


@register(
    "ranking_functions_panel",
    oracle="""
WITH r AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         RANK()        OVER w AS rnk,
         DENSE_RANK()  OVER w AS drnk,
         NTILE(4)      OVER w AS quartile,
         ROW_NUMBER()  OVER w AS rn
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
)
SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS totalprice,
       rnk, drnk, quartile
FROM r WHERE rn <= 5
""",
    doc="Ranking-function surface (SURVEY §2.5 note: the reference has "
    "no rank/dense_rank/ntile; the engine exposes them for the SQL "
    "surface): per-priority top-5 orders with rank/dense_rank/quartile, "
    "deterministic tiebreak on the key.",
)
def ranking_functions_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import Catalog

    o = Catalog(spark, sf_dir).table("orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    d = o.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.row_number().over(w).alias("rn"),
    )
    return d.filter(F.col("rn") <= 5).select(
        "o_orderpriority",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        "rnk",
        "drnk",
        "quartile",
    )


@register(
    "resample_4h_gapfill",
    oracle="""
WITH b AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 14400) * 14400 AS BIGINT) AS bucket_s,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_raw
  FROM events GROUP BY 1, 2
), rng AS (
  SELECT event_type, MIN(bucket_s) AS lo, MAX(bucket_s) AS hi FROM b GROUP BY 1
), grid AS (
  SELECT event_type, UNNEST(generate_series(lo, hi, 14400)) AS bucket_s FROM rng
)
SELECT g.event_type, g.bucket_s,
       COALESCE(b.n_events, 0) AS n_events,
       ROUND(LAST_VALUE(b.avg_raw IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bucket_s
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS avg_value,
       b.avg_raw IS NULL AS is_gap
FROM grid g LEFT JOIN b ON b.event_type = g.event_type AND b.bucket_s = g.bucket_s
""",
    doc="4h-bar resample + gap densify + forward fill - the reference's "
    "bar granularity (README.md: EUR/USD 4-hour bars) as a relational "
    "operator: bucket aggregate (decimal-exact), per-series calendar "
    "grid via sequence/explode, left join, last(ignorenulls) forward "
    "fill. Windows partition by series (event_type) so no "
    "SinglePartition stage appears; at 100 TB the grid join and fill "
    "shuffle only on the series key.",
)
def resample_4h_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    dec = F.col("value").cast("decimal(12,2)")
    b = ev.groupBy(
        "event_type",
        (F.floor(F.unix_seconds(F.col("ts")) / 14400) * 14400).alias("bucket_s"),
    ).agg(
        F.count("*").alias("n_events"),
        (F.sum(dec).cast("double") / F.count("*")).alias("avg_raw"),
    )
    rng = b.groupBy("event_type").agg(
        F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi")
    )
    grid = rng.select(
        "event_type",
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(14400))).alias("bucket_s"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(b, ["event_type", "bucket_s"], "left").select(
        "event_type",
        "bucket_s",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.round(F.last("avg_raw", ignorenulls=True).over(w), 6).alias("avg_value"),
        F.col("avg_raw").isNull().alias("is_gap"),
    )


@register(
    "range_window_trailing_1h",
    oracle="""
WITH e AS (
  SELECT event_id, event_type, epoch_us(ts) AS ts_us,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events
), w AS (
  SELECT event_id, event_type, ts_us,
         SUM(v) OVER (PARTITION BY event_type ORDER BY ts_us
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS trail_sum,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY ts_us
                        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS trail_n
  FROM e
)
SELECT event_id, event_type, CAST(trail_sum AS DOUBLE) AS trail_sum,
       CAST(trail_n AS BIGINT) AS trail_n
FROM w WHERE event_id < 2000 ORDER BY event_id
""",
    doc="RANGE-interval window (vs the ROWS windows of W3-W8): per "
    "series, the trailing ONE-HOUR sum/count — frame bounds follow the "
    "timestamp value, not row offsets, so ties and gaps are handled "
    "by time semantics. Runs on epoch-microsecond BIGINT ordering "
    "(identical frame edges in both engines) with decimal-exact sums; "
    "the window partitions by event_type, never SinglePartition. The "
    "time-decayed-feature primitive rows-based windows can't express.",
)
def range_window_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "event_type",
            F.sum("v").over(w).cast("double").alias("trail_sum"),
            F.count("*").over(w).cast("bigint").alias("trail_n"),
        )
        .filter(F.col("event_id") < 2000)
        .orderBy("event_id")
    )


@register(
    "ntile_rank_panel",
    oracle="""
WITH r AS (
  SELECT event_type, value,
         NTILE(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
  FROM events
)
SELECT event_type, decile, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
       CAST(MIN(value) AS DOUBLE) AS min_value,
       CAST(MAX(value) AS DOUBLE) AS max_value
FROM r GROUP BY event_type, decile ORDER BY event_type, decile
""",
    doc="Rank-family coverage: NTILE(10) deciles within each series "
    "(event_id tiebreak makes tile assignment deterministic), then "
    "per-decile count / decimal-exact sum / min / max. Partitioned by "
    "event_type — ntile needs a full-partition sort but never a "
    "global one. The quantile-bucketing twin of A5's fixed-edge "
    "digitize.",
)
def ntile_rank_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.select("event_type", "value", F.ntile(10).over(w).alias("decile"))
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
            F.min("value").cast("double").alias("min_value"),
            F.max("value").cast("double").alias("max_value"),
        )
        .orderBy("event_type", "decile")
    )
