"""Aggregation queries (SURVEY §2.4): moment panels, histograms,
quantile discretization, state frequencies, transition matrices, SQL
summary views, rollup/cube.

Parity notes: skew/kurtosis built-ins differ across engines (Spark uses
population g1/excess-g2, DuckDB uses sample-corrected) — both sides here
compute them explicitly from centered moments (two-pass: mean join, then
centered aggregates; no catastrophic cancellation, so rounded values
agree). Counts and count-ratios are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import stats as ST
from ..sources import Catalog
from .base import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Catalog(spark, sf_dir).table("events")


@register(
    "a1_moment_panel",
    oracle="""
WITH mu AS (
  SELECT event_type, AVG(value) AS m, COUNT(*) AS n,
         MIN(value) AS min_value, MAX(value) AS max_value
  FROM events GROUP BY event_type
), cent AS (
  SELECT e.event_type,
         AVG((e.value - mu.m) * (e.value - mu.m)) AS m2,
         AVG((e.value - mu.m) * (e.value - mu.m) * (e.value - mu.m)) AS m3,
         AVG((e.value - mu.m) * (e.value - mu.m) * (e.value - mu.m) * (e.value - mu.m)) AS m4
  FROM events e JOIN mu ON e.event_type = mu.event_type
  GROUP BY e.event_type
)
SELECT mu.event_type, mu.n,
       ROUND(mu.m, 6) AS mean_value,
       ROUND(SQRT(cent.m2), 6) AS std_pop,
       ROUND(cent.m3 / POW(cent.m2, 1.5), 6) AS skew,
       ROUND(cent.m4 / (cent.m2 * cent.m2), 6) AS kurt_raw,
       ROUND(mu.min_value, 6) AS min_value,
       ROUND(mu.max_value, 6) AS max_value
FROM mu JOIN cent ON mu.event_type = cent.event_type
""",
    doc="A1/A2 moment panel: mean/std/skew/raw-kurtosis per series "
    "(reference: distribution_evaluator.py:96-99, composite_metric.py:127-130; "
    "numpy population ddof=0 convention, raw kurtosis = excess + 3).",
)
def a1_moment_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    mu = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"),
        F.count("*").alias("n"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    cd = F.col("value") - F.col("m")
    cent = (
        ev.join(F.broadcast(mu), "event_type")
        .groupBy("event_type")
        .agg(
            F.avg(cd * cd).alias("m2"),
            F.avg(cd * cd * cd).alias("m3"),
            F.avg(cd * cd * cd * cd).alias("m4"),
        )
    )
    return (
        mu.join(cent, "event_type")
        .select(
            "event_type",
            "n",
            F.round("m", 6).alias("mean_value"),
            F.round(F.sqrt("m2"), 6).alias("std_pop"),
            F.round(F.col("m3") / F.pow("m2", 1.5), 6).alias("skew"),
            F.round(F.col("m4") / (F.col("m2") * F.col("m2")), 6).alias("kurt_raw"),
            F.round("min_v", 6).alias("min_value"),
            F.round("max_v", 6).alias("max_value"),
        )
    )


@register(
    "a3_histogram_100",
    oracle="""
WITH b AS (
  SELECT LEAST(CAST(FLOOR((value - 0.0) / 5.0) AS BIGINT), 99) AS bin
  FROM events WHERE value BETWEEN 0.0 AND 500.0
)
SELECT bin, COUNT(*) AS cnt,
       ROUND(COUNT(*) / (SUM(COUNT(*)) OVER () * 5.0), 6) AS density
FROM b GROUP BY bin
""",
    doc="A3 fixed-range 100-bin histogram with density normalization — "
    "the KL/JS building block (reference: distribution_evaluator.py:27-36). "
    "numpy closed-right-edge on the last bin mirrored via LEAST.",
)
def a3_histogram_100(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = ST.histogram(_events(spark, sf_dir), "value", 0.0, 500.0, bins=100, density=True)
    return h.select("bin", "cnt", F.round("density", 6).alias("density"))


@register(
    "a4_quantile_edges",
    oracle="""
WITH q AS (
  SELECT event_type,
         quantile_cont(value, [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]) AS qs
  FROM events GROUP BY event_type
)
SELECT event_type, edge_idx, ROUND(qs[edge_idx + 1], 6) AS edge
FROM q CROSS JOIN (SELECT UNNEST(generate_series(0, 10)) AS edge_idx) i
""",
    doc="A4 exact decile edges per series — np.quantile linear "
    "interpolation parity via Spark's exact `percentile` "
    "(reference: grasynda_generator.py:77-82).",
)
def a4_quantile_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = ST.quantile_edges(_events(spark, sf_dir), "value", 10, ["event_type"])
    return e.select("event_type", "edge_idx", F.round("edge", 6).alias("edge"))


@register(
    "a5_state_frequency",
    oracle="""
WITH s AS (
  SELECT CASE WHEN value < 10 THEN 0 WHEN value < 50 THEN 1
              WHEN value < 100 THEN 2 WHEN value < 200 THEN 3 ELSE 4 END AS state
  FROM events
)
SELECT state, COUNT(*) AS cnt,
       ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS freq
FROM s GROUP BY state
""",
    doc="A5+A6 digitize into value states + normalized frequencies "
    "(reference: grasynda_generator.py:84,113-115).",
)
def a5_state_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    state = ST.digitize(F.col("value"), [10.0, 50.0, 100.0, 200.0])
    d = ev.withColumn("state", state)
    f = ST.state_frequency(d, "state")
    return f.select("state", "cnt", F.round("freq", 6).alias("freq"))


@register(
    "a7_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT event_type AS state,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_state
  FROM events
)
SELECT state, next_state, COUNT(*) AS cnt,
       ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY state) AS DOUBLE), 6) AS prob
FROM seq WHERE next_state IS NOT NULL
GROUP BY state, next_state
""",
    doc="A7 row-stochastic transition matrix over per-user event "
    "sequences (reference: grasynda_generator.py:87-94) — lead + "
    "count + windowed row-normalize, long form.",
)
def a7_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ST.transition_counts(
        _events(spark, sf_dir), "event_type", ["user_id"], ["ts", "event_id"]
    )
    return t.select("state", "next_state", "cnt", F.round("prob", 6).alias("prob"))


@register(
    "a12_generator_summary",
    oracle="""
SELECT source AS generator, lang,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 3) AS avg_chars,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY source, lang
ORDER BY generator, lang
""",
    doc="A12 the reference's SQLite OLAP summary view as Spark SQL "
    "(reference: evaluate_all_generators.py:245-281) — GROUP BY + "
    "ROUND(AVG) + ORDER BY, verbatim relational surface.",
)
def a12_generator_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    return (
        docs.groupBy(F.col("source").alias("generator"), "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 3).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("generator", "lang")
    )


@register(
    "a14_distinct_states",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT date_trunc('day', ts)) AS n_days
FROM events GROUP BY event_type
""",
    doc="A14/U3 distinct counts — Spark plans these as two-phase "
    "(expand + partial distinct) aggregates.",
)
def a14_distinct_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct(F.date_trunc("day", "ts")).alias("n_days"),
        )
    )


@register(
    "rollup_region_status_revenue",
    oracle="""
SELECT COALESCE(r.r_name, 'ALL') AS region,
       COALESCE(o.o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, o.o_orderstatus)
""",
    doc="ROLLUP hierarchy aggregate (engine SQL surface beyond the "
    "reference, SURVEY §2.4 note) — Spark Expand + single hash agg.",
)
def rollup_region_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o = cat.table("orders")
    c, n, r = cat.dim("customer"), cat.dim("nation"), cat.dim("region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_value",
        )
    )


@register(
    "a8_per_regime_stats",
    oracle="""
WITH s AS (
  SELECT event_type, ts, event_id, value,
         NTILE(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS state
  FROM events
), l AS (
  SELECT event_type, state, value,
         LAG(value) OVER (PARTITION BY event_type, state ORDER BY ts, event_id) AS pv
  FROM s
)
SELECT event_type, state,
       COUNT(*) AS n,
       ROUND(AVG(value), 6) AS mean_v,
       ROUND(STDDEV_SAMP(value), 6) AS std_v,
       ROUND(CORR(value, pv), 6) AS ar1
FROM l
GROUP BY event_type, state
""",
    doc="A8 per-regime aggregates: quartile-state labeling then per-state "
    "count/mean/std/AR(1) — the lag is taken *within* the state partition, "
    "matching the reference's select-then-shift semantics "
    "(regime_hmm_garch.py:96-127, regime_conditional.py:108-132).",
)
def a8_per_regime_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    ws = Window.partitionBy("event_type").orderBy("value", "event_id")
    d = ev.withColumn("state", F.ntile(4).over(ws))
    wl = Window.partitionBy("event_type", "state").orderBy("ts", "event_id")
    d = d.withColumn("pv", F.lag("value").over(wl))
    return d.groupBy("event_type", "state").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("mean_v"),
        F.round(F.stddev_samp("value"), 6).alias("std_v"),
        F.round(F.corr("value", "pv"), 6).alias("ar1"),
    )


@register(
    "a9_price_quantity_correlation",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(CORR(l_quantity, l_discount), 6) AS corr_qty_disc
FROM lineitem
GROUP BY l_returnflag
""",
    doc="A9 Pearson correlation as a grouped aggregate over the fact table "
    "(reference: composite_metric.py:19-22 and ~20 call sites) — "
    "co-moment streaming agg, partial+final, no shuffle beyond the groupBy.",
)
def a9_price_quantity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("corr_qty_disc"),
    )


@register(
    "a13_metric_map_mean",
    oracle="""
WITH per_series AS (
  SELECT event_type,
         ROUND(AVG(value), 6) AS mean_v,
         ROUND(STDDEV_POP(value), 6) AS std_v,
         ROUND(MAX(value) - MIN(value), 6) AS range_v
  FROM events GROUP BY event_type
), exploded AS (
  SELECT 'mean_v' AS metric, mean_v AS v FROM per_series
  UNION ALL SELECT 'std_v', std_v FROM per_series
  UNION ALL SELECT 'range_v', range_v FROM per_series
)
SELECT metric, ROUND(AVG(v), 6) AS mean_across_runs, COUNT(*) AS n_runs
FROM exploded GROUP BY metric
""",
    doc="A13 grouped mean over a metric map: per-run metric dicts "
    "(series as runs) exploded to (metric, value) rows, averaged per "
    "key (reference: composite_metric.py:183-186) — map_entries + "
    "explode + hash agg, no driver dict loop.",
)
def a13_metric_map_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _events(spark, sf_dir).groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mean_v"),
        F.round(F.stddev_pop("value"), 6).alias("std_v"),
        F.round(F.max("value") - F.min("value"), 6).alias("range_v"),
    )
    m = F.create_map(
        F.lit("mean_v"), F.col("mean_v"),
        F.lit("std_v"), F.col("std_v"),
        F.lit("range_v"), F.col("range_v"),
    )
    kv = per.select(F.explode(m).alias("metric", "v"))
    return kv.groupBy("metric").agg(
        F.round(F.avg("v"), 6).alias("mean_across_runs"),
        F.count("*").alias("n_runs"),
    )


@register(
    "skew_salted_agg",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
       ROUND(MIN(value), 6) AS min_value,
       ROUND(MAX(value), 6) AS max_value
FROM events
GROUP BY event_type
""",
    doc="Skew-safe two-phase aggregation (brief: 'skewed keys -> "
    "salting'): phase 1 aggregates on (key, salt=hash(event_id)%16) so "
    "a hot key spreads over 16 reducers, phase 2 merges partials on the "
    "key alone. Decimal sums keep the result bit-identical to the "
    "direct GROUP BY oracle regardless of salt routing.",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import salted_agg

    ev = _events(spark, sf_dir)
    dec = F.col("value").cast("decimal(12,2)")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n": (F.count("*"), lambda c: F.sum(c)),
            "sum_dec": (F.sum(dec), lambda c: F.sum(c)),
            "min_value": (F.min("value"), lambda c: F.min(c)),
            "max_value": (F.max("value"), lambda c: F.max(c)),
        },
        n_salts=16,
        salt_on="event_id",
    )
    return out.select(
        "event_type",
        "n",
        F.col("sum_dec").cast("double").alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )


@register(
    "cube_type_dow_stats",
    oracle="""
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(CAST(CAST(EXTRACT(isodow FROM ts) AS INT) AS VARCHAR), 'ALL') AS dow,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CUBE(event_type, CAST(EXTRACT(isodow FROM ts) AS INT))
""",
    doc="CUBE aggregate over (event_type, day-of-week) — the full 2^k "
    "grouping-sets lattice in one Expand + hash agg (SURVEY §2.4 note: "
    "cube/rollup come free with the SQL surface); decimal-exact sums.",
)
def cube_type_dow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ISO dow: Spark dayofweek is 1=Sunday; shift to 1=Monday ISO form
    ev = _events(spark, sf_dir).withColumn(
        "dow_i",
        F.when(F.dayofweek("ts") == 1, 7).otherwise(F.dayofweek("ts") - 1),
    )
    return (
        ev.cube("event_type", "dow_i")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("dow_i").cast("string"), F.lit("ALL")).alias("dow"),
            "n",
            "sum_value",
        )
    )


# HLL++ sketch values are engine-specific (DuckDB can't reproduce
# them), but they ARE deterministic: the register-merge is commutative
# and associative, so the estimate is independent of partition layout
# and task order. Pinned at sf0.01 (tools/pin_oracles.py), validated
# bit-identical across independent processes AND across the builder
# (32 shuffle partitions) vs plain-gate (200) layouts.
_PIN_APPROX_DISTINCT = """
SELECT * FROM (VALUES
  ('purchase', CAST(150 AS BIGINT), CAST(1962 AS BIGINT)),
  ('error', CAST(150 AS BIGINT), CAST(2009 AS BIGINT)),
  ('view', CAST(150 AS BIGINT), CAST(2016 AS BIGINT)),
  ('signup', CAST(150 AS BIGINT), CAST(2027 AS BIGINT)),
  ('click', CAST(150 AS BIGINT), CAST(1991 AS BIGINT))
) AS t("event_type", "approx_users", "approx_events")
"""


@register(
    "approx_distinct_scale_path",
    oracle=_PIN_APPROX_DISTINCT,
    pinned_sf="0.01",
    doc="approx_count_distinct (HyperLogLog++, rsd 2%) per event_type — "
    "the 100 TB distinct-count path: one pass, mergeable sketches, no "
    "distinct shuffle. Exactness twin is a14_distinct_states; the test "
    "pins the sketch within tolerance of the exact counts, and the "
    "sketch output itself is layout-independent (commutative register "
    "merge) so it carries a pinned VALUES oracle at the gate scale.",
)
def approx_distinct_scale_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.approx_count_distinct("event_id", 0.02).alias("approx_events"),
    )


@register(
    "pivot_type_dow_avg",
    oracle="""
SELECT event_type,
       ROUND(CAST(SUM(CASE WHEN EXTRACT(dow FROM ts) + 1 = 1 THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE)
         / COUNT(CASE WHEN EXTRACT(dow FROM ts) + 1 = 1 THEN 1 END), 6) AS dow1,
       ROUND(CAST(SUM(CASE WHEN EXTRACT(dow FROM ts) + 1 = 2 THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE)
         / COUNT(CASE WHEN EXTRACT(dow FROM ts) + 1 = 2 THEN 1 END), 6) AS dow2,
       ROUND(CAST(SUM(CASE WHEN EXTRACT(dow FROM ts) + 1 = 3 THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE)
         / COUNT(CASE WHEN EXTRACT(dow FROM ts) + 1 = 3 THEN 1 END), 6) AS dow3,
       ROUND(CAST(SUM(CASE WHEN EXTRACT(dow FROM ts) + 1 = 4 THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE)
         / COUNT(CASE WHEN EXTRACT(dow FROM ts) + 1 = 4 THEN 1 END), 6) AS dow4,
       ROUND(CAST(SUM(CASE WHEN EXTRACT(dow FROM ts) + 1 = 5 THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE)
         / COUNT(CASE WHEN EXTRACT(dow FROM ts) + 1 = 5 THEN 1 END), 6) AS dow5,
       ROUND(CAST(SUM(CASE WHEN EXTRACT(dow FROM ts) + 1 = 6 THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE)
         / COUNT(CASE WHEN EXTRACT(dow FROM ts) + 1 = 6 THEN 1 END), 6) AS dow6,
       ROUND(CAST(SUM(CASE WHEN EXTRACT(dow FROM ts) + 1 = 7 THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE)
         / COUNT(CASE WHEN EXTRACT(dow FROM ts) + 1 = 7 THEN 1 END), 6) AS dow7
FROM events GROUP BY event_type
""",
    doc="PIVOT surface: event_type x day-of-week average-value matrix "
    "via Spark's pivot with EXPLICIT value list (no extra distinct job, "
    "single shuffle - the transition-matrix/pivot shape of SURVEY 1.1). "
    "Decimal-exact sums; DuckDB oracle is the conditional-aggregation "
    "expansion (DuckDB dow is 0-based Sunday, Spark dayofweek 1-based).",
)
def pivot_type_dow_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import Catalog

    ev = Catalog(spark, sf_dir).table("events").select("event_type", "ts", "value")
    dec = F.col("value").cast("decimal(12,2)")
    piv = (
        ev.withColumn("dow", F.dayofweek("ts"))
        .groupBy("event_type")
        .pivot("dow", list(range(1, 8)))
        .agg(F.round(F.sum(dec).cast("double") / F.count("value"), 6))
    )
    return piv.select(
        "event_type", *[F.col(str(i)).alias(f"dow{i}") for i in range(1, 8)]
    )
