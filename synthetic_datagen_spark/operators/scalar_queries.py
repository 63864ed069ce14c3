"""Scalar-function & set-operation queries (SURVEY §2.8, §2.7):
JSON extraction (events.props), string functions, math normalization,
intersect/except — the engine SQL surface beyond the reference's own
operator set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import stats as ST
from ..sources import Catalog
from .base import register


@register(
    "json_props_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
    doc="JSON property extraction from the events.props column "
    "(get_json_object → JVM-side JsonPath, no UDF) + integer aggregates.",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "string_functions_panel",
    oracle="""
SELECT upper(c_mktsegment) AS segment,
       COUNT(*) AS n,
       MIN(length(c_name)) AS min_name_len,
       MAX(length(c_name)) AS max_name_len,
       CAST(SUM(CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END) AS BIGINT) AS names_with_1
FROM customer
GROUP BY upper(c_mktsegment)
""",
    doc="String-function surface: upper/length/LIKE predicates over a "
    "dimension scan.",
)
def string_functions_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).table("customer")
    return c.groupBy(F.upper("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n"),
        F.min(F.length("c_name")).alias("min_name_len"),
        F.max(F.length("c_name")).alias("max_name_len"),
        F.sum(F.when(F.col("c_name").like("%1%"), 1).otherwise(0)).alias("names_with_1"),
    )


@register(
    "intersect_except_users",
    oracle="""
SELECT 'both' AS which, COUNT(*) AS n FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'error'
)
UNION ALL
SELECT 'purchase_only', COUNT(*) FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'error'
)
""",
    doc="U-extension set ops: INTERSECT / EXCEPT (Spark intersect / "
    "exceptAll-distinct) — planned as left-semi/anti aggregates.",
)
def intersect_except_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id")
    e = ev.filter(F.col("event_type") == "error").select("user_id")
    both = p.intersect(e).agg(F.count("*").alias("n")).select(
        F.lit("both").alias("which"), "n"
    )
    only = p.subtract(e).agg(F.count("*").alias("n")).select(
        F.lit("purchase_only").alias("which"), "n"
    )
    return both.unionByName(only)


@register(
    "zscore_normalization",
    oracle="""
WITH params AS (
  SELECT AVG(value) AS mu, STDDEV_SAMP(value) AS sd FROM events
)
SELECT event_id, ROUND((value - mu) / sd, 6) AS value_z
FROM events, params
""",
    doc="Z-score normalization via a broadcast stats row — the J4 "
    "normalization-params lookup (reference: "
    "augmentation_evaluator.py:250-274); no collect, one tiny crossJoin.",
)
def zscore_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events").select("event_id", "value")
    z = ST.zscore(ev, ["value"])
    return z.select("event_id", F.round("value", 6).alias("value_z"))


@register(
    "minmax_scaling",
    oracle="""
WITH params AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
SELECT event_id, ROUND((value - lo) / (hi - lo), 6) AS value_01
FROM events, params
""",
    doc="Min-max scaling to [0,1] (reference: timegan_generator.py:90-96) "
    "— broadcast range row + column arithmetic.",
)
def minmax_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events").select("event_id", "value")
    params = F.broadcast(ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi")))
    return ev.crossJoin(params).select(
        "event_id",
        F.round((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")), 6).alias(
            "value_01"
        ),
    )


def _approx_quantiles_oracle_sql() -> str:
    """Exact-regime oracle: with per-group n (~2k at sf0.01) below the
    sketch accuracy (10000), Spark's Greenwald-Khanna summaries never
    compress, so percentile_approx degenerates to the exact discrete
    quantile and bit-matches DuckDB quantile_disc (verified across
    1/7/32-partition layouts). Valid ONLY while n <= accuracy — hence
    pinned_sf='0.01' (the driver's gate scale); at larger SFs the
    sketch is approximate by design and the gate falls back to
    rows-only."""
    qcols = ", ".join(
        f"quantile_disc(value, {i / 10}) AS q{i}" for i in range(11)
    )
    arms = "\nUNION ALL ".join(
        f"SELECT event_type, CAST({i} AS INTEGER) AS decile, q{i} AS edge FROM q"
        for i in range(11)
    )
    return f"""
WITH q AS (
  SELECT event_type, {qcols}
  FROM events GROUP BY event_type
)
{arms}
ORDER BY event_type, decile
"""


@register(
    "approx_quantiles_scale_path",
    oracle=_approx_quantiles_oracle_sql(),
    pinned_sf="0.01",
    doc="percentile_approx deciles per series — the 100 TB quantile path "
    "(single-pass sketch, mergeable across partitions); exactness twin "
    "is a4_quantile_edges. Output is one SCALAR row per "
    "(event_type, decile) — the ArrayType column of the r9 shape broke "
    "the driver harness's canonicalizer (the one red r9 row), and the "
    "exploded shape is strictly more useful downstream. Value-oracled "
    "vs DuckDB quantile_disc in the exact regime (see "
    "_approx_quantiles_oracle_sql).",
)
def approx_quantiles_scale_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    probs = F.array(*[F.lit(i / 10) for i in range(11)])
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", probs, 10000).alias("edges")
    )
    return agg.select(
        "event_type", F.posexplode("edges").alias("decile", "edge")
    )


@register(
    "p_filters_panel",
    oracle="""
WITH r AS (
  SELECT event_type, event_id, GREATEST(value, 1e-10) AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND isfinite(value)
)
SELECT event_type, event_id, rn, ROUND(v, 6) AS clipped
FROM r WHERE rn BETWEEN 11 AND 20
""",
    doc="P4+P5+P7 filter panel: NaN/Inf row mask (regime_hmm_garch.py:73-74), "
    "clip-before-log floor (P5, regime_hmm_garch.py:67), and contiguous "
    "segment slice rows 11..20 per series (P7, regime_gan.py:47-51). "
    "All predicates are Catalyst-pushable scan filters.",
)
def p_filters_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    inf = float("inf")
    ev = (
        Catalog(spark, sf_dir)
        .table("events")
        .filter(
            F.col("value").isNotNull()
            & ~F.isnan("value")
            & (F.col("value") != inf)
            & (F.col("value") != -inf)
        )
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = ev.select(
        "event_type",
        "event_id",
        F.greatest(F.col("value"), F.lit(1e-10)).alias("v"),
        F.row_number().over(w).alias("rn"),
    )
    return d.filter(F.col("rn").between(11, 20)).select(
        "event_type", "event_id", "rn", F.round("v", 6).alias("clipped")
    )


@register(
    "variant_json_props_panel",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS distinct_k
FROM events GROUP BY event_type ORDER BY event_type
""",
    doc="VariantType semi-structured path (Spark 4): props parsed ONCE "
    "into the binary Variant encoding (parse_json) and fields "
    "extracted with variant_get typed paths — at 100 TB the Variant "
    "column is stored parsed (shredded by the writer), so every "
    "downstream query skips re-tokenizing JSON text, the concrete win "
    "over the per-query get_json_object of json_props_extract (its "
    "twin on the same data; both panels must agree with the oracle's "
    "DuckDB json_extract).",
)
def variant_json_props_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.expr("variant_get(v, '$.k', 'long')")
    return (
        v.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.countDistinct("k").alias("distinct_k"),
        )
        .orderBy("event_type")
    )
