"""Relational operator queries over the star schema (SURVEY §2.3, §2.6,
§2.7): joins (broadcast-hash for dims, shuffle for facts, semi/anti),
top-k, union+dedup, keep-first dedup.

Oracle-parity note: every money aggregate is computed in DECIMAL on both
sides. Double sums are order-dependent (Spark's partial aggregation and
DuckDB's will sum in different orders); decimal addition is exact and
associative, so both engines produce bit-identical results, which the
driver's value-hash requires. The final cast back to DOUBLE is then
deterministic too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources import Catalog
from .base import register

# exact decimal views of the double money columns; values are < 10^6 so
# DECIMAL(12,2) holds them; products stay well under precision 38.
def _dec(c: str, scale: int = 2, prec: int = 12) -> F.Column:
    return F.col(c).cast(f"decimal({prec},{scale})")


_DISC_PRICE = "(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))))"


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({_DISC_PRICE} * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1-style pricing summary: multi-aggregate scan→hash-agg "
    "(partial+final, map-side combine). The A12 SQL-summary analog.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    qty, price = _dec("l_quantity"), _dec("l_extendedprice")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    disc_price = price * (1 - disc)
    charge = disc_price * (1 + tax)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_top_revenue_orders",
    oracle=f"""
SELECT o.o_orderkey,
       CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
       STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
""",
    doc="TPC-H Q3-style: broadcast dim join + fact join + top-k. customer "
    "broadcasts (dim); orders⋈lineitem is the one shuffle join.",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c = cat.dim("customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = cat.table("orders")
    li = cat.table("lineitem")
    disc_price = _dec("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(4,2)"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_nation_revenue",
    oracle=f"""
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
    doc="TPC-H Q5-style snowflake rollup: three chained broadcast-hash "
    "joins (supplier→nation→region all dims) — zero shuffle joins; the "
    "only shuffle is the final aggregation.",
)
def q5_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    s, n, r = cat.dim("supplier"), cat.dim("nation"), cat.dim("region")
    disc_price = _dec("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(4,2)"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(disc_price).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "semi_join_customers_with_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
""",
    doc="Left-semi join (EXISTS). Spark plans a broadcast left-semi "
    "when the right side is small, else shuffle-hash semi.",
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c = cat.table("customer")
    o = cat.table("orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "anti_join_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
""",
    doc="Left-anti join (NOT EXISTS) — the dedup-against-set primitive.",
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c = cat.table("customer")
    o = cat.table("orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "top_orders_by_totalprice",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    doc="O3/O5 top-k: TakeOrderedAndProject — no global sort, each "
    "partition keeps k rows then the driver merges k·p rows.",
)
def top_orders_by_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "dedup_first_event_per_user",
    oracle="""
SELECT user_id, event_type AS first_event_type, epoch_us(ts) AS ts_us
FROM (
  SELECT user_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""",
    doc="P3 keep-first dedup by key: row_number()=1 per (user) in event-"
    "time order — the exact keep-first semantics of the reference's "
    "duplicate-timestamp drop (app/data_processor.py:27-34).",
)
def dedup_first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("first_event_type"),
            F.unix_micros("ts").alias("ts_us"),
        )
    )


@register(
    "union_dedup_events",
    oracle="""
SELECT COUNT(*) AS n_rows, COUNT(DISTINCT event_id) AS n_ids
FROM (
  SELECT event_id FROM events
  UNION ALL
  SELECT event_id FROM events
) u
""",
    doc="U1/U2 union + dedup counts — the multi-source append path "
    "(reference: app/data_processor.py:27-34).",
)
def union_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events").select("event_id")
    u = ev.unionByName(ev)
    return u.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("event_id").alias("n_ids"),
    )


@register(
    "orders_customer_nation_enrich",
    oracle="""
SELECT n.n_name AS nation, o.o_orderstatus AS status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name, o.o_orderstatus
""",
    doc="Fact→dim→dim enrichment with two broadcast joins and one agg.",
)
def orders_customer_nation_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o = cat.table("orders")
    c, n = cat.dim("customer"), cat.dim("nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_value"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H-style Q6 forecast-revenue-change: pure scan-filter-agg — "
    "all three predicates push to the parquet scan, one partial+final "
    "agg, zero joins/shuffles beyond the final merge.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    d = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.sum(_dec("l_extendedprice") * F.col("l_discount").cast("decimal(4,2)"))
    return d.agg(
        rev.cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    doc="TPC-H-style Q10 returned-item ranking: fact-fact join "
    "(lineitem×orders on orderkey) with broadcast dims, returnflag "
    "filter pushed below the join, top-20 by decimal-exact revenue "
    "with key tiebreak.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(F.col("l_returnflag") == "R")
    o = cat.table("orders")
    c, n = cat.dim("customer"), cat.dim("nation")
    rev = F.sum(
        _dec("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(4,2)"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.cast("double").alias("revenue"), F.count("*").alias("n_lines"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "asof_join_purchase_click",
    oracle="""
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type, value,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_value,
         MAX(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
  FROM events
)
SELECT event_id, user_id,
       ROUND(value, 6) AS purchase_value,
       ROUND(last_click_value, 6) AS last_click_value,
       epoch_us(last_click_ts) AS last_click_ts_us
FROM tagged
WHERE event_type = 'purchase' AND last_click_value IS NOT NULL
""",
    doc="As-of join (SURVEY §2.3: 'range/as-of joins via window'): each "
    "purchase picks the latest click value at-or-before its timestamp "
    "per user. Expressed as LAST_VALUE IGNORE NULLS over the merged "
    "stream — one shuffle on the join key, NO physical inequality join "
    "(a naive ts-range join is quadratic per user at scale).",
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_val = F.when(F.col("event_type") == "click", F.col("value"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    d = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.last(click_val, ignorenulls=True).over(w).alias("last_click_value"),
        F.max(click_ts).over(w).alias("last_click_ts"),
    )
    return d.filter(
        (F.col("event_type") == "purchase") & F.col("last_click_value").isNotNull()
    ).select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("purchase_value"),
        F.round("last_click_value", 6).alias("last_click_value"),
        F.unix_micros("last_click_ts").alias("last_click_ts_us"),
    )


@register(
    "interval_join_lineitem_orderdate",
    oracle="""
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines_shipped_30d,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty_30d
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= o.o_orderdate
  AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
GROUP BY o.o_orderpriority
""",
    doc="Interval (range) join: lineitems shipped within 30 days of "
    "their order's date — equi key (orderkey) carries the shuffle, the "
    "time-range predicate evaluates post-join, so the plan stays a "
    "hash/sort-merge join, never a nested-loop range scan.",
)
def interval_join_lineitem_orderdate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li, o = cat.table("lineitem"), cat.table("orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines_shipped_30d"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("qty_30d"),
    )


@register(
    "q4_priority_late_ship",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    doc="TPC-H Q4-style order-priority check, adapted to this schema "
    "(no commitdate/receiptdate: 'late' = some line shipped >60 days "
    "after the order date). EXISTS becomes a LEFT SEMI join — Spark "
    "never materializes the multiplicity of matching lines, and the "
    "orderdate window filter is pushed to the orders scan. The "
    "correlated ship-vs-order-date predicate rides the equi-join key "
    "so the plan stays hash/sort-merge, never nested-loop. "
    "Reference analog: app/data_processor.py date-window slicing.",
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o = cat.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = cat.table("lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q14_promo_revenue_share",
    oracle=f"""
SELECT strftime(date_trunc('month', l.l_shipdate), '%Y-%m') AS ship_month,
       CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_DISC_PRICE}
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS total_revenue,
       ROUND(CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_DISC_PRICE}
                           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM({_DISC_PRICE}) AS DOUBLE), 6) AS promo_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY ship_month
ORDER BY ship_month
""",
    doc="TPC-H Q14-style promo revenue share per ship-month: fact scan "
    "with the year filter pushed to parquet, BROADCAST join to the "
    "part dim (no fact shuffle for the join — only the month group-by "
    "shuffles), decimal-exact numerator/denominator, share rounded on "
    "both sides. The conditional-aggregate pattern every revenue-mix "
    "dashboard uses.",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = cat.dim("part")
    disc_price = _dec("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(4,2)"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(disc_price).cast("double").alias("total_revenue"),
        )
        .withColumn(
            "promo_share", F.round(F.col("promo_revenue") / F.col("total_revenue"), 6)
        )
        .orderBy("ship_month")
    )


@register(
    "q18_large_volume_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(o.o_totalprice AS DOUBLE) AS totalprice,
       CAST(b.total_qty AS DOUBLE) AS total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY totalprice DESC, o.o_orderkey
LIMIT 50
""",
    doc="TPC-H Q18 large-volume orders: aggregate-then-join. The "
    "lineitem group-by reduces 600k lines to ~0.5% survivors before "
    "any join; the survivor set is broadcast into orders (AQE would "
    "pick this too — we pin it), customer is a broadcast dim, and the "
    "top-50 is a TakeOrderedAndProject, never a full sort. The "
    "canonical 'filter early via HAVING' plan shape.",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li, o, c = cat.table("lineitem"), cat.table("orders"), cat.dim("customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@register(
    "q19_disjunctive_brand_filter",
    oracle=f"""
SELECT p.p_brand,
       COUNT(*) AS n_lines,
       CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 50)
GROUP BY p.p_brand ORDER BY p.p_brand
""",
    doc="TPC-H Q19-style disjunctive predicate join: three OR'd "
    "(brand, size-range, quantity-range) clauses. The part side of "
    "each disjunct filters the broadcast dim before the join "
    "(Catalyst extracts the common p_brand IN (...) superset), the "
    "quantity ranges evaluate post-join, and revenue stays decimal-"
    "exact. Exercises OR-predicate pushdown that naive planners turn "
    "into a cartesian filter.",
)
def q19_disjunctive_brand_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li, p = cat.table("lineitem"), cat.dim("part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & qty.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & qty.between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & qty.between(20, 50))
    )
    disc_price = _dec("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(4,2)"))
    return (
        j.filter(cond)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lines"), F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy("p_brand")
    )


@register(
    "q7_nation_volume_shipping",
    oracle=f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    doc="TPC-H Q7-style cross-nation volume: one fact-fact shuffle "
    "(lineitem x orders on orderkey) and FOUR broadcast dims — the "
    "supplier/customer nation pair filter prunes both dim sides "
    "before their joins, so the disjunctive nation-pair predicate "
    "never touches the fact shuffle. Year extraction groups the "
    "decimal-exact revenue.",
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = cat.table("orders")
    c, s = cat.dim("customer"), cat.dim("supplier")
    nc = cat.dim("nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    ns = cat.dim("nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    disc_price = _dec("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(4,2)"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("nc_key"))
        .join(F.broadcast(ns), s.s_nationkey == F.col("ns_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.sum(disc_price).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q15_top_supplier_revenue",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_DISC_PRICE}) AS DECIMAL(18,4)) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s.s_suppkey
""",
    doc="TPC-H Q15 top supplier: quarterly per-supplier revenue, then "
    "the scalar-subquery MAX filter. Spark reuses ONE revenue frame "
    "for both the max (a single-row broadcast) and the equality "
    "filter; revenue stays DECIMAL through the comparison so the "
    "max-equality can't be lost to float rounding, and only the "
    "final projection casts to double.",
)
def q15_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    disc_price = _dec("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(4,2)"))
    rev = li.groupBy("l_suppkey").agg(
        F.sum(disc_price).cast("decimal(18,4)").alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = cat.dim("supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_rev == F.col("mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH pavg AS (
  SELECT l_partkey, AVG(CAST(l_quantity AS DECIMAL(12,2))) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT COUNT(*) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem l
JOIN pavg p ON l.l_partkey = p.l_partkey
WHERE CAST(l.l_quantity AS DECIMAL(12,2)) < 0.5 * p.avg_qty
""",
    doc="TPC-H Q17-style small-quantity revenue: the correlated "
    "per-part average becomes a self-aggregate joined back on "
    "partkey. Both sides shuffle on l_partkey (the agg output is "
    "per-part and at 100 TB is NOT broadcastable — the co-partitioned "
    "join is the honest plan; AQE may still broadcast at small sf). "
    "The avg is computed in DECIMAL: DuckDB's AVG over DECIMAL and "
    "Spark's agree exactly, so the 0.5x threshold comparison can't "
    "straddle a float ulp.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    pavg = li.groupBy("l_partkey").agg(F.avg(_dec("l_quantity")).alias("avg_qty"))
    j = li.alias("l").join(pavg.alias("p"), "l_partkey").filter(
        _dec("l_quantity") < 0.5 * F.col("avg_qty")
    )
    return j.agg(
        F.count("*").alias("n_lines"),
        (F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
    )


@register(
    "q22_idle_customer_balance",
    oracle="""
WITH pos AS (
  SELECT AVG(CAST(c_acctbal AS DECIMAL(12,2))) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer c, pos
WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) > pos.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
""",
    doc="TPC-H Q22-style dormant high-balance customers: scalar "
    "subquery (above-average positive balance, decimal-exact so the "
    "threshold is bit-identical in both engines) + NOT EXISTS "
    "(no order since mid-2000 — every customer in this corpus has "
    "SOME order, so dormancy is recency-scoped) as a LEFT ANTI join "
    "against the date-filtered orders, grouped by market segment. "
    "The single-row average broadcasts; the anti join shuffles on "
    "custkey with the date filter pushed to the orders scan.",
)
def q22_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c = cat.table("customer")
    o = cat.table("orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg(_dec("c_acctbal")).alias("avg_bal")
    )
    rich = c.join(F.broadcast(avg_bal), _dec("c_acctbal") > F.col("avg_bal"))
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp"))
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )
