"""Bucketed co-located join (driver brief: "repartition()/bucketing for
co-located joins"): writing both fact tables bucketed by the join key
lets the fact-fact join run with NO exchange on either side — at 100 TB
this is the difference between a full-network shuffle of both fact
tables and a local merge per bucket.

(Broadcast is disabled inside the test: at test scale the optimizer
would rightly broadcast these tiny tables; the bucketed layout is the
plan you need precisely when NEITHER side fits a broadcast.)"""

from __future__ import annotations

import contextlib
import io
import shutil

import pyspark.sql.functions as F
import pytest

from synthetic_datagen_spark.sources import Catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark):
    cat = Catalog(spark, SF)
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"b_{tbl}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"/root/repo/spark-warehouse/{name}", ignore_errors=True)
        (
            cat.table(tbl)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    yield spark
    for tbl in ("orders", "lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS b_{tbl}")


def test_bucketed_join_has_no_exchange(warehouse):
    spark = warehouse
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        # bucket-merge join: SMJ with NO exchange feeding either side
        assert "SortMergeJoin" in plan
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section, join_section
        assert plan.count("SelectedBucketsCount: 8 out of 8") == 2

        cat = Catalog(spark, SF)
        want = {
            r.o_orderstatus: r.n
            for r in cat.table("lineitem")
            .join(cat.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        got = {r.o_orderstatus: r.n for r in j.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_scaled_pigeonhole_params_infeasible_raises():
    """r11 review finding: an infeasible ladder (p = max_hamming+1
    exceeding the signature width) must raise a ValueError naming the
    parameters, not crash unpacking None."""
    import pytest

    from synthetic_datagen_spark.functions.bitsig import scaled_pigeonhole_params

    with pytest.raises(ValueError, match="no feasible pigeonhole config"):
        scaled_pigeonhole_params(10_000, max_hamming=63, sig_bits=63)


def test_prefix_sum_index_col_matches_global_index(spark):
    """with_prefix_sum(index_col=...) must emit the same dense rank
    with_global_index computes, from ONE shared range shuffle."""
    from synthetic_datagen_spark.functions.indexing import (
        with_global_index,
        with_prefix_sum,
    )

    df = spark.createDataFrame(
        [((i * 37) % 101, i, 1 + i % 5) for i in range(500)],
        "k INT, id INT, w INT",
    )
    both = with_prefix_sum(df, ["k", "id"], "w", "_pfx", index_col="_i")
    ref = with_global_index(df, ["k", "id"], "_i")
    a = {(r["k"], r["id"]): r["_i"] for r in both.collect()}
    b = {(r["k"], r["id"]): r["_i"] for r in ref.collect()}
    assert a == b
    # prefix sums still correct: sorted-by-rank prefix is cumulative
    rows = sorted(both.collect(), key=lambda r: r["_i"])
    acc = 0
    for r in rows:
        assert r["_pfx"] == acc, (r["_i"], r["_pfx"], acc)
        acc += r["w"]
