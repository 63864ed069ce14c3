"""Generator invariants — the reference's hardest contract (SURVEY §4.2):
same seed ⇒ identical output, different seed ⇒ different output, and —
stricter than the reference — identical under different partitioning.
(reference: tests/test_plugins.py:74-83)
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from synthetic_datagen_spark.generators import (
    BlockBootstrapGenerator,
    GrasyndaGenerator,
    derive_seed,
)
from synthetic_datagen_spark.sources import Catalog


def _train(spark, sf_smoke):
    ev = Catalog(spark, sf_smoke).table("events")
    return ev.filter(F.col("event_type") == "click").select("ts", "event_id", "value")


def _rows(df):
    return sorted((r.series_id, r.t, round(r.price, 9)) for r in df.collect())


def test_derive_seed_stable_and_spread():
    a = derive_seed(42, 0, 1)
    assert a == derive_seed(42, 0, 1)
    assert a != derive_seed(42, 0, 2)
    assert a != derive_seed(43, 0, 1)
    seen = {derive_seed(42, i) % 997 for i in range(200)}
    assert len(seen) > 150  # well-spread


def test_block_bootstrap_determinism(spark, sf_smoke):
    t = _train(spark, sf_smoke)
    g = BlockBootstrapGenerator(block_size=20).fit(t, "value", ["ts", "event_id"])
    a = _rows(g.generate(spark, 42, 120, n_series=3))
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        b = _rows(g.generate(spark, 42, 120, n_series=3))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b, "same seed must be partition-independent"
    c = _rows(g.generate(spark, 99, 120, n_series=3))
    assert a != c, "different seed must differ"


def test_block_bootstrap_chain_continuity(spark, sf_smoke):
    t = _train(spark, sf_smoke)
    bs = 20
    g = BlockBootstrapGenerator(block_size=bs).fit(t, "value", ["ts", "event_id"])
    out = g.generate(spark, 7, 100, n_series=2).collect()
    by_series = {}
    for r in out:
        by_series.setdefault(r.series_id, {})[r.t] = r.price
    for sid, series in by_series.items():
        assert len(series) == 100
        for t0 in range(bs, 100, bs):
            # block start price must equal previous block's end ratio chain
            prev_last, cur_first = series[t0 - 1], series[t0]
            assert math.isclose(prev_last, cur_first, rel_tol=1e-9), (
                f"series {sid} discontinuous at {t0}: {prev_last} vs {cur_first}"
            )
        assert all(p > 0 for p in series.values())


def test_block_bootstrap_values_from_training_shape(spark, sf_smoke):
    t = _train(spark, sf_smoke)
    g = BlockBootstrapGenerator(block_size=20).fit(t, "value", ["ts", "event_id"])
    out = g.generate(spark, 42, 200, n_series=2)
    # log-return std of synthetic should be same order as training
    from synthetic_datagen_spark.functions import timeseries as TS

    syn = TS.log_returns(out, "price", ["series_id"], ["t"])
    real = TS.log_returns(t, "value", [], ["ts", "event_id"])
    s = syn.agg(F.stddev_pop("log_ret")).first()[0]
    r = real.agg(F.stddev_pop("log_ret")).first()[0]
    assert 0.3 * r < s < 3.0 * r


def test_grasynda_determinism_and_moments(spark, sf_smoke):
    t = _train(spark, sf_smoke)
    g = GrasyndaGenerator(n_states=6).fit(t, "value", ["ts", "event_id"])
    a = _rows(g.generate(spark, 42, 150, n_series=3))
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = _rows(g.generate(spark, 42, 150, n_series=3))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b
    c = _rows(g.generate(spark, 1, 150, n_series=3))
    assert a != c
    raw = g.generate(spark, 42, 150, n_series=3).collect()
    assert all(r.price > 0 for r in raw)
    # returns are drawn from training pools: synthetic std within 3× band
    from synthetic_datagen_spark.functions import timeseries as TS

    syn_df = g.generate(spark, 42, 150, n_series=3)
    syn = TS.log_returns(syn_df, "price", ["series_id"], ["t"])
    real = TS.log_returns(t, "value", [], ["ts", "event_id"])
    s = syn.agg(F.stddev_pop("log_ret")).first()[0]
    r = real.agg(F.stddev_pop("log_ret")).first()[0]
    assert 0.3 * r < s < 3.0 * r


def test_block_bootstrap_artifact_roundtrip(spark, tmp_path):
    from synthetic_datagen_spark.generators.block_bootstrap import (
        load_block_bootstrap,
        save_block_bootstrap,
    )
    from synthetic_datagen_spark.sources import Catalog
    import pyspark.sql.functions as F

    ev = (
        Catalog(spark, "/root/testdata/sf0.001")
        .table("events")
        .filter(F.col("event_type") == "click")
        .select("ts", "event_id", "value")
    )
    gen = BlockBootstrapGenerator(block_size=20).fit(ev, "value", ["ts", "event_id"])
    p = str(tmp_path / "bb.parts")
    save_block_bootstrap(gen, p)
    back = load_block_bootstrap(spark, p)
    a = gen.generate(spark, seed=3, n_samples=80).orderBy("series_id", "t").collect()
    b = back.generate(spark, seed=3, n_samples=80).orderBy("series_id", "t").collect()
    assert [r.price for r in a] == [r.price for r in b]


def test_grasynda_artifact_roundtrip(spark, tmp_path):
    from synthetic_datagen_spark.generators.grasynda import (
        load_grasynda,
        save_grasynda,
    )
    from synthetic_datagen_spark.sources import Catalog
    import pyspark.sql.functions as F

    ev = (
        Catalog(spark, "/root/testdata/sf0.001")
        .table("events")
        .filter(F.col("event_type") == "click")
        .select("ts", "event_id", "value")
    )
    gen = GrasyndaGenerator(n_states=6).fit(ev, "value", ["ts", "event_id"])
    p = str(tmp_path / "gr.parts")
    save_grasynda(gen, p)
    back = load_grasynda(p)
    a = gen.generate(spark, seed=3, n_samples=60).orderBy("series_id", "t").collect()
    b = back.generate(spark, seed=3, n_samples=60).orderBy("series_id", "t").collect()
    assert [r.price for r in a] == [r.price for r in b]
