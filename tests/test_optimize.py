"""G8 hybrid generator + M14 GA optimizer: determinism, convergence,
pool construction invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from synthetic_datagen_spark.functions import timeseries as TS
from synthetic_datagen_spark.optimize import GAOptimizer, Gene, moment_match_fitness
from synthetic_datagen_spark.regime import RegimeModel, regime_features
from synthetic_datagen_spark.regime.hybrid import RegimeBootstrapHybrid
from synthetic_datagen_spark.sources import Catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hybrid(spark):
    ev = (
        Catalog(spark, SF)
        .table("events")
        .filter(F.col("event_type") == "click")
        .select("ts", "event_id", "value")
    )
    feats = regime_features(ev, "value", [], ["ts", "event_id"]).withColumn(
        "series", F.lit(0)
    ).persist()
    model = RegimeModel(n_regimes=3, seed=42).fit(feats, ["series"])
    return RegimeBootstrapHybrid(model, min_block=4, lam=0.3).fit(["series"])


def test_hybrid_pools_nonempty(hybrid):
    assert hybrid.pools
    for blocks in hybrid.pools.values():
        for b in blocks:
            assert len(b) >= 4


def test_hybrid_seed_determinism(spark, hybrid):
    a = hybrid.generate(spark, seed=7, n_samples=60, n_series=2).orderBy("series_id", "t").collect()
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = hybrid.generate(spark, seed=7, n_samples=60, n_series=2).orderBy("series_id", "t").collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    c = hybrid.generate(spark, seed=8, n_samples=60, n_series=2).orderBy("series_id", "t").collect()
    assert [r.price for r in a] == [r.price for r in b]
    assert [r.price for r in a] != [r.price for r in c]
    assert len(a) == 120 and all(np.isfinite(r.price) for r in a)


def test_hybrid_crossfade_variant(spark, hybrid):
    hybrid2 = RegimeBootstrapHybrid(hybrid.model, min_block=4, smoothing="crossfade", overlap=3)
    hybrid2.pools = hybrid.pools
    out = hybrid2.generate(spark, seed=7, n_samples=40, n_series=1).collect()
    assert len(out) == 40


def _toy_fitness_factory():
    """Deterministic driver-side fitness: distance to (20, 0.5)."""

    def fitness(spark, cands, gen):
        import pandas as pd

        return pd.DataFrame(
            {
                "cand_id": cands["cand_id"],
                "score": (cands["block_size"] - 20) ** 2 / 400 + (cands["lam"] - 0.5) ** 2,
            }
        )

    return fitness


def test_ga_converges_and_deterministic(spark):
    def run():
        ga = GAOptimizer(
            genes=[Gene("block_size", 4, 48, "int"), Gene("lam", 0.0, 1.0)],
            fitness=_toy_fitness_factory(),
            pop_size=12,
            n_gens=6,
            seed=42,
        )
        return ga.optimize(spark)

    r1, r2 = run(), run()
    assert r1["best"] == r2["best"] and r1["score"] == r2["score"]
    assert r1["score"] <= r1["history"][0]["best"]  # no regression over gens
    assert abs(r1["best"]["block_size"] - 20) <= 8
    assert abs(r1["best"]["lam"] - 0.5) <= 0.3


def test_ga_spark_fanout_fitness(spark):
    rng = np.random.default_rng(0)
    pool = rng.normal(0.0, 0.01, 2000)
    fitness = moment_match_fitness(
        pool, {"mean": 0.0, "std": 0.01, "ac1": 0.0}, n_samples=128, n_seeds=2
    )
    ga = GAOptimizer(
        genes=[Gene("block_size", 4, 48, "int"), Gene("lam", 0.0, 1.0)],
        fitness=fitness,
        pop_size=6,
        n_gens=2,
        seed=42,
    )
    res = ga.optimize(spark)
    assert np.isfinite(res["score"]) and res["best"] is not None


def test_hybrid_ar_bridge_variant(spark, hybrid):
    from synthetic_datagen_spark.regime.hybrid import RegimeBootstrapHybrid

    h = RegimeBootstrapHybrid(hybrid.model, min_block=4, smoothing="ar_bridge", overlap=4, lam=0.5)
    h.pools = hybrid.pools
    a = h.generate(spark, seed=5, n_samples=50, n_series=1).orderBy("t").collect()
    b = h.generate(spark, seed=5, n_samples=50, n_series=1).orderBy("t").collect()
    assert [r.price for r in a] == [r.price for r in b]
    assert len(a) == 50 and all(np.isfinite(r.price) for r in a)


def test_random_sweep_deterministic_and_bounded(spark):
    from synthetic_datagen_spark.optimize import Gene, random_sweep

    def run():
        return random_sweep(
            spark,
            [Gene("block_size", 4, 48, "int"), Gene("lam", 0.0, 1.0)],
            _toy_fitness_factory(),
            n_configs=16,
            batch=4,
            patience_batches=2,
            seed=7,
        )

    r1, r2 = run(), run()
    assert r1["best"] == r2["best"] and r1["score"] == r2["score"]
    assert r1["evaluated"] <= 16
    assert r1["score"] <= min(h["best"] for h in r1["history"])


def test_segmentation_finds_vol_shift(spark):
    from synthetic_datagen_spark.regime.segmentation import (
        cluster_segments,
        detect_changepoints,
    )

    rng = np.random.default_rng(1)
    # price series with a sharp volatility regime change at t=500
    r1 = rng.normal(0, 0.001, 500)
    r2 = rng.normal(0, 0.02, 500)
    prices = 100 * np.exp(np.cumsum(np.concatenate([r1, r2])))
    rows = [("s", i, float(prices[i])) for i in range(1000)]
    df = spark.createDataFrame(rows, "series STRING, t LONG, value DOUBLE")
    cps = detect_changepoints(df, "value", ["series"], ["t"], min_size=50)
    segs = cps.groupBy("seg_id").agg(F.min("idx").alias("lo"), F.max("idx").alias("hi")).collect()
    assert len(segs) >= 2  # the vol shift is detected
    bounds = sorted(r.lo for r in segs if r.lo > 0)
    assert any(abs(b - 500) < 60 for b in bounds)  # near the true break
    out = cluster_segments(df, cps, "value", ["series"], ["t"], k=2)
    assert out.count() == len(segs)
    assert out.select("cluster").distinct().count() >= 1


def test_hybrid_moment_fidelity(spark, hybrid):
    """Generated return moments stay in the training pool's ballpark
    (the reference's statistical layer, test_regime_generator.py:36-60:
    std_ratio within a loose band, finite prices, no collapse)."""
    pool_rets = np.concatenate([b for bs in hybrid.pools.values() for b in bs])
    out = hybrid.generate(spark, seed=21, n_samples=400, n_series=4).orderBy(
        "series_id", "t"
    ).collect()
    prices = np.array([r.price for r in out]).reshape(4, 400)
    gen_rets = np.diff(np.log(prices), axis=1).ravel()
    ratio = gen_rets.std() / pool_rets.std()
    assert 0.3 < ratio < 3.0, f"std_ratio {ratio} collapsed/exploded"
    assert np.isfinite(prices).all() and (prices > 0).all()
    # different series diverge (independent seeds)
    assert not np.allclose(prices[0], prices[1])


def test_hybrid_multi_seed_stability(spark, hybrid):
    """D9-style: across-seed std of the per-seed return-std is small
    relative to its mean — the generator is statistically stable."""
    stds = []
    for seed in (1, 2, 3, 4):
        rows = hybrid.generate(spark, seed=seed, n_samples=300, n_series=1).orderBy("t").collect()
        p = np.array([r.price for r in rows])
        stds.append(np.diff(np.log(p)).std())
    stds = np.array(stds)
    assert stds.std() / stds.mean() < 1.0  # no wild per-seed swings


def test_hybrid_artifact_roundtrip(spark, hybrid, tmp_path):
    from synthetic_datagen_spark.regime.hybrid import load_hybrid, save_hybrid

    p = str(tmp_path / "hyb.parts")
    save_hybrid(hybrid, p)
    back = load_hybrid(p)
    a = hybrid.generate(spark, seed=13, n_samples=80, n_series=1).orderBy("t").collect()
    b = back.generate(spark, seed=13, n_samples=80, n_series=1).orderBy("t").collect()
    assert [r.price for r in a] == [r.price for r in b]


def test_staged_optimizer_freeze_and_monotone(spark):
    """M15: per-stage summaries, monotone global best, frozen gene kept
    at the global-best value through the freezing stage, deterministic
    trajectory for a fixed seed."""
    import numpy as np

    from synthetic_datagen_spark.optimize import (
        Gene,
        Stage,
        StagedOptimizer,
        moment_match_fitness,
    )

    rng = np.random.default_rng(5)
    pool = rng.normal(0.0002, 0.01, 2000)
    stats = {"mean": float(pool.mean()), "std": float(pool.std()), "ac1": 0.0}

    def factory(weights):
        return moment_match_fitness(pool, stats, n_samples=128, n_seeds=1, weights=weights)

    def run():
        opt = StagedOptimizer(
            genes=[Gene("block_size", 4, 40, "int"), Gene("lam", 0.0, 1.0)],
            fitness_factory=factory,
            stages=[
                Stage("broad", pop_size=6, n_gens=2, mut_sigma=0.3),
                Stage("focus", pop_size=4, n_gens=2, mut_sigma=0.1,
                      weights={"ac1": 3.0}),
                Stage("polish", pop_size=4, n_gens=2, mut_sigma=0.05,
                      freeze=("block_size",)),
            ],
            seed=11,
        )
        return opt.optimize(spark)

    a = run()
    b = run()
    assert a["best"] == b["best"] and a["score"] == b["score"]
    gb = [s["global_best"] for s in a["stages"]]
    assert gb == sorted(gb, reverse=True)  # monotone non-increasing
    assert a["stages"][2]["frozen"] == "block_size"
    # the frozen stage couldn't move block_size: final best keeps the
    # value that was global-best entering stage 3 (or stage 3's best
    # equals it by construction of the collapsed bounds)
    assert a["best"]["block_size"] == b["best"]["block_size"]
    assert a["score"] <= a["stages"][0]["global_best"] + 1e-12


def test_ga_resume_bit_identical_after_kill(spark, tmp_path):
    """M14 durability (reference ga_optimizer.py:580-589): kill a run
    mid-generation; re-invoking with the same resume file skips the
    completed generations and finishes BIT-identically to an
    uninterrupted run — best, score, and full history. The meta-log
    carries the reference's per-individual CSV rows across the kill."""
    genes = [Gene("block_size", 4, 48, "int"), Gene("lam", 0.0, 1.0)]

    def make(fitness, resume=None, meta=None):
        return GAOptimizer(
            genes=genes, fitness=fitness, pop_size=10, n_gens=6, seed=42,
            resume_file=resume, meta_log=meta,
        )

    # uninterrupted reference run (no persistence)
    ref = make(_toy_fitness_factory()).optimize(spark)

    class Bomb(RuntimeError):
        pass

    calls = {"n": 0}
    inner = _toy_fitness_factory()

    def bombed(spark_, cands, gen):
        calls["n"] += 1
        if calls["n"] > 3:  # die during generation 3 (0-indexed gen 3)
            raise Bomb()
        return inner(spark_, cands, gen)

    resume = str(tmp_path / "ga_resume.json")
    meta = str(tmp_path / "meta_log.csv")
    try:
        make(bombed, resume, meta).optimize(spark)
        raise AssertionError("bomb did not go off")
    except Bomb:
        pass

    import json
    import os

    state = json.load(open(resume))
    assert state["next_gen"] == 3 and not state["done"]

    out = make(_toy_fitness_factory(), resume, meta).optimize(spark)
    assert out["best"] == ref["best"]
    assert out["score"] == ref["score"]
    assert out["history"] == ref["history"]
    assert json.load(open(resume))["done"] is True

    # completed run short-circuits: a third invocation re-evaluates nothing
    def explode(*a):
        raise AssertionError("fitness called after done")

    again = make(explode, resume, meta).optimize(spark)
    assert again["best"] == ref["best"] and again["score"] == ref["score"]

    # meta-log: header + pop_size rows per evaluated generation, no dupes
    lines = open(meta).read().strip().splitlines()
    assert lines[0] == "stage,generation,individual,block_size,lam,fitness"
    n_gens_eval = len(ref["history"])
    assert len(lines) == 1 + 10 * n_gens_eval
    gen_of = [int(l.split(",")[1]) for l in lines[1:]]
    assert gen_of == sorted(gen_of)
    assert os.path.exists(resume)


def test_staged_resume_skips_completed_stages(spark, tmp_path):
    """M15 durability: the stage loop persists the reference's resume
    layout after each stage; a kill between stages resumes from the
    next stage with identical carry-elites and final result."""
    import json

    from synthetic_datagen_spark.optimize import Stage, StagedOptimizer

    genes = [Gene("block_size", 4, 40, "int"), Gene("lam", 0.0, 1.0)]
    stages = [
        Stage("broad", pop_size=6, n_gens=2, mut_sigma=0.3),
        Stage("polish", pop_size=4, n_gens=2, mut_sigma=0.1),
    ]

    def factory(weights):
        return _toy_fitness_factory()

    ref = StagedOptimizer(
        genes=genes, fitness_factory=factory, stages=stages, seed=11
    ).optimize(spark)

    class Bomb(RuntimeError):
        pass

    stage_calls = {"n": 0}

    def bombed_factory(weights):
        inner = _toy_fitness_factory()

        def fitness(spark_, cands, gen):
            stage_calls["n"] += 1
            if stage_calls["n"] > 2:  # survive stage 0 (2 gens), die in stage 1
                raise Bomb()
            return inner(spark_, cands, gen)

        return fitness

    resume = str(tmp_path / "staged_resume.json")
    try:
        StagedOptimizer(
            genes=genes, fitness_factory=bombed_factory, stages=stages,
            seed=11, resume_file=resume,
        ).optimize(spark)
        raise AssertionError("bomb did not go off")
    except Bomb:
        pass
    assert json.load(open(resume))["completed_stages"] == 1

    out = StagedOptimizer(
        genes=genes, fitness_factory=factory, stages=stages,
        seed=11, resume_file=resume,
    ).optimize(spark)
    assert out["best"] == ref["best"] and out["score"] == ref["score"]
    assert [s["global_best"] for s in out["stages"]] == [
        s["global_best"] for s in ref["stages"]
    ]


def test_ga_resume_rejects_mismatched_config(spark, tmp_path):
    """A resume file from a different configuration (gene space, seed,
    budget) must RAISE, never silently return the old run's state."""
    import pytest

    genes = [Gene("block_size", 4, 48, "int"), Gene("lam", 0.0, 1.0)]
    resume = str(tmp_path / "r.json")
    GAOptimizer(
        genes=genes, fitness=_toy_fitness_factory(), pop_size=6, n_gens=2,
        seed=42, resume_file=resume,
    ).optimize(spark)
    for kwargs in (
        {"seed": 43},                                   # different seed
        {"n_gens": 3},                                  # different budget
        {"genes": [Gene("block_size", 4, 40, "int"),    # different bounds
                   Gene("lam", 0.0, 1.0)]},
        {"fitness_tag": "other-objective-v2"},          # changed fitness/data
    ):
        cfg = dict(genes=genes, fitness=_toy_fitness_factory(), pop_size=6,
                   n_gens=2, seed=42, resume_file=resume)
        cfg.update(kwargs)
        with pytest.raises(RuntimeError, match="different configuration"):
            GAOptimizer(**cfg).optimize(spark)


def test_ga_meta_log_no_duplicate_rows_after_append_crash(spark, tmp_path):
    """Crash in the window AFTER _meta_append(gen) but BEFORE
    _save_state(next_gen=gen+1): the resumed run re-evaluates gen and
    must not leave the generation's rows twice in the meta CSV."""
    genes = [Gene("block_size", 4, 48, "int"), Gene("lam", 0.0, 1.0)]
    resume = str(tmp_path / "r.json")
    meta = str(tmp_path / "meta.csv")

    class Bomb(RuntimeError):
        pass

    inner = _toy_fitness_factory()
    ga = GAOptimizer(
        genes=genes, fitness=inner, pop_size=5, n_gens=4, seed=42,
        resume_file=resume, meta_log=meta,
    )
    orig_save = ga._save_state
    calls = {"n": 0}

    def crashing_save(state):
        calls["n"] += 1
        if calls["n"] == 3:  # gen 2's rows are appended, checkpoint is not
            raise Bomb()
        orig_save(state)

    ga._save_state = crashing_save
    import pytest

    with pytest.raises(Bomb):
        ga.optimize(spark)

    ga2 = GAOptimizer(
        genes=genes, fitness=_toy_fitness_factory(), pop_size=5, n_gens=4,
        seed=42, resume_file=resume, meta_log=meta,
    )
    ga2.optimize(spark)
    rows = [ln.strip() for ln in open(meta) if ln.strip()]
    header, body = rows[0], rows[1:]
    assert header.startswith("stage,generation,individual")
    keys = [tuple(ln.split(",")[:3]) for ln in body]
    assert len(keys) == len(set(keys)), "duplicate (stage, gen, idx) rows"
    # every generation that ran is present exactly pop_size times
    gens = {k[1] for k in keys}
    for g in gens:
        assert sum(1 for k in keys if k[1] == g) == 5


def test_stitch_variants_share_regime_path_and_seam_invariants(spark, hybrid):
    """g9_stitch_variants contract: all four smoothing modes walk the
    IDENTICAL seeded regime path (differences attributable to the stitch
    alone); 'none' == 'blend' at lam=0; and the overlap stitches
    (crossfade/ar_bridge) reduce boundary roughness vs 'none'."""
    from synthetic_datagen_spark.regime.hybrid import RegimeBootstrapHybrid

    outs = {}
    for mode, lam in [("none", 0.3), ("blend", 0.3), ("blend", 0.0),
                      ("crossfade", 0.3), ("ar_bridge", 0.3)]:
        h = RegimeBootstrapHybrid(hybrid.model, min_block=4,
                                  smoothing=mode, lam=lam, overlap=3)
        h.pools = hybrid.pools
        rows = h.generate(spark, seed=11, n_samples=80, n_series=2) \
                .orderBy("series_id", "t").collect()
        outs[(mode, lam)] = rows

    regimes = {k: [r.regime for r in v] for k, v in outs.items()}
    base = regimes[("none", 0.3)]
    assert all(v == base for v in regimes.values())  # shared regime path

    # blend with lam=0 leaves block heads untouched == no stitching
    assert [r.price for r in outs[("blend", 0.0)]] == \
           [r.price for r in outs[("none", 0.3)]]
    # blend with lam>0 actually changes something
    assert [r.price for r in outs[("blend", 0.3)]] != \
           [r.price for r in outs[("none", 0.3)]]

    def roughness(rows):
        prices = np.array([r.price for r in rows], dtype=float)
        # per-series consecutive log-return differences
        vals = []
        for sid in {r.series_id for r in rows}:
            p = np.array([r.price for r in rows if r.series_id == sid])
            lr = np.diff(np.log(p))
            vals.append(np.abs(np.diff(lr)))
        return float(np.mean(np.concatenate(vals)))

    r_none = roughness(outs[("none", 0.3)])
    assert roughness(outs[("crossfade", 0.3)]) <= r_none
    assert roughness(outs[("ar_bridge", 0.3)]) <= r_none
