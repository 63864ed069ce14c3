"""CLI four-mode round-trip, plugin registry contract, artifact I/O."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from synthetic_datagen_spark import plugins
from synthetic_datagen_spark.cli import main
from synthetic_datagen_spark.sources import Catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def price_csv(spark, tmp_path_factory):
    """Reference-format CSV (DATE_TIME,typical_price) from events."""
    base = tmp_path_factory.mktemp("cli")
    p = str(base / "prices")
    ev = (
        Catalog(spark, SF)
        .table("events")
        .filter(F.col("event_type") == "click")
        .select(F.col("ts").alias("DATE_TIME"), F.col("value").alias("typical_price"))
        .orderBy("DATE_TIME")
    )
    ev.coalesce(1).write.mode("overwrite").option("header", True).csv(p)
    return p


def test_cli_generate_evaluate_roundtrip(spark, price_csv, tmp_path):
    out_csv = str(tmp_path / "synth")
    r = main(
        [
            "--mode", "generate",
            "--input-file", price_csv,
            "--output-file", out_csv,
            "--generator", "block_bootstrap",
            "--seed", "7",
            "--n-samples", "300",
        ],
        spark=spark,
    )
    assert r["n_samples"] == 300
    ev = main(
        [
            "--mode", "evaluate",
            "--input-file", price_csv,
            "--synthetic-file", out_csv,
        ],
        spark=spark,
    )
    for key in ("js_div", "ks_stat", "std_ratio", "hurst_diff"):
        assert key in ev and np.isfinite(ev[key])
    assert ev["ks_stat"] <= 1.0


def test_cli_train_saves_model(spark, price_csv, tmp_path):
    mf = str(tmp_path / "model.json")
    r = main(
        ["--mode", "train", "--input-file", price_csv, "--model-file", mf,
         "--n-regimes", "3"],
        spark=spark,
    )
    assert r["n_regimes"] == 3 and os.path.exists(mf)
    from synthetic_datagen_spark.regime import RegimeModel

    m = RegimeModel.load(mf)
    assert m.trans.shape == (3, 3)
    assert np.allclose(m.trans.sum(axis=1), 1.0)


def test_cli_optimize_returns_best(spark, price_csv):
    r = main(
        ["--mode", "optimize", "--input-file", price_csv, "--seed", "5"],
        spark=spark,
    )
    assert r["best"] is not None and np.isfinite(r["score"])
    assert 4 <= r["best"]["block_size"] <= 48


def test_cli_config_overlay(spark, price_csv, tmp_path):
    cfg = str(tmp_path / "cfg.json")
    json.dump({"n_samples": 123, "seed": 99}, open(cfg, "w"))
    r = main(
        ["--mode", "generate", "--input-file", price_csv, "--config", cfg,
         "--seed", "7"],  # CLI beats config file; config beats default
        spark=spark,
    )
    assert r["n_samples"] == 123  # from config file


def test_plugin_registry_contract():
    gen = plugins.load_plugin("sdg.generator", "block_bootstrap")
    assert gen.__name__ == "BlockBootstrapGenerator"
    assert "grasynda" in plugins.available("sdg.generator")
    assert "distribution" in plugins.available("sdg.evaluator")
    assert "ga" in plugins.available("sdg.optimizer")
    with pytest.raises(KeyError):
        plugins.load_plugin("sdg.generator", "nope")

    @plugins.register("sdg.generator", "custom_test")
    class Custom(plugins.PluginBase):
        plugin_params = {"alpha": 1}

    c = plugins.load_plugin("sdg.generator", "custom_test")({"beta": 2})
    assert c.config == {"alpha": 1, "beta": 2}
    c.set_params(alpha=5)
    assert c.config["alpha"] == 5


def test_sql_udf_registration(spark):
    plugins.register_sql_functions(spark)
    row = spark.sql(
        "SELECT token_count_py('a b  c') AS n, quality_score_py('hello world.') AS q"
    ).first()
    assert row["n"] == 3 and 0.0 <= row["q"] <= 1.0


def test_decoder_artifact_roundtrip(tmp_path):
    from synthetic_datagen_spark.ml.decoder import LinearDecoder, load_decoder, save_decoder

    dec = LinearDecoder(latent_dim=4, window_rows=8, model_seed=3)
    save_decoder(dec, str(tmp_path / "dec.parts"))
    back = load_decoder(str(tmp_path / "dec.parts"))
    z = np.ones(4)
    assert np.array_equal(dec.decode(z), back.decode(z))


def test_vectorized_udfs_match_row_udfs(spark, sf_smoke):
    """§2.12(b): the Arrow-vectorized pandas UDFs agree with the
    row-at-a-time demonstrators on the real documents table (token
    counts exactly; quality scores to fp tolerance)."""
    from synthetic_datagen_spark.plugins import (
        register_sql_functions,
        register_vectorized_functions,
    )
    from synthetic_datagen_spark.sources import Catalog

    register_sql_functions(spark)
    register_vectorized_functions(spark)
    Catalog(spark, sf_smoke).table("documents").createOrReplaceTempView("docs_udf")
    rows = spark.sql(
        """
        SELECT token_count_py(text) AS tc_row, token_count_vec(text) AS tc_vec,
               quality_score_py(text) AS q_row, quality_score_vec(text) AS q_vec
        FROM docs_udf
        """
    ).collect()
    assert rows
    for r in rows:
        assert r["tc_row"] == r["tc_vec"], (r["tc_row"], r["tc_vec"])
        assert abs(r["q_row"] - r["q_vec"]) < 1e-12, (r["q_row"], r["q_vec"])

    # ADVICE r3 pin: NULL / empty / whitespace-only docs score
    # IDENTICALLY on all three surfaces (column expr, row UDF, pandas
    # UDF) — empty and NULL are 0.0, never NULL or a nonzero artifact
    from pyspark.sql import functions as F

    from synthetic_datagen_spark.functions.text import quality_score

    edge = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "the fox.")], "id LONG, text STRING"
    )
    out = edge.select(
        "id",
        quality_score(F.col("text")).alias("q_col"),
        F.expr("quality_score_py(text)").alias("q_row"),
        F.expr("quality_score_vec(text)").alias("q_vec"),
    ).collect()
    for r in out:
        assert r["q_col"] is not None, r
        assert abs(r["q_col"] - r["q_row"]) < 1e-12, (r["id"], r["q_col"], r["q_row"])
        assert abs(r["q_col"] - r["q_vec"]) < 1e-12, (r["id"], r["q_col"], r["q_vec"])
    assert out[0]["q_col"] == 0.0 and out[1]["q_col"] == 0.0


def test_grouped_agg_ar1_udaf(spark):
    """§2.12(b) grouped-agg pandas UDF: ar1_agg(idx, x) equals the
    window-function AR(1) (corr of x with lag(x) ordered by idx) and is
    partition-order-independent."""
    import numpy as np

    from pyspark.sql import functions as F

    from synthetic_datagen_spark.plugins import register_vectorized_functions

    register_vectorized_functions(spark)
    rng = np.random.default_rng(3)
    rows = []
    for g in range(3):
        v = 0.0
        for i in range(200):
            v = 0.6 * v + rng.normal()
            rows.append((g, i, float(v)))
    df = spark.createDataFrame(rows, "g INT, idx INT, x DOUBLE")
    got = {
        r["g"]: r["ar1"]
        for r in df.groupBy("g").agg(F.expr("ar1_agg(idx, x)").alias("ar1")).collect()
    }
    # reference: numpy corr of ordered series
    import collections

    series = collections.defaultdict(list)
    for g, i, x in rows:
        series[g].append(x)
    for g, xs in series.items():
        a = np.asarray(xs)
        want = float(np.corrcoef(a[1:], a[:-1])[0, 1])
        assert abs(got[g] - want) < 1e-9, (g, got[g], want)
    # shuffled input partitioning: identical results (idx orders inside)
    got2 = {
        r["g"]: r["ar1"]
        for r in df.repartition(7)
        .groupBy("g")
        .agg(F.expr("ar1_agg(idx, x)").alias("ar1"))
        .collect()
    }
    assert got == got2


def test_hurst_agg_matches_distributed_estimator(spark):
    """§4.3 SQL-callable Hurst: the grouped-agg UDAF agrees with the
    distributed hurst_rs pipeline on the same series."""
    import numpy as np

    from pyspark.sql import functions as F

    from synthetic_datagen_spark.functions.distances import hurst_rs
    from synthetic_datagen_spark.plugins import register_vectorized_functions

    register_vectorized_functions(spark)
    rng = np.random.default_rng(11)
    walk = np.cumsum(rng.normal(size=3000))  # random walk: H ≈ 0.5
    rows = [(0, i, float(v)) for i, v in enumerate(100.0 + walk)]
    df = spark.createDataFrame(rows, "g INT, idx INT, x DOUBLE")
    want = hurst_rs(df, "x", ["g"], ["idx"]).first()["hurst"]
    got = df.groupBy("g").agg(F.expr("hurst_agg(idx, x)").alias("h")).first()["h"]
    assert abs(got - want) < 1e-6, (got, want)
    assert 0.3 < got < 0.7  # random walk sanity


def test_cli_deep_trainer_then_generate_from_artifact(spark, price_csv, tmp_path):
    """Reference train→generate flow by plugin name: --mode train
    --trainer gan saves a decoder artifact; --mode generate with
    --model-file generates from it (deterministic in seed)."""
    model_dir = str(tmp_path / "gan_model")
    r = main(
        [
            "--mode", "train",
            "--trainer", "gan",
            "--input-file", price_csv,
            "--model-file", model_dir,
        ],
        spark=spark,
    )
    assert r["trainer"] == "gan" and r["model_file"] == model_dir
    import os

    # v3 MLP artifact layout: layer stack npz + meta
    assert os.path.exists(os.path.join(model_dir, "layers.npz"))
    assert os.path.exists(os.path.join(model_dir, "meta.json"))

    out_csv = str(tmp_path / "from_artifact")
    g = main(
        [
            "--mode", "generate",
            "--generator", "linear_decoder",
            "--input-file", price_csv,
            "--model-file", model_dir,
            "--output-file", out_csv,
            "--seed", "5",
            "--n-samples", "96",
        ],
        spark=spark,
    )
    assert g["n_samples"] == 96
    back = spark.read.option("header", True).csv(out_csv)
    assert back.count() == 96


def test_cli_timegan_train_architecture_keys(spark, price_csv, tmp_path):
    """--mode train --trainer timegan honors the reference's
    architecture config keys (timegan_generator.py:42-43,116-118:
    window_size / hidden_dim / n_layers) and saves the v2 GRU artifact;
    a generate pass decodes from the loaded artifact."""
    cfg = str(tmp_path / "tg.json")
    model_dir = str(tmp_path / "tg_model")
    with open(cfg, "w") as f:
        json.dump(
            {"window_size": 12, "hidden_dim": 6, "n_layers": 1,
             "latent_dim": 4, "epochs": 2, "seed": 3}, f
        )
    r = main(
        [
            "--mode", "train",
            "--trainer", "timegan",
            "--input-file", price_csv,
            "--model-file", model_dir,
            "--config", cfg,
        ],
        spark=spark,
    )
    assert r["trainer"] == "timegan"
    with open(os.path.join(model_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["seq_len"] == 12
    assert meta["hidden_dim"] == 6
    assert meta["n_layers"] == 1
    assert meta["format_version"] == 2

    from synthetic_datagen_spark.ml.timegan import load_timegan

    tg = load_timegan(model_dir)
    z = np.random.default_rng(0).standard_normal((2, 12, 4))
    x = tg.decode(z)
    assert x.shape == (2, 12) and np.all(np.isfinite(x))


def test_cli_predictive_evaluate(spark, price_csv, tmp_path):
    """--mode evaluate --evaluator predictive runs the full A/B protocol
    from two CSVs and emits the reference's metric keys (this path
    previously raised TypeError — signature mismatch)."""
    syn_csv = str(tmp_path / "syn_prices")
    real = spark.read.option("header", True).csv(price_csv)
    real.withColumn(
        "typical_price", F.col("typical_price").cast("double") * 1.01
    ).coalesce(1).write.mode("overwrite").option("header", True).csv(syn_csv)
    r = main(
        [
            "--mode", "evaluate",
            "--evaluator", "predictive",
            "--input-file", price_csv,
            "--synthetic-file", syn_csv,
            # the reference's snake_case flag names (its own tests set
            # window_size explicitly too — the 144 default needs more
            # rows than this fixture has)
            "--window_size", "20",
            "--horizon", "1",
        ],
        spark=spark,
    )
    assert {"baseline_mae_val", "augmented_mae_test", "mae_delta_test",
            "synthetic_helps_test", "mae_pct_change_val",
            "n_real_train", "window_size"} <= set(r)
    assert r["baseline_mae_val"] > 0
    assert r["window_size"] == 20


def test_cli_conditional_generate_uses_continuation_timeline(spark, price_csv, tmp_path):
    """A conditional decoder's cyclical features must be computed on the
    SAME timeline the CLI stamps onto the output CSV (continuation of
    the real series' max ts, 4 h steps) — not the artifact default.
    config["start_dt"] overrides."""
    from synthetic_datagen_spark.cli import _load_series
    from synthetic_datagen_spark.ml.decoder import MlpDecoder, save_decoder

    rng = np.random.default_rng(0)
    hidden = [(rng.normal(0, 0.3, (22, 16)), rng.normal(0, 0.1, 16))]
    out_head = (rng.normal(0, 0.05, (16, 32)), rng.normal(0, 0.01, 32))
    dec = MlpDecoder(
        latent_dim=16, window_rows=32, hidden=hidden, out_head=out_head,
        n_temporal=6,
    )
    model_dir = str(tmp_path / "cond_model")
    save_decoder(dec, model_dir)

    def run(tag, extra_cfg=None):
        cfg = str(tmp_path / f"cfg_{tag}.json")
        with open(cfg, "w") as f:
            json.dump(extra_cfg or {}, f)
        out = str(tmp_path / f"out_{tag}")
        main(
            [
                "--mode", "generate", "--generator", "linear_decoder",
                "--input-file", price_csv, "--model-file", model_dir,
                "--output-file", out, "--seed", "5", "--n-samples", "64",
                "--config", cfg,
            ],
            spark=spark,
        )
        pdf = (
            spark.read.option("header", True).csv(out)
            .orderBy("DATE_TIME").toPandas()
        )
        return list(pdf["typical_price"])

    max_ts = str(_load_series(spark, price_csv).agg(F.max("ts")).first()[0])
    a = run("default")
    b = run("explicit", {"start_dt": max_ts})
    c = run("other", {"start_dt": "1999-01-01 00:00:00"})
    assert a == b, "default start_dt must be the continuation of the input"
    assert a != c, "start_dt must flow into the conditional decode"

    # empty input series → clear driver-side error, not an opaque
    # executor-side pd.Timestamp parse failure on the string "None"
    empty_csv = str(tmp_path / "empty.csv")
    with open(empty_csv, "w") as f:
        f.write("DATE_TIME,typical_price\n")
    with pytest.raises(ValueError, match="input series is empty"):
        main(
            [
                "--mode", "generate", "--generator", "linear_decoder",
                "--input-file", empty_csv, "--model-file", model_dir,
                "--output-file", str(tmp_path / "out_empty"),
                "--seed", "5", "--n-samples", "8",
            ],
            spark=spark,
        )


def test_cli_reference_flag_surface(spark, price_csv, tmp_path):
    """The reference's snake_case flag set (app/cli.py:15-88) works
    end-to-end: --real_data/--output_file/--n_samples aliases,
    --start_datetime/--interval_hours timeline control,
    --save_config effective-config dump, --metrics_file JSON sink,
    multi-file --train_data (S2 union), and explicit
    --real_train/--real_val/--real_test evaluate splits."""
    out_csv = str(tmp_path / "synth_ref")
    cfg_out = str(tmp_path / "effective.json")
    r = main(
        [
            "--mode", "generate",
            "--real_data", price_csv,
            "--output_file", out_csv,
            "--generator", "block_bootstrap",
            "--seed", "7",
            "--n_samples", "50",
            "--start_datetime", "2030-01-01 00:00:00",
            "--interval_hours", "2",
            "--save_config", cfg_out,
        ],
        spark=spark,
    )
    assert r["n_samples"] == 50
    eff = json.load(open(cfg_out))
    assert eff["start_dt"] == "2030-01-01 00:00:00" and eff["interval_hours"] == 2
    pdf = (
        spark.read.option("header", True).csv(out_csv)
        .orderBy("DATE_TIME").toPandas()
    )
    assert pdf["DATE_TIME"].iloc[0] == "2030-01-01T00:00:00.000Z" or str(
        pdf["DATE_TIME"].iloc[0]
    ).startswith("2030-01-01")
    assert str(pdf["DATE_TIME"].iloc[1]).startswith("2030-01-01") and "02:00" in str(
        pdf["DATE_TIME"].iloc[1]
    )

    # multi-file S2 union: split the fixture into two overlapping CSVs
    real = spark.read.option("header", True).csv(price_csv).orderBy("DATE_TIME")
    n = real.count()
    p1, p2 = str(tmp_path / "part1"), str(tmp_path / "part2")
    real.limit(n * 2 // 3).coalesce(1).write.mode("overwrite").option("header", True).csv(p1)
    real.subtract(real.limit(n // 3)).coalesce(1).write.mode("overwrite").option(
        "header", True
    ).csv(p2)
    r2 = main(
        [
            "--mode", "generate",
            "--train_data", p1, p2,
            "--output_file", str(tmp_path / "synth_multi"),
            "--generator", "block_bootstrap",
            "--seed", "7", "--n_samples", "40",
        ],
        spark=spark,
    )
    assert r2["n_samples"] == 40

    # explicit split files + metrics sink for predictive evaluate
    splits = []
    for tag, frac in (("tr", (0.0, 0.6)), ("va", (0.6, 0.8)), ("te", (0.8, 1.0))):
        lo, hi = int(n * frac[0]), int(n * frac[1])
        part = real.limit(hi).subtract(real.limit(lo))
        path = str(tmp_path / f"split_{tag}")
        part.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
        splits.append(path)
    metrics_out = str(tmp_path / "metrics.json")
    r3 = main(
        [
            "--mode", "evaluate", "--evaluator", "predictive",
            "--synthetic_data", price_csv,
            "--real_train", splits[0], "--real_val", splits[1],
            "--real_test", splits[2],
            "--window_size", "12", "--metrics_file", metrics_out,
        ],
        spark=spark,
    )
    assert r3["window_size"] == 12 and r3["baseline_mae_val"] > 0
    sunk = json.load(open(metrics_out))
    assert sunk["baseline_mae_val"] == r3["baseline_mae_val"]


def test_cli_optimizer_selection(spark, price_csv):
    """--optimizer picks the search harness (reference ga_optimizer /
    optimize_staged / optimize_generator families)."""
    r = main(
        ["--mode", "optimize", "--input-file", price_csv, "--seed", "5",
         "--optimizer", "sweep", "--population_size", "4", "--n_generations", "2"],
        spark=spark,
    )
    assert r["optimizer"] == "sweep" and r["evaluated"] <= 8
    assert np.isfinite(r["score"]) and r["best"] is not None


def test_cli_reference_surface_tolerance(tmp_path):
    """The reference CLI parses with parse_known_args (app/cli.py:90) and
    tolerates unknown flags; ours folds them into config. All reference
    flags (app/cli.py:15-88) parse without argparse errors, and the
    reference optimizer plugin name maps to our harness key."""
    from synthetic_datagen_spark.cli import _parse

    cfg = _parse([
        "--mode", "train",
        "--activation", "tanh", "--kl_weight", "0.5", "--l2_reg", "1e-5",
        "--early_patience", "10", "--discriminator_lr", "1e-4",
        "--generator_lr", "2e-4", "--eval_epochs", "3",
        "--eval_batch_size", "64", "--predictor_dir", "/tmp/p",
        "--predictor_root", "/tmp/r", "--optimizer", "ga_optimizer",
        # unknown plugin knob → folded into config, not an error
        "--my_plugin_knob", "7", "--bare_switch",
    ])
    assert cfg["activation"] == "tanh" and cfg["kl_weight"] == 0.5
    assert cfg["eval_epochs"] == 3 and cfg["predictor_root"] == "/tmp/r"
    assert cfg["optimizer"] == "ga"  # ga_optimizer (reference default) -> ga
    assert cfg["my_plugin_knob"] == "7" and cfg["bare_switch"] is True

    with pytest.raises(SystemExit):
        _parse(["--optimizer", "not_a_real_optimizer"])


def test_cli_json_config_null_filter_and_model_keys(tmp_path):
    """A config dumped by the reference's save_config contains BOTH
    save_model ('model.keras') and load_model (null); nulls must not
    clobber defaults, and the two model keys stay distinct
    (cli.py _model_in/_model_out)."""
    from synthetic_datagen_spark.cli import _model_in, _model_out, _parse

    cfg_file = str(tmp_path / "ref_config.json")
    json.dump(
        {"save_model": "model.keras", "load_model": None, "seed": None,
         "block_size": 7},
        open(cfg_file, "w"),
    )
    cfg = _parse(["--config", cfg_file])
    assert cfg["save_model"] == "model.keras"
    assert cfg.get("load_model") is None
    assert cfg["seed"] == 42          # null did NOT overwrite the default
    assert cfg["block_size"] == 7
    assert _model_out(cfg) == "model.keras"   # train saves here
    assert _model_in(cfg) is None             # nothing to load

    # --model-file remains the shared convenience path for both
    cfg2 = _parse(["--model-file", "m.dir"])
    assert _model_in(cfg2) == "m.dir" and _model_out(cfg2) == "m.dir"
    # explicit load/save win over the shared path
    cfg3 = _parse(["--model-file", "m.dir", "--load_model", "in.dir",
                   "--save_model", "out.dir"])
    assert _model_in(cfg3) == "in.dir" and _model_out(cfg3) == "out.dir"
