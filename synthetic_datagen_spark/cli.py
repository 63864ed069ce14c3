"""CLI — the reference's four modes on Spark
(reference: app/main.py:47-90 train/generate/optimize/evaluate,
app/cli.py:7-90 argparse, app/config.py DEFAULT_VALUES → JSON config
overlay → non-None CLI overlay, app/main.py:19-38).

Input/output format matches the reference: header CSV with
``DATE_TIME,typical_price`` columns (README.md:130-136), so a user of
the reference can point this CLI at the same files.

  python -m synthetic_datagen_spark --mode generate \
      --input-file prices.csv --output-file synth.csv \
      --generator block_bootstrap --seed 42 --n-samples 1575
"""

from __future__ import annotations

import argparse
import json
import sys

DEFAULT_VALUES: dict = {
    "mode": "generate",
    "generator": "block_bootstrap",
    "evaluator": "distribution",
    "trainer": "regime",
    "seed": 42,
    "n_samples": 1575,  # one forex year of 4 h bars (reference config.py:61)
    "block_size": 30,
    "n_states": 10,
    "n_regimes": 4,
    "window_size": 144,  # reference config.py:32
    "pop_size": 12,
    "n_gens": 4,
}


# reference-flag → canonical-config-key aliases (app/cli.py:15-88 —
# the full snake_case surface, so a reference invocation runs unchanged).
# load_model / save_model stay DISTINCT keys (the reference's save_config
# dumps both; collapsing them would let a null load_model clobber the
# save path) and are resolved per mode via _model_in/_model_out.
_ALIASES = {
    "real_data": "input_file",
    "synthetic_data": "synthetic_file",
    "model": "load_model",
    "start_datetime": "start_dt",
    "population_size": "pop_size",
    "n_generations": "n_gens",
    "load_config": "config",
    "d4_file": "real_train",
    "d5_file": "real_val",
    "d6_file": "real_test",
}

# reference optimizer plugin / script names → our harness keys
# (pyproject.toml:43-44 registers "ga_optimizer"; optimize_staged.py and
# optimize_generator.py are the staged / random-sweep scripts)
_OPTIMIZER_NAMES = {
    "ga": "ga",
    "staged": "staged",
    "sweep": "sweep",
    "ga_optimizer": "ga",
    "staged_optimizer": "staged",
    "optimize_staged": "staged",
    "optimize_generator": "sweep",
    "random_sweep": "sweep",
}


def _parse(argv: list[str]) -> dict:
    p = argparse.ArgumentParser(prog="synthetic-datagen-spark")
    p.add_argument("--mode", choices=["train", "generate", "optimize", "evaluate"])
    p.add_argument("--config", "--load_config", help="JSON config overlaying the defaults")
    p.add_argument("--input-file", "--real_data", help="training/real CSV (DATE_TIME,typical_price)")
    p.add_argument("--train-data", "--train_data", nargs="+",
                   help="one or more training CSVs (multi-file union+sort+dedup, S2)")
    p.add_argument("--synthetic-file", "--synthetic_data", help="synthetic CSV for evaluate mode")
    p.add_argument("--output-file", "--output_file", help="CSV sink (generate) / JSON sink (others)")
    p.add_argument("--metrics-file", "--metrics_file", help="JSON metrics sink (reference main.py:87-89)")
    p.add_argument("--model-file",
                   help="model artifact path for both load and save (convenience)")
    p.add_argument("--load-model", "--load_model", "--model", dest="load_model",
                   help="model artifact to load (generate; reference app/cli.py:45)")
    p.add_argument("--save-model", "--save_model", dest="save_model",
                   help="model artifact to save (train; reference app/cli.py:44)")
    p.add_argument("--generator")
    p.add_argument("--evaluator")
    p.add_argument(
        "--trainer",
        help="train-mode plugin: regime (HMM+GARCH) or a deep trainer "
        "by registry name (gan / vae_gan / timegan)",
    )
    p.add_argument("--optimizer",
                   help="optimize-mode search harness: ga / staged / sweep, or a "
                   "reference plugin name (ga_optimizer, optimize_staged, optimize_generator)")
    p.add_argument("--seed", type=int)
    p.add_argument("--n-samples", "--n_samples", type=int)
    p.add_argument("--block-size", "--block_size", type=int)
    p.add_argument("--n-regimes", "--n_regimes", type=int)
    # training hyperparameters (reference app/cli.py:48-66)
    p.add_argument("--window-size", "--window_size", type=int)
    p.add_argument("--epochs", type=int)
    p.add_argument("--batch-size", "--batch_size", type=int)
    p.add_argument("--learning-rate", "--learning_rate", type=float)
    p.add_argument("--latent-dim", "--latent_dim", type=int)
    p.add_argument("--intermediate-layers", "--intermediate_layers", type=int)
    p.add_argument("--initial-layer-size", "--initial_layer_size", type=int)
    p.add_argument("--layer-size-divisor", "--layer_size_divisor", type=int)
    p.add_argument("--kl-anneal-epochs", "--kl_anneal_epochs", type=int)
    p.add_argument("--mmd-lambda", "--mmd_lambda", type=float)
    p.add_argument("--use-returns", "--use_returns", type=lambda s: s not in ("0", "False", "false"))
    # remaining reference training knobs (app/cli.py:53-66)
    p.add_argument("--activation")
    p.add_argument("--kl-weight", "--kl_weight", type=float)
    p.add_argument("--l2-reg", "--l2_reg", type=float)
    p.add_argument("--early-patience", "--early_patience", type=int)
    p.add_argument("--discriminator-lr", "--discriminator_lr", type=float)
    p.add_argument("--generator-lr", "--generator_lr", type=float)
    p.add_argument("--hidden-dim", "--hidden_dim", type=int)
    p.add_argument("--n-layers", "--n_layers", type=int)
    # evaluate-mode split files + predictor params (app/cli.py:31-41,79-83)
    p.add_argument("--real-train", "--real_train", "--d4_file")
    p.add_argument("--real-val", "--real_val", "--d5_file")
    p.add_argument("--real-test", "--real_test", "--d6_file")
    p.add_argument("--horizon", type=int)
    p.add_argument("--baseline-file", "--baseline_file")
    p.add_argument("--predictor-dir", "--predictor_dir")
    p.add_argument("--predictor-root", "--predictor_root")
    p.add_argument("--eval-epochs", "--eval_epochs", type=int)
    p.add_argument("--eval-batch-size", "--eval_batch_size", type=int)
    # generate-mode timeline (app/cli.py:71-72)
    p.add_argument("--start-datetime", "--start_datetime", dest="start_dt")
    p.add_argument("--interval-hours", "--interval_hours", type=int)
    # optimize-mode budget (app/cli.py:75-76)
    p.add_argument("--pop-size", "--population_size", type=int)
    p.add_argument("--n-gens", "--n_generations", type=int)
    # config/meta (app/cli.py:86-88)
    p.add_argument("--save-config", "--save_config")
    p.add_argument("--log-level", "--log_level")
    # the reference tolerates unknown flags (app/cli.py:90
    # parse_known_args); fold any leftover --snake_case pairs into the
    # config so plugin-specific knobs pass through unchanged
    ns, extra = p.parse_known_args(argv)
    # defaults → JSON file → non-None CLI flags (reference main.py:19-38)
    config = dict(DEFAULT_VALUES)
    if ns.config:
        with open(ns.config) as f:
            loaded = json.load(f)
        # JSON configs may use the reference's key names too; the
        # reference's own save_config dumps EVERY key incl. nulls
        # (e.g. load_model: null) — None values must not clobber
        # defaults or sibling keys, mirroring the CLI's None-filter
        config.update(
            {_ALIASES.get(k, k): v for k, v in loaded.items() if v is not None}
        )
    config.update({k: v for k, v in vars(ns).items() if v is not None and k != "config"})
    config.update(_fold_unknown(extra))
    if config.get("optimizer"):
        name = str(config["optimizer"])
        if name not in _OPTIMIZER_NAMES:
            raise SystemExit(
                f"unknown optimizer {name!r}; expected one of "
                f"{sorted(set(_OPTIMIZER_NAMES))}"
            )
        config["optimizer"] = _OPTIMIZER_NAMES[name]
    return config


def _fold_unknown(extra: list[str]) -> dict:
    """``--some_flag value`` / ``--flag=value`` pairs left over by
    parse_known_args → config entries (value-less flags become True)."""
    out: dict = {}
    i = 0
    while i < len(extra):
        tok = extra[i]
        i += 1
        if not tok.startswith("--"):
            continue
        key = tok[2:]
        if "=" in key:
            key, val = key.split("=", 1)
        elif i < len(extra) and not extra[i].startswith("--"):
            val = extra[i]
            i += 1
        else:
            val = True
        out[_ALIASES.get(key.replace("-", "_"), key.replace("-", "_"))] = val
    return out


def _model_in(config: dict):
    """Artifact to LOAD (generate/evaluate): --load_model wins, then the
    shared --model-file convenience path."""
    return config.get("load_model") or config.get("model_file")


def _model_out(config: dict):
    """Artifact to SAVE (train): --save_model wins, then --model-file."""
    return config.get("save_model") or config.get("model_file")


def _load_series(spark, path):
    """One CSV path → series frame; a LIST of paths runs the reference's
    multi-file union + time-sort + keep-first dedup (S2,
    data_processor.py:27-34)."""
    from .sources.csv_io import TYPICAL_PRICE, load_csv, load_multiple_csv

    if isinstance(path, (list, tuple)):
        df = (
            load_multiple_csv(spark, list(path), schema=TYPICAL_PRICE)
            if len(path) > 1
            else load_csv(spark, path[0], schema=TYPICAL_PRICE)
        )
    else:
        df = load_csv(spark, path, schema=TYPICAL_PRICE)
    return df.withColumnRenamed("DATE_TIME", "ts").withColumnRenamed(
        "typical_price", "value"
    ).filter("value IS NOT NULL")


def _input(config: dict):
    """--train_data (multi-file) takes precedence over --input-file."""
    return config.get("train_data") or config["input_file"]


def main(argv: list[str] | None = None, spark=None) -> dict:
    """Returns the run's metrics/summary dict (also JSON-dumped when
    --output-file is given for non-generate modes)."""
    from .session import get_spark

    config = _parse(argv if argv is not None else sys.argv[1:])
    spark = spark or get_spark(f"sdg-{config['mode']}")
    if config.get("log_level"):
        spark.sparkContext.setLogLevel(str(config["log_level"]).upper())
    if config.get("save_config"):
        # reference app/main.py save_config: dump the EFFECTIVE config
        with open(config["save_config"], "w") as f:
            json.dump({k: v for k, v in config.items() if k != "save_config"}, f, indent=2)
    mode = config["mode"]
    out: dict = {"mode": mode}

    if mode == "generate":
        out.update(_generate(spark, config))
    elif mode == "evaluate":
        out.update(_evaluate(spark, config))
    elif mode == "train":
        out.update(_train(spark, config))
    elif mode == "optimize":
        out.update(_optimize(spark, config))

    # S4 JSON metrics sink (reference main.py:87-89; --metrics_file is
    # the reference's name, --output-file kept for non-generate modes)
    for sink in {config.get("metrics_file"), config.get("output_file") if mode != "generate" else None}:
        if sink:
            with open(sink, "w") as f:
                json.dump(out, f)
    return out


def _generate(spark, config: dict) -> dict:
    from pyspark.sql import functions as F

    from .plugins import load_plugin
    from .sources.csv_io import save_csv

    df = _load_series(spark, _input(config))
    name = config["generator"]
    cls = load_plugin("sdg.generator", name)
    if name == "block_bootstrap":
        gen = cls(block_size=int(config["block_size"]))
        gen.fit(df, "value", ["ts"])
    elif name == "grasynda":
        gen = cls(n_states=int(config["n_states"]))
        gen.fit(df, "value", ["ts"])
    else:  # linear_decoder — fresh, or a trained artifact via --model-file
        import numpy as np

        if _model_in(config):
            # generate from a train-mode artifact (reference flow:
            # train --save-model → generate --load-model)
            from .ml.decoder import load_decoder

            dec = load_decoder(_model_in(config))
        else:
            dec = cls(window_rows=32)
        pool = np.array([r[0] for r in df.select("value").limit(4000).collect()])
        kwargs = {}
        if getattr(dec, "n_temporal", 0):
            # conditional decoder: its cyclical time features must be
            # computed on the SAME timeline _sink_series stamps onto the
            # output (continuing the real series' max ts at 4 h steps) —
            # otherwise the output is decoded for one season but labeled
            # with another. config["start_dt"] overrides.
            start = config.get("start_dt")
            if not start:
                max_ts = df.agg(F.max("ts")).first()[0]
                if max_ts is None:
                    raise ValueError(
                        "input series is empty (or all-null ts): cannot "
                        "derive a start timestamp for the conditional "
                        "decoder; pass start_dt explicitly"
                    )
                start = str(max_ts)
            kwargs = {
                "start_dt": start,
                "interval_hours": int(config.get("interval_hours", 4)),
            }
        syn = dec.generate(
            spark, pool, int(config["seed"]), int(config["n_samples"]), **kwargs
        )
        return _sink_series(spark, syn, df, config)
    syn = gen.generate(spark, seed=int(config["seed"]), n_samples=int(config["n_samples"]))
    return _sink_series(spark, syn, df, config)


def _sink_series(spark, syn, train_df, config: dict) -> dict:
    """Attach an interval_hours DATE_TIME range continuing the training
    data — or starting at --start_datetime when given (reference:
    typical_price_generator.py:105-108,158) — and write CSV."""
    from pyspark.sql import functions as F

    from .sources.csv_io import save_csv

    step = int(config.get("interval_hours", 4))
    start = config.get("start_dt") or train_df.agg(F.max("ts")).first()[0]
    out = syn.filter(F.col("series_id") == 0).select(
        F.timestamp_add(
            "HOUR", (step * F.col("t")).cast("int"), F.lit(start).cast("timestamp")
        ).alias("DATE_TIME"),
        F.col("price").alias("typical_price"),
    )
    n = out.count()
    if config.get("output_file"):
        save_csv(out.orderBy("DATE_TIME"), config["output_file"], single_file=True)
    return {"n_samples": n, "output_file": config.get("output_file")}


def _evaluate(spark, config: dict) -> dict:
    from pyspark.sql import functions as F

    from .functions import timeseries as TS
    from .plugins import load_plugin

    name = config["evaluator"]
    if name == "predictive":
        # THE metric (reference predictive_evaluator.py:169-287).
        # Explicit --real_train/--real_val/--real_test (the reference's
        # d4/d5/d6 files) win; otherwise the real series chrono-splits
        # into train/val/test. The synthetic series augments training.
        syn = _load_series(spark, config["synthetic_file"])
        if config.get("real_train") and config.get("real_val") and config.get("real_test"):
            train = _load_series(spark, config["real_train"])
            val = _load_series(spark, config["real_val"])
            test = _load_series(spark, config["real_test"])
        else:
            real = _load_series(spark, _input(config))
            train, rest = TS.chrono_split(real, 0.6, [], ["ts"])
            val, test = TS.chrono_split(rest, 0.5, [], ["ts"])
        ev = load_plugin("sdg.evaluator", name)(
            # reference default window_size=144 (app/config.py:32) —
            # always present via DEFAULT_VALUES, overridable per run
            window=int(config["window_size"]),
            horizon=int(config.get("horizon") or 1),
        )
        m = ev.evaluate_reference_keys(train, syn, val, test, "value", [], ["ts"])
        return {k: (float(v) if not isinstance(v, bool) else bool(v)) for k, v in m.items()}
    real = _load_series(spark, _input(config)).withColumn("tag", F.lit("real"))
    syn = _load_series(spark, config["synthetic_file"]).withColumn("tag", F.lit("syn"))
    both = real.unionByName(syn)
    ev = load_plugin("sdg.evaluator", name)()
    metrics = ev.evaluate(both, "value", "tag", "real", "syn", ["ts"])
    return {k: float(v) for k, v in metrics.items()}


def _train(spark, config: dict) -> dict:
    from pyspark.sql import functions as F

    name = config.get("trainer", "regime")
    df = _load_series(spark, _input(config))

    if name != "regime":
        # deep trainer by plugin name — the reference's train mode
        # (main.py:47-60 resolves sdg.trainer entry points: vae / gan /
        # vae-gan / timegan) with the shared prepare → fit → save flow
        from .ml.decoder import save_decoder
        from .plugins import load_plugin

        cls = load_plugin("sdg.trainer", name)
        kw = {
            "window_rows": int(config.get("window_size", 32)),
            "latent_dim": int(config.get("latent_dim", 16)),
            "train_seed": int(config["seed"]),
            "epochs": int(config.get("epochs", 20)),
        }
        # reference architecture/loss knobs (app/cli.py:48-62) → trainer
        # kwargs where the trainer takes them
        if name != "timegan":
            if "mmd_lambda" in config:
                kw["mmd_lambda"] = float(config["mmd_lambda"])
            if "kl_anneal_epochs" in config:
                kw["kl_anneal_epochs"] = int(config["kl_anneal_epochs"])
            if "use_returns" in config:
                kw["use_returns"] = bool(config["use_returns"])
            if "initial_layer_size" in config:
                # Dense stack sized initial_layer_size → //divisor per
                # layer × intermediate_layers (vae_gan_trainer.py:46-103)
                size = int(config["initial_layer_size"])
                div = int(config.get("layer_size_divisor", 2)) or 1
                n_layers = int(config.get("intermediate_layers", 2))
                hidden = []
                for _ in range(max(1, n_layers)):
                    hidden.append(max(size, 2))
                    size //= div
                kw["hidden"] = tuple(hidden)
        # reference architecture keys (timegan_generator.py:42-43:
        # hidden_dim=24, n_layers=3) pass through to trainers that
        # take them
        if name == "timegan":
            if "hidden_dim" in config:
                kw["hidden_dim"] = int(config["hidden_dim"])
            if "n_layers" in config:
                kw["n_layers"] = int(config["n_layers"])
        tr = cls(**kw)
        tr.prepare([df.select("ts", "value")], "value", "ts")
        fitted = tr.fit()
        out = {"trainer": name, "model_file": _model_out(config)}
        if name == "timegan":
            from .ml.timegan import save_timegan

            if _model_out(config):
                save_timegan(fitted, _model_out(config))
        else:
            if _model_out(config):
                save_decoder(fitted, _model_out(config))
            hist = getattr(tr.vae, "loss_history", None) or getattr(
                tr.vae, "g_loss_history", []
            )
            if hist:
                out["final_loss"] = float(hist[-1])
        return out

    from .regime import RegimeModel, regime_features

    feats = regime_features(df, "value", [], ["ts"]).withColumn("series", F.lit(0))
    model = RegimeModel(
        n_regimes=int(config["n_regimes"]), seed=int(config["seed"])
    ).fit(feats, ["series"])
    if _model_out(config):
        model.save(_model_out(config))
    return {
        "n_regimes": model.n_regimes,
        "model_file": _model_out(config),
        "regime_counts": {str(k): v["n"] for k, v in model.stats.items()},
    }


def _optimize(spark, config: dict) -> dict:
    import numpy as np
    from pyspark.sql import functions as F

    from .functions import timeseries as TS
    from .optimize import GAOptimizer, Gene, moment_match_fitness

    df = _load_series(spark, _input(config))
    rets = TS.log_returns(df, "value", [], ["ts"])
    panel = rets.agg(
        F.mean("log_ret").alias("mean"), F.stddev_pop("log_ret").alias("std")
    ).first()
    ac1 = TS.lag_autocorr(rets, "log_ret", 1, [], ["ts"]).first()[0]
    pool = np.array(
        [r[0] for r in rets.select("log_ret").dropna().orderBy("ts").limit(4000).collect()]
    )
    fitness = moment_match_fitness(
        pool, {"mean": panel["mean"], "std": panel["std"], "ac1": float(ac1 or 0.0)},
        n_samples=256, n_seeds=2, base_seed=int(config["seed"]),
    )
    genes = [Gene("block_size", 4, 48, "int"), Gene("lam", 0.0, 1.0)]
    harness = config.get("optimizer", "ga")
    if harness == "sweep":
        # reference optimize_generator.py:17-50 random sweep + early stop
        from .optimize.sweep import random_sweep

        res = random_sweep(
            spark, genes, fitness,
            n_configs=int(config["pop_size"]) * int(config["n_gens"]),
            batch=int(config["pop_size"]), seed=int(config["seed"]),
        )
        return {"optimizer": harness, "best": res["best"], "score": res["score"],
                "evaluated": res["evaluated"]}
    if harness == "staged":
        # reference optimize_staged.py:55-383 elite staged search
        from .optimize import Stage, StagedOptimizer

        opt = StagedOptimizer(
            genes=genes,
            fitness_factory=lambda weights: fitness,
            stages=[
                Stage("broad", pop_size=int(config["pop_size"]),
                      n_gens=int(config["n_gens"]), mut_sigma=0.3),
                Stage("polish", pop_size=max(4, int(config["pop_size"]) // 2),
                      n_gens=int(config["n_gens"]), mut_sigma=0.1),
            ],
            seed=int(config["seed"]),
        )
        res = opt.optimize(spark)
        return {"optimizer": harness, "best": res["best"], "score": res["score"],
                "stages_run": len(res["stages"])}
    ga = GAOptimizer(
        genes=genes,
        fitness=fitness,
        pop_size=int(config["pop_size"]),
        n_gens=int(config["n_gens"]),
        seed=int(config["seed"]),
    )
    res = ga.optimize(spark)
    return {"optimizer": harness, "best": res["best"], "score": res["score"],
            "gens_run": len(res["history"])}
