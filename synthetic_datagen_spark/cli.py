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


def _parse(argv: list[str]) -> dict:
    p = argparse.ArgumentParser(prog="synthetic-datagen-spark")
    p.add_argument("--mode", choices=["train", "generate", "optimize", "evaluate"])
    p.add_argument("--config", help="JSON config file overlaying the defaults")
    p.add_argument("--input-file", help="training/real CSV (DATE_TIME,typical_price)")
    p.add_argument("--synthetic-file", help="synthetic CSV for evaluate mode")
    p.add_argument("--output-file", help="CSV sink (generate) / JSON sink (others)")
    p.add_argument("--model-file", help="model artifact path (train/generate)")
    p.add_argument("--generator")
    p.add_argument("--evaluator")
    p.add_argument(
        "--trainer",
        help="train-mode plugin: regime (HMM+GARCH) or a deep trainer "
        "by registry name (gan / vae_gan / timegan)",
    )
    p.add_argument("--seed", type=int)
    p.add_argument("--n-samples", type=int)
    p.add_argument("--block-size", type=int)
    p.add_argument("--n-regimes", type=int)
    ns = p.parse_args(argv)
    # defaults → JSON file → non-None CLI flags (reference main.py:19-38)
    config = dict(DEFAULT_VALUES)
    if ns.config:
        with open(ns.config) as f:
            config.update(json.load(f))
    config.update({k: v for k, v in vars(ns).items() if v is not None and k != "config"})
    return config


def _load_series(spark, path: str):
    from .sources.csv_io import TYPICAL_PRICE, load_csv

    return load_csv(spark, path, schema=TYPICAL_PRICE).withColumnRenamed(
        "DATE_TIME", "ts"
    ).withColumnRenamed("typical_price", "value").filter("value IS NOT NULL")


def main(argv: list[str] | None = None, spark=None) -> dict:
    """Returns the run's metrics/summary dict (also JSON-dumped when
    --output-file is given for non-generate modes)."""
    from .session import get_spark

    config = _parse(argv if argv is not None else sys.argv[1:])
    spark = spark or get_spark(f"sdg-{config['mode']}")
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

    sink = config.get("output_file")
    if sink and mode != "generate":
        with open(sink, "w") as f:
            json.dump(out, f)  # S4 JSON metrics sink (reference main.py:87-89)
    return out


def _generate(spark, config: dict) -> dict:
    from pyspark.sql import functions as F

    from .plugins import load_plugin
    from .sources.csv_io import save_csv

    df = _load_series(spark, config["input_file"])
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

        if config.get("model_file"):
            # generate from a train-mode artifact (reference flow:
            # train --save-model → generate --load-model)
            from .ml.decoder import load_decoder

            dec = load_decoder(config["model_file"])
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
            kwargs = {"start_dt": start, "interval_hours": 4}
        syn = dec.generate(
            spark, pool, int(config["seed"]), int(config["n_samples"]), **kwargs
        )
        return _sink_series(spark, syn, df, config)
    syn = gen.generate(spark, seed=int(config["seed"]), n_samples=int(config["n_samples"]))
    return _sink_series(spark, syn, df, config)


def _sink_series(spark, syn, train_df, config: dict) -> dict:
    """Attach a 4 h DATE_TIME range continuing the training data
    (reference: typical_price_generator.py:105-108,158) and write CSV."""
    from pyspark.sql import functions as F

    from .sources.csv_io import save_csv

    start = train_df.agg(F.max("ts")).first()[0]
    out = syn.filter(F.col("series_id") == 0).select(
        F.timestamp_add(
            "HOUR", (4 * F.col("t")).cast("int"), F.lit(start).cast("timestamp")
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
        # THE metric (reference predictive_evaluator.py:169-287): the
        # real series chrono-splits into train/val/test (the reference's
        # d4/d5/d6 roles) and the synthetic series augments training
        real = _load_series(spark, config["input_file"])
        syn = _load_series(spark, config["synthetic_file"])
        train, rest = TS.chrono_split(real, 0.6, [], ["ts"])
        val, test = TS.chrono_split(rest, 0.5, [], ["ts"])
        ev = load_plugin("sdg.evaluator", name)(window=20)
        m = ev.evaluate_reference_keys(train, syn, val, test, "value", [], ["ts"])
        return {k: (float(v) if not isinstance(v, bool) else bool(v)) for k, v in m.items()}
    real = _load_series(spark, config["input_file"]).withColumn("tag", F.lit("real"))
    syn = _load_series(spark, config["synthetic_file"]).withColumn("tag", F.lit("syn"))
    both = real.unionByName(syn)
    ev = load_plugin("sdg.evaluator", name)()
    metrics = ev.evaluate(both, "value", "tag", "real", "syn", ["ts"])
    return {k: float(v) for k, v in metrics.items()}


def _train(spark, config: dict) -> dict:
    from pyspark.sql import functions as F

    name = config.get("trainer", "regime")
    df = _load_series(spark, config["input_file"])

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
        out = {"trainer": name, "model_file": config.get("model_file")}
        if name == "timegan":
            from .ml.timegan import save_timegan

            if config.get("model_file"):
                save_timegan(fitted, config["model_file"])
        else:
            if config.get("model_file"):
                save_decoder(fitted, config["model_file"])
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
    if config.get("model_file"):
        model.save(config["model_file"])
    return {
        "n_regimes": model.n_regimes,
        "model_file": config.get("model_file"),
        "regime_counts": {str(k): v["n"] for k, v in model.stats.items()},
    }


def _optimize(spark, config: dict) -> dict:
    import numpy as np
    from pyspark.sql import functions as F

    from .functions import timeseries as TS
    from .optimize import GAOptimizer, Gene, moment_match_fitness

    df = _load_series(spark, config["input_file"])
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
    ga = GAOptimizer(
        genes=[Gene("block_size", 4, 48, "int"), Gene("lam", 0.0, 1.0)],
        fitness=fitness,
        pop_size=int(config["pop_size"]),
        n_gens=int(config["n_gens"]),
        seed=int(config["seed"]),
    )
    res = ga.optimize(spark)
    return {"best": res["best"], "score": res["score"], "gens_run": len(res["history"])}
