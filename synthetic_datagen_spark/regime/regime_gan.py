"""M9/G10 — per-regime generator training + regime-chained sampling
(reference: regime_gan.py:128-218 trains one GAN per regime on that
regime's return windows; :339-380 samples a Markov regime chain and
emits a GAN window — or a parametric N(μ_k, σ_k) fallback for sparse
regimes — per segment).

Spark-first shape: per-regime training is embarrassingly parallel —
ONE grouped-map task per regime (`groupBy("regime").applyInPandas`)
trains that regime's model on its own return windows and returns the
fitted weights as a tiny long-form frame; regimes with too little data
return nothing and fall back to the parametric path, exactly the
reference's `None` generator contract. Torch is absent here, so the
per-regime model is the numpy-SGD adversarial linear VAE (ml/vae.py) —
same fit(windows)→decode(z) contract as the reference's per-regime GAN,
trained with a per-regime derived seed so the whole model is a pure
function of (labels, seed).

Generation mirrors regime_gan.generate: per synthetic series (one
grouped-map task, splitmix-seeded), walk the transition chain; each
segment emits a decoded window denormalized by the regime's (mean, std)
or a parametric normal draw for fallback regimes; prices rebuild as
exp(cumsum).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..generators.seeds import derive_seed
from .model import RegimeModel


@dataclass
class RegimeGanModel:
    n_regimes: int
    seq_len: int
    trans: np.ndarray
    start: np.ndarray
    stats: dict[int, dict]
    # per-regime decoder: regime -> dict(w: L×S, b: S, mean, std) — absent
    # key = sparse regime = parametric fallback (reference's None slot)
    decoders: dict[int, dict] = field(default_factory=dict)
    latent_dim: int = 8


class RegimeGanTrainer:
    """Fit per-regime generators from a labeled RegimeModel."""

    def __init__(
        self,
        model: RegimeModel,
        seq_len: int = 32,
        latent_dim: int = 8,
        epochs: int = 30,
        min_windows: int = 4,
        max_windows: int = 2048,
        seed: int = 42,
    ):
        self.model = model
        self.seq_len = seq_len
        self.latent_dim = latent_dim
        self.epochs = epochs
        self.min_windows = min_windows
        self.max_windows = max_windows
        self.seed = seed

    def fit(self) -> RegimeGanModel:
        if self.model.labeled is None:
            raise RuntimeError("RegimeModel not fitted")
        S, L = self.seq_len, self.latent_dim
        epochs, min_w, max_w, base_seed = (
            self.epochs, self.min_windows, self.max_windows, self.seed,
        )
        rr = self.model.labeled.select("regime", "idx", "log_ret")

        def train_one(pdf: pd.DataFrame) -> pd.DataFrame:
            from ..ml.vae import LinearVae

            regime = int(pdf["regime"].iloc[0])
            rets = pdf.sort_values("idx")["log_ret"].to_numpy(dtype=float)
            # reference windowing: stride seq_len//2, densify if sparse
            # (regime_gan.py:167-176)
            wins = [
                rets[i : i + S] for i in range(0, len(rets) - S + 1, max(S // 2, 1))
            ]
            if len(wins) < min_w:
                wins = [rets[i : i + S] for i in range(0, len(rets) - S + 1)]
            if len(wins) < min_w:
                return pd.DataFrame({"regime": [], "kind": [], "i": [], "j": [], "val": []})
            X = np.array(wins[:max_w])
            mean, std = float(X.mean()), float(X.std()) + 1e-10
            vae = LinearVae(
                window_rows=S,
                latent_dim=L,
                adversarial=True,
                epochs=epochs,
                train_seed=derive_seed(base_seed, regime),
            ).fit((X - mean) / std)
            w, b = vae.decoder_weights()
            rows = [("w", i, j, float(w[i, j])) for i in range(L) for j in range(S)]
            rows += [("b", 0, j, float(b[j])) for j in range(S)]
            rows += [("norm", 0, 0, mean), ("norm", 0, 1, std)]
            out = pd.DataFrame(rows, columns=["kind", "i", "j", "val"])
            out.insert(0, "regime", regime)
            return out

        parts = (
            rr.groupBy("regime")
            .applyInPandas(
                train_one, "regime int, kind string, i int, j int, val double"
            )
            .collect()
        )
        decoders: dict[int, dict] = {}
        for r in parts:
            d = decoders.setdefault(
                int(r["regime"]),
                {"w": np.zeros((L, S)), "b": np.zeros(S), "mean": 0.0, "std": 1.0},
            )
            if r["kind"] == "w":
                d["w"][r["i"], r["j"]] = r["val"]
            elif r["kind"] == "b":
                d["b"][r["j"]] = r["val"]
            elif r["kind"] == "norm":
                if r["j"] == 0:
                    d["mean"] = r["val"]
                else:
                    d["std"] = r["val"]
        return RegimeGanModel(
            n_regimes=self.model.n_regimes,
            seq_len=S,
            trans=self.model.trans,
            start=self.model.start,
            stats=self.model.stats,
            decoders=decoders,
            latent_dim=L,
        )


def save_regime_gan(model: RegimeGanModel, path: str) -> None:
    """S7 — the reference's artifact layout (regime_gan.py:233-252):
    ``meta.json`` beside one torch-format ``gen_regime_{k}.pt`` per
    trained regime, each holding ``{"state_dict", "data_mean",
    "data_std"}``. The .pt files are real zip-format torch checkpoints
    (ml/torch_io.py) and the state_dict uses the reference Generator's
    ``net.<i>.weight`` key schema in torch's (out, in) orientation, so
    ``nn.Sequential(nn.Linear(z_dim, seq_len))`` loads ours directly.
    DEPTH differs by declaration: the reference Generator is a 4-Linear
    stack (regime_gan.py:128-144) while this trainer fits a single
    linear decoder — load_regime_gan maps EITHER schema (deep reference
    artifacts included), see MIGRATION.md."""
    import json
    import os

    from collections import OrderedDict

    from ..ml.torch_io import save_torch_checkpoint

    os.makedirs(path, exist_ok=True)
    meta = {
        "n_regimes": model.n_regimes,
        "transitions": model.trans.tolist(),
        "regime_stats": [
            model.stats.get(k, {}) for k in range(model.n_regimes)
        ],
        "seq_len": model.seq_len,
        "z_dim": model.latent_dim,
        "start": model.start.tolist(),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    for k, dec in model.decoders.items():
        save_torch_checkpoint(
            {
                "state_dict": OrderedDict(
                    [
                        # torch nn.Linear orientation: (out_features, in_features)
                        ("net.0.weight", np.ascontiguousarray(dec["w"].T)),
                        ("net.0.bias", dec["b"]),
                    ]
                ),
                "data_mean": float(dec["mean"]),
                "data_std": float(dec["std"]),
            },
            os.path.join(path, f"gen_regime_{k}.pt"),
        )


# activation pattern of the reference Generator's nn.Sequential
# (regime_gan.py:133-141): Linear → LeakyReLU(0.2) → Linear →
# LeakyReLU(0.2) → Linear → Tanh → Linear. Keyed by the module indices
# the Linears occupy in the Sequential.
_REF_GENERATOR_ACTS = {(0,): ("none",), (0, 2, 4, 6): ("lrelu", "lrelu", "tanh", "none")}


def _decoder_from_state_dict(sd) -> dict | None:
    """Map a generator state_dict to a decoder slot dict.

    Accepts the legacy flat schema (``decoder.weight`` in (latent, seq)
    orientation), the single-Linear ``net.0.*`` schema this writer
    emits, and the reference's 4-Linear ``net.0/2/4/6.*`` schema
    (torch (out, in) orientation — transposed on load). Unknown
    architectures return None = parametric fallback, the reference's
    None-generator contract (ADVICE r3: a real reference artifact must
    load, not KeyError)."""
    if "decoder.weight" in sd:
        return {
            "w": np.asarray(sd["decoder.weight"], dtype=np.float64),
            "b": np.asarray(sd["decoder.bias"], dtype=np.float64),
        }
    idxs = tuple(
        sorted(
            int(k.split(".")[1])
            for k in sd
            if k.startswith("net.") and k.endswith(".weight")
        )
    )
    acts = _REF_GENERATOR_ACTS.get(idxs)
    if acts is None:
        return None
    layers = [
        (
            np.asarray(sd[f"net.{i}.weight"], dtype=np.float64).T,  # → (in, out)
            np.asarray(sd[f"net.{i}.bias"], dtype=np.float64),
            act,
        )
        for i, act in zip(idxs, acts)
    ]
    if len(layers) == 1:  # single Linear: keep the fast flat path
        return {"w": layers[0][0], "b": layers[0][1]}
    return {"net": layers}


def _decode_z(dec: dict, z: np.ndarray) -> np.ndarray:
    """Run a decoder slot: flat linear or deep reference stack."""
    if "net" in dec:
        h = z
        for W, b, act in dec["net"]:
            h = h @ W + b
            if act == "lrelu":
                h = np.where(h > 0.0, h, 0.2 * h)
            elif act == "tanh":
                h = np.tanh(h)
        return h
    return z @ dec["w"] + dec["b"]


def load_regime_gan(path: str) -> RegimeGanModel:
    """Load a reference-layout artifact dir; absent gen_regime_{k}.pt =
    sparse regime = parametric fallback (the reference's None slot).
    Reads artifacts from this writer AND from the reference's torch
    writer (deep net.* Generators map with transposition; an
    unrecognized architecture degrades to the parametric fallback
    instead of raising)."""
    import json
    import os

    from ..ml.torch_io import load_torch_checkpoint

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    k_total = meta["n_regimes"]
    decoders: dict[int, dict] = {}
    for k in range(k_total):
        pt = os.path.join(path, f"gen_regime_{k}.pt")
        if not os.path.exists(pt):
            continue
        ckpt = load_torch_checkpoint(pt)
        slot = _decoder_from_state_dict(ckpt["state_dict"])
        if slot is None:
            continue
        slot["mean"] = float(ckpt["data_mean"])
        slot["std"] = float(ckpt["data_std"])
        decoders[k] = slot
    stats = {
        i: s for i, s in enumerate(meta["regime_stats"]) if s
    }
    start = np.array(
        meta.get("start", [1.0 / k_total] * k_total), dtype=np.float64
    )
    return RegimeGanModel(
        n_regimes=k_total,
        seq_len=meta["seq_len"],
        trans=np.array(meta["transitions"], dtype=np.float64),
        start=start,
        stats=stats,
        decoders=decoders,
        latent_dim=meta["z_dim"],
    )


def generate(
    model: RegimeGanModel,
    spark: SparkSession,
    seed: int,
    n_samples: int,
    n_series: int = 1,
    p0: float = 100.0,
    quantize_sig: int | None = None,
) -> DataFrame:
    """Regime-chained sampling (reference regime_gan.py:339-380):
    per-series grouped-map walk; decoded windows for trained regimes,
    parametric N(μ_k, σ_k) for fallback regimes. ``quantize_sig``:
    opt-in output quantization for the pinned-oracle boundary (see
    ml/decoder.quantize_sig_digits)."""
    S, L, K = model.seq_len, model.latent_dim, model.n_regimes
    trans_cum = np.cumsum(model.trans, axis=1)
    start_cum = np.cumsum(model.start)
    stats = model.stats
    decs = model.decoders

    schema = T.StructType(
        [
            T.StructField("series_id", T.LongType()),
            T.StructField("t", T.LongType()),
            T.StructField("regime", T.IntegerType()),
            T.StructField("price", T.DoubleType()),
        ]
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for sid in pdf["id"]:
            rng = np.random.default_rng(derive_seed(seed, int(sid)))
            regime = min(
                int(np.searchsorted(start_cum, rng.random(), side="right")), K - 1
            )
            rets: list[np.ndarray] = []
            regs: list[np.ndarray] = []
            remaining = n_samples
            while remaining > 0:
                chunk = min(S, remaining)
                dec = decs.get(regime)
                if dec is not None and chunk == S:
                    z = rng.standard_normal(L)
                    r = _decode_z(dec, z) * dec["std"] + dec["mean"]
                else:
                    st = stats.get(regime, {"mu": 0.0, "sigma": 1e-3})
                    r = rng.normal(st["mu"], st["sigma"] or 1e-10, chunk)
                rets.append(r[:chunk])
                regs.append(np.full(chunk, regime, dtype=np.int32))
                remaining -= chunk
                regime = min(
                    int(np.searchsorted(trans_cum[regime], rng.random(), side="right")),
                    K - 1,
                )
            rr = np.concatenate(rets)[:n_samples]
            prices = np.exp(np.log(p0) + np.cumsum(rr))
            if quantize_sig is not None:
                from ..ml.decoder import quantize_sig_digits

                prices = quantize_sig_digits(prices, quantize_sig)
            out.append(
                pd.DataFrame(
                    {
                        "series_id": np.full(n_samples, sid, dtype=np.int64),
                        "t": np.arange(n_samples, dtype=np.int64),
                        "regime": np.concatenate(regs)[:n_samples],
                        "price": prices,
                    }
                )
            )
        return pd.concat(out) if out else pd.DataFrame(
            {"series_id": [], "t": [], "regime": [], "price": []}
        )

    grid = spark.range(n_series).repartition(
        min(n_series, spark.sparkContext.defaultParallelism), "id"
    )
    return grid.groupBy("id").applyInPandas(
        lambda pdf: walk(pdf), schema
    )
