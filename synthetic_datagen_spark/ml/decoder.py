"""G1/G2/G3 generation chain + M1/M2 trainers (M4 stub).

Generate path (reference: typical_price_generator.py:88-159):
  G1  seeded latent sampling      — per-window rng(splitmix64(seed, wid))
  G2  decoder inference (batch)   — broadcast weights → mapInPandas matmul
  G3  windowed reconstruction     — zero-mean per window, seeded anchor
                                    price from the training pool, cumsum
                                    rebuild, concat windows, truncate

`LinearDecoder` is the decoder model: untrained, its weights derive
from a splitmix stream of the model seed (fully reproducible, no
training needed); trained, `VaeGanTrainer` (M1) / `LinearVaeTrainer`
(M2) fit a numpy SGD linear VAE (ml/vae.py) on Spark-prepared windows
and export its decoder weights into the same broadcast-mapInPandas
generate plan.

TimeGanTrainer (M4) trains the numpy 3-phase TimeGAN (ml/timegan.py,
reference protocol timegan_generator.py:321-551); its Spark
data-prep half runs for real.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

from ..generators.seeds import derive_seed
from .prep import prepare_training_windows


def _splitmix_matrix(seed: int, rows: int, cols: int) -> np.ndarray:
    """Deterministic engine-independent weight matrix in (-1, 1)."""
    state = seed & 0xFFFFFFFFFFFFFFFF
    out = np.empty(rows * cols)
    for i in range(rows * cols):
        state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out[i] = (state >> 11) / float(1 << 53) * 2.0 - 1.0
    return out.reshape(rows, cols)


def quantize_sig_digits(values: np.ndarray, sig: int) -> np.ndarray:
    """Round each float to ``sig`` significant decimal digits via the
    correctly-rounded decimal text round-trip (Python's own dtoa/strtod,
    host- and libm-independent). Output boundary for the full-precision
    float pins (r13 VERDICT item 2): the documented OpenBLAS
    DYNAMIC_ARCH dispatch drift (≤ ~1.1e-14 relative on host migration)
    cannot move a value across a significant-digit boundary at these
    precisions except for the same measure-zero boundary coincidence
    d8_composite_score already documents and accepts — so the pinned
    oracles stop needing a recapture cycle per host move."""
    return np.array(
        [float(f"{v:.{sig}g}") for v in np.asarray(values, dtype=np.float64)],
        dtype=np.float64,
    )


def windowed_generate_plan(
    spark: SparkSession,
    anchor_pool: np.ndarray,
    seed: int,
    n_samples: int,
    n_series: int,
    window_rows: int,
    make_rets,
    quantize_sig: int | None = None,
) -> DataFrame:
    """Shared G1→G3 generate plan for every windowed generator
    (LinearDecoder, MlpDecoder, NumpyTimeGan): a (series, window) grid
    via ``spark.range`` repartitioned on both keys, one mapInPandas
    decode with broadcast weights, zero-mean returns (W11), an anchor
    price sampled from the shipped pool (G3, reference:
    typical_price_generator.py:151-184), exp-cumsum price chaining, and
    a final ``t < n_samples`` truncate (O2).

    ``make_rets(rng, window_id) -> np.ndarray`` of ``window_rows``
    returns — called once per window with that window's derived rng.

    DETERMINISM CONTRACT: the window rng seeds from
    ``derive_seed(seed, series_id, window_id)``; ``make_rets`` must draw
    its latent noise from ``rng`` BEFORE this plan samples the anchor,
    so every consumer keeps its historical same-seed outputs.
    ``make_rets`` must close over plain numpy arrays/dicts (it is
    pickled into the UDF), never over ``self``.

    ``quantize_sig`` (opt-in, per query): quantize the output prices to
    that many significant digits INSIDE the existing mapInPandas pass
    (no extra plan node) — the pin-hardening boundary for queries whose
    oracle is a full-precision float capture over BLAS-dispatched
    training (see ``quantize_sig_digits``). Downstream consumers that
    aggregate generated prices (m16, ratio_sweep, …) must NOT set it:
    their own rounded summaries are pinned over full-precision inputs.
    """
    W = window_rows
    n_windows = int(np.ceil(n_samples / W))
    pool = np.asarray(anchor_pool, dtype=np.float64)

    schema = T.StructType(
        [
            T.StructField("series_id", T.LongType()),
            T.StructField("t", T.LongType()),
            T.StructField("price", T.DoubleType()),
        ]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for sid, wid in zip(pdf["series_id"], pdf["window_id"]):
                rng = np.random.default_rng(derive_seed(seed, int(sid), int(wid)))
                rets = make_rets(rng, int(wid))            # G2 decode
                rets = rets - rets.mean()                  # W11 zero-mean
                anchor = float(pool[rng.integers(len(pool))])  # G3 anchor
                prices = anchor * np.exp(np.cumsum(rets))
                if quantize_sig is not None:
                    prices = quantize_sig_digits(prices, quantize_sig)
                frames.append(
                    pd.DataFrame(
                        {
                            "series_id": np.full(W, sid, dtype=np.int64),
                            "t": int(wid) * W + np.arange(W, dtype=np.int64),
                            "price": prices,
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"series_id": [], "t": [], "price": []}
            )

    grid = (
        spark.range(n_series * n_windows)
        .select(
            (F.col("id") / n_windows).cast("long").alias("series_id"),
            (F.col("id") % n_windows).alias("window_id"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "series_id", "window_id")
    )
    return grid.mapInPandas(decode_batches, schema).filter(F.col("t") < n_samples)


class LinearDecoder:
    """z ∈ R^latent_dim → window ∈ R^window_rows, scaled to return-like
    magnitudes. The decoder half of the VAE stack (G2); also the
    untrained deterministic stand-in for TimeGAN inference (G11)."""

    def __init__(self, latent_dim: int = 16, window_rows: int = 32, model_seed: int = 7,
                 out_scale: float = 2e-3):
        self.latent_dim = latent_dim
        self.window_rows = window_rows
        self.w = _splitmix_matrix(model_seed, latent_dim, window_rows) * out_scale
        self.b = np.zeros(window_rows)

    def decode(self, z: np.ndarray) -> np.ndarray:
        return z @ self.w + self.b

    # ------------------------------------------------------------------
    def generate(
        self,
        spark: SparkSession,
        anchor_pool: np.ndarray,
        seed: int,
        n_samples: int,
        n_series: int = 1,
        quantize_sig: int | None = None,
    ) -> DataFrame:
        """G1→G2→G3: returns (series_id, t, price) via the shared
        windowed_generate_plan (anchors per reference:
        typical_price_generator.py:151-184)."""
        weights = self.w
        bias = self.b
        latent = self.latent_dim

        def make_rets(rng: np.random.Generator, wid: int) -> np.ndarray:
            return rng.standard_normal(latent) @ weights + bias

        return windowed_generate_plan(
            spark, anchor_pool, seed, n_samples, n_series,
            self.window_rows, make_rets, quantize_sig=quantize_sig,
        )


class MlpDecoder:
    """Nonlinear decoder: [z ⊕ temporal] → tanh hidden stack → linear
    window head (the decoder half of the reference's MLP VAE-GAN,
    vae_gan_trainer.py:80-103). Optionally CONDITIONAL: when
    ``n_temporal > 0``, generation mirrors
    typical_price_generator.py:120-136 — per window the 6 cyclical
    features of the window's LAST timestamp concat onto z before
    decoding, so the model is season-aware.

    Runs the same broadcast-weights mapInPandas generate plan as
    LinearDecoder; the temporal features are computed INSIDE the
    batches from (start_dt, interval_hours, window_id) so the plan
    stays fully distributed and deterministic.
    """

    def __init__(
        self,
        latent_dim: int,
        window_rows: int,
        hidden: list,
        out_head: tuple,
        n_temporal: int = 0,
    ):
        self.latent_dim = latent_dim
        self.window_rows = window_rows
        self.hidden = [(np.asarray(W, dtype=np.float64), np.asarray(b, dtype=np.float64))
                       for W, b in hidden]
        self.out_head = (np.asarray(out_head[0], dtype=np.float64),
                         np.asarray(out_head[1], dtype=np.float64))
        self.n_temporal = n_temporal

    # driver-side forward (tests / reconstruction)
    def decode(self, z: np.ndarray, temporal: np.ndarray | None = None) -> np.ndarray:
        h = np.concatenate([z, temporal], axis=1) if self.n_temporal else z
        for W, b in self.hidden:
            h = np.tanh(h @ W + b)
        return h @ self.out_head[0] + self.out_head[1]

    def flat_weights(self) -> np.ndarray:
        """All parameters as one vector (determinism comparisons)."""
        parts = []
        for W, b in [*self.hidden, self.out_head]:
            parts.extend([W.ravel(), b.ravel()])
        return np.concatenate(parts)

    def generate(
        self,
        spark: SparkSession,
        anchor_pool: np.ndarray,
        seed: int,
        n_samples: int,
        n_series: int = 1,
        start_dt: str = "2020-01-01 00:00:00",
        interval_hours: int = 4,
        quantize_sig: int | None = None,
    ) -> DataFrame:
        """G1→G2→G3 with the MLP forward pass per window; conditional
        models stamp each window with the cyclical features of its last
        timestamp (typical_price_generator.py:120-136)."""
        W = self.window_rows
        hidden = self.hidden
        out_head = self.out_head
        latent = self.latent_dim
        n_temporal = self.n_temporal
        start = pd.Timestamp(start_dt)
        step_ns = int(interval_hours) * 3_600_000_000_000

        def temporal_row(wid: int) -> np.ndarray:
            # last timestamp of window wid; conventions match
            # functions/timeseries.cyclical_time_features (hour/24,
            # pandas-weekday/5, (month-1)/12)
            ts = pd.Timestamp(start.value + ((wid + 1) * W - 1) * step_ns)
            two_pi = 2.0 * np.pi
            return np.array(
                [
                    np.sin(two_pi * ts.hour / 24.0),
                    np.cos(two_pi * ts.hour / 24.0),
                    np.sin(two_pi * ts.weekday() / 5.0),
                    np.cos(two_pi * ts.weekday() / 5.0),
                    np.sin(two_pi * (ts.month - 1) / 12.0),
                    np.cos(two_pi * (ts.month - 1) / 12.0),
                ]
            )

        def make_rets(rng: np.random.Generator, wid: int) -> np.ndarray:
            z = rng.standard_normal(latent)
            h = np.concatenate([z, temporal_row(wid)]) if n_temporal else z
            for Wl, bl in hidden:
                h = np.tanh(h @ Wl + bl)
            return h @ out_head[0] + out_head[1]

        return windowed_generate_plan(
            spark, anchor_pool, seed, n_samples, n_series, W, make_rets,
            quantize_sig=quantize_sig,
        )


_TEMPORAL_COLS = ["hour_sin", "hour_cos", "dow_sin", "dow_cos", "month_sin", "month_cos"]


class _TrainerBase:
    """Shared trainer shape: `prepare()` is the distributed half (scan →
    union → returns → windows), `fit()` the driver half."""

    name = "base"

    def __init__(self, window_rows: int = 32, use_returns: bool = True,
                 latent_dim: int = 16, train_seed: int = 42,
                 epochs: int = 40, max_windows: int = 4096,
                 hidden: tuple[int, ...] = (48, 24), mmd_lambda: float = 1e-2,
                 kl_anneal_epochs: int = 0, conditional: bool = False):
        self.window_rows = window_rows
        self.use_returns = use_returns
        self.latent_dim = latent_dim
        self.train_seed = train_seed
        self.epochs = epochs
        self.max_windows = max_windows
        self.hidden = tuple(hidden)
        self.mmd_lambda = mmd_lambda
        self.kl_anneal_epochs = kl_anneal_epochs
        self.conditional = conditional
        self.windows: DataFrame | None = None
        self.decoder = None
        self.vae = None
        self._temporal: np.ndarray | None = None

    def prepare(self, sources: list[DataFrame], value_col: str, ts_col: str) -> DataFrame:
        self.windows = prepare_training_windows(
            sources, value_col, ts_col, self.window_rows, self.use_returns,
            temporal_features=self.conditional,
        )
        return self.windows

    def _collect_windows(self) -> np.ndarray:
        """Bounded, deterministically-ordered window sample (SURVEY
        §4.2 ≤10⁴-point driver-fallback rule): sorted by window_id so
        partitioning can never reorder the training stream. Conditional
        trainers also stash the aligned temporal matrix."""
        if self.windows is None:
            raise RuntimeError("prepare() first")
        key = [c for c in self.windows.columns if c != "window_vec"]
        rows = (
            self.windows.orderBy(*key).limit(self.max_windows).collect()
        )
        if not rows:
            # the reference's create_windows raises ValueError when the
            # series is shorter than one window (data_processor.py,
            # pinned by its test_create_windows_too_short) — surface the
            # same clear error instead of a shape failure deep in numpy
            raise ValueError(
                f"data too short: no full {self.window_rows}-row windows"
            )
        if self.conditional:
            self._temporal = np.array(
                [[r[c] for c in _TEMPORAL_COLS] for r in rows], dtype=np.float64
            )
        return np.array([r["window_vec"] for r in rows], dtype=np.float64)

    _ADVERSARIAL = False

    def fit(self) -> MlpDecoder:
        """Train the numpy MLP VAE (ml/vae.py MlpVae — the reference's
        tanh-Dense architecture + MMD) on the Spark-prepared windows and
        export its decoder into the generate plan."""
        from .vae import MlpVae

        X = self._collect_windows()
        vae = MlpVae(
            window_rows=self.window_rows,
            latent_dim=self.latent_dim,
            hidden=self.hidden,
            mmd_lambda=self.mmd_lambda,
            kl_anneal_epochs=self.kl_anneal_epochs,
            adversarial=self._ADVERSARIAL,
            epochs=self.epochs,
            train_seed=self.train_seed,
            n_temporal=6 if self.conditional else 0,
        ).fit(X, temporal=self._temporal)
        self.vae = vae
        hidden, out, n_temporal = vae.decoder_export()
        dec = MlpDecoder(
            latent_dim=self.latent_dim,
            window_rows=self.window_rows,
            hidden=hidden,
            out_head=out,
            n_temporal=n_temporal,
        )
        self.decoder = dec
        return dec


class LinearVaeTrainer(_TrainerBase):
    """M2 (reference: vae_trainer.py:46-113) — pure VAE (MLP tier; the
    historical name is kept for the plugin registry)."""

    name = "vae"
    _ADVERSARIAL = False


class VaeGanTrainer(_TrainerBase):
    """M1 (reference: vae_gan_trainer.py:33-316) — VAE + discriminator
    + generator-adversarial steps per batch, tanh-MLP architecture with
    the Gaussian-kernel MMD term."""

    name = "vae-gan"
    _ADVERSARIAL = True


class GanTrainer(_TrainerBase):
    """M3 (reference: gan_trainer.py:31-108) — plain GAN, no VAE
    encoder: alternating discriminator/generator BCE steps over the
    Spark-prepared windows (ml/gan.py MlpGan — tanh-MLP generator vs
    LeakyReLU-MLP discriminator). The fitted generator exports into the
    same MlpDecoder generate plan; like the reference
    (gan_trainer.py:105-107 writes a dummy encoder), the artifact keeps
    the VAE-GAN layout."""

    name = "gan"

    def fit(self) -> MlpDecoder:
        from .gan import MlpGan

        X = self._collect_windows()
        gan = MlpGan(
            window_rows=self.window_rows,
            latent_dim=self.latent_dim,
            hidden=tuple(reversed(self.hidden)),
            epochs=self.epochs,
            train_seed=self.train_seed,
        ).fit(X)
        self.vae = gan  # trainer-state slot; duck-typed loss history
        hidden, out, n_temporal = gan.generator_export()
        dec = MlpDecoder(
            latent_dim=self.latent_dim,
            window_rows=self.window_rows,
            hidden=hidden,
            out_head=out,
            n_temporal=n_temporal,
        )
        self.decoder = dec
        return dec


class TimeGanTrainer(_TrainerBase):
    """M4 (reference: timegan_generator.py:67-186,321-551) — the
    numpy 3-phase TimeGAN (ml/timegan.py): autoencoder → supervised →
    joint adversarial with moment matching, per-phase Adam, early
    stopping with best-weight restore, [0,1] min-max normalization —
    the reference's protocol exactly, over real GRU stacks (n_layers
    GRU + Dense head per network, numpy BPTT; reference architecture
    timegan_generator.py:273-316, default n_layers=3 as in its config
    :43). `fit()` returns the trained `NumpyTimeGan`, whose
    `.generate()` runs the same broadcast-weights mapInPandas plan as
    LinearDecoder (G11)."""

    name = "timegan"

    def __init__(
        self, hidden_dim: int = 24, epochs_joint: int = 40, n_layers: int = 3, **kw
    ):
        super().__init__(**kw)
        self.hidden_dim = hidden_dim
        self.epochs_joint = epochs_joint
        self.n_layers = n_layers
        self.timegan = None

    def fit(self):
        from .timegan import NumpyTimeGan

        X = self._collect_windows()
        tg = NumpyTimeGan(
            seq_len=self.window_rows,
            hidden_dim=self.hidden_dim,
            latent_dim=self.latent_dim,
            n_layers=self.n_layers,
            epochs_ae=self.epochs,
            epochs_sup=self.epochs,
            epochs_joint=self.epochs_joint,
            seed=self.train_seed,
        ).fit(X)
        self.timegan = tg
        return tg


def save_decoder(dec, path: str) -> None:
    """S5: `.parts/`-style artifact layout (reference:
    vae_gan_trainer.py:320-351 — weights + meta.json side by side).
    Linear decoders keep the v2 layout; MLP decoders write v3 with the
    layer stack in one npz and the reference's `conditional` /
    `n_temporal` meta keys (vae_gan_trainer.py:339-345)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    if isinstance(dec, MlpDecoder):
        arrays = {}
        for i, (W, b) in enumerate(dec.hidden):
            arrays[f"hidden_{i}_W"] = W
            arrays[f"hidden_{i}_b"] = b
        arrays["out_W"], arrays["out_b"] = dec.out_head
        np.savez(os.path.join(path, "layers.npz"), **arrays)
        meta = {
            "latent_dim": dec.latent_dim,
            "window_rows": dec.window_rows,
            "n_hidden": len(dec.hidden),
            "conditional": bool(dec.n_temporal),
            "n_temporal": dec.n_temporal,
            "kind": "mlp",
            "format_version": 3,
        }
    else:
        np.save(os.path.join(path, "weights.npy"), dec.w)
        np.save(os.path.join(path, "bias.npy"), dec.b)
        meta = {"latent_dim": dec.latent_dim, "window_rows": dec.window_rows,
                "format_version": 2}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_decoder(path: str):
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("kind") == "mlp":
        z = np.load(os.path.join(path, "layers.npz"))
        hidden = [
            (z[f"hidden_{i}_W"], z[f"hidden_{i}_b"]) for i in range(meta["n_hidden"])
        ]
        return MlpDecoder(
            latent_dim=meta["latent_dim"],
            window_rows=meta["window_rows"],
            hidden=hidden,
            out_head=(z["out_W"], z["out_b"]),
            n_temporal=meta.get("n_temporal", 0),
        )
    dec = LinearDecoder(latent_dim=meta["latent_dim"], window_rows=meta["window_rows"])
    dec.w = np.load(os.path.join(path, "weights.npy"))
    bias_path = os.path.join(path, "bias.npy")
    if os.path.exists(bias_path):  # v1 artifacts have no bias (inferred 0)
        dec.b = np.load(bias_path)
    return dec
