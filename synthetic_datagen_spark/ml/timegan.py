"""M4/G11 — protocol-faithful numpy TimeGAN.

The reference (timegan_generator.py:67-186 train, :321-551 phases)
trains five GRU-stack networks in three phases:

  1. autoencoder    — L1(x, recovery(embedder(x))), Adam, early stop on
                      val L1 with best-weight restore (:321-373)
  2. supervised     — L1(h[:,1:], supervisor(h)[:, :-1]) one-step latent
                      prediction, embedder frozen (:376-423)
  3. joint          — generator step: BCE(1, D(S(G(z)))) + 10·sup-loss
                      + 100·moment-loss (per-timestep batch mean/std L1,
                      :425-476); discriminator step: BCE real/fake
                      (:478-496); early stop on val moment loss with a
                      snapshot of ALL five networks (:503-551)

TF is absent in this environment, so forward + analytic gradients +
Adam are implemented directly in numpy, per-timestep **linear special
case** of the GRU stacks (same precedent as the M1/M2 linear VAE): the
latent heads keep the reference's sigmoid activation (e_dense /
g_dense / s_dense are sigmoid Dense layers, :93,109,117), recovery and
discriminator heads are linear (:101,125). The three-phase PROTOCOL —
loss weighting, per-phase Adam, patience/min_delta early stopping,
best-weight restore, [0,1] min-max data normalization (:88-97) — is
the reference's exactly. Deterministic in the seed (single
default_rng drives init, shuffling, z draws).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..generators.seeds import derive_seed


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


class _Adam:
    def __init__(self, keys: list[str], lr: float):
        self.lr = lr
        self.keys = keys
        self.m: dict[str, np.ndarray] = {}
        self.v: dict[str, np.ndarray] = {}
        self.t = 0

    def step(self, params: dict[str, np.ndarray], grads: dict[str, np.ndarray]) -> None:
        self.t += 1
        b1, b2, eps = 0.9, 0.999, 1e-8
        for k in self.keys:
            g = grads[k]
            m = self.m.get(k, np.zeros_like(g))
            v = self.v.get(k, np.zeros_like(g))
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            self.m[k], self.v[k] = m, v
            mh = m / (1 - b1**self.t)
            vh = v / (1 - b2**self.t)
            params[k] = params[k] - self.lr * mh / (np.sqrt(vh) + eps)


class NumpyTimeGan:
    """Five per-timestep networks over windows X ∈ (N, T):

    embedder       h_t = σ(x_t·We + be)        (1 → H)
    recovery       x̂_t = h_t·Wr + br           (H → 1)
    generator      e_t = σ(z_t·Wg + bg)        (L → H)
    supervisor     ĥ_t = σ(h_t·Ws + bs)        (H → H)
    discriminator  y_t = h_t·Wd + bd           (H → 1, logits)
    """

    def __init__(
        self,
        seq_len: int,
        hidden_dim: int = 16,
        latent_dim: int = 8,
        epochs_ae: int = 100,
        epochs_sup: int = 100,
        epochs_joint: int = 60,
        batch_size: int = 64,
        lr: float = 1e-3,
        patience_ae: int = 30,
        patience_sup: int = 30,
        patience_joint: int = 50,
        min_delta: float = 1e-6,
        val_fraction: float = 0.15,
        seed: int = 42,
    ):
        self.seq_len = seq_len
        self.hidden_dim = hidden_dim
        self.latent_dim = latent_dim
        self.epochs_ae = epochs_ae
        self.epochs_sup = epochs_sup
        self.epochs_joint = epochs_joint
        self.batch_size = batch_size
        self.lr = lr
        self.patience_ae = patience_ae
        self.patience_sup = patience_sup
        self.patience_joint = patience_joint
        self.min_delta = min_delta
        self.val_fraction = val_fraction
        self.seed = seed
        self.p: dict[str, np.ndarray] | None = None
        self.data_min = 0.0
        self.data_range = 1.0

    # ------------------------------------------------------------ fwd --
    @staticmethod
    def _embed(p: dict, x: np.ndarray) -> np.ndarray:
        return _sigmoid(x[..., None] * p["We"] + p["be"])

    @staticmethod
    def _recover(p: dict, h: np.ndarray) -> np.ndarray:
        return h @ p["Wr"] + p["br"]

    @staticmethod
    def _generate_e(p: dict, z: np.ndarray) -> np.ndarray:
        return _sigmoid(z @ p["Wg"] + p["bg"])

    @staticmethod
    def _supervise(p: dict, h: np.ndarray) -> np.ndarray:
        return _sigmoid(h @ p["Ws"] + p["bs"])

    @staticmethod
    def _discriminate(p: dict, h: np.ndarray) -> np.ndarray:
        return h @ p["Wd"] + p["bd"]

    # ------------------------------------------------------------ fit --
    def fit(self, X: np.ndarray) -> "NumpyTimeGan":
        """X: (N, T) raw windows (returns). Normalized to [0,1] by
        global min/max (reference :88-97), chronological 15% val split
        (:102-108)."""
        rng = np.random.default_rng(self.seed)
        H, L = self.hidden_dim, self.latent_dim
        X = np.asarray(X, dtype=np.float64)
        self.data_min = float(X.min())
        rngv = float(X.max()) - self.data_min
        self.data_range = rngv if rngv >= 1e-10 else 1.0
        Xn = (X - self.data_min) / self.data_range
        n_val = max(1, int(len(Xn) * self.val_fraction))
        Xt, Xv = Xn[:-n_val], Xn[-n_val:]
        if len(Xt) == 0:
            Xt = Xn

        s = 0.1
        p = {
            "We": rng.normal(0, s, H), "be": np.zeros(H),
            "Wr": rng.normal(0, s, H), "br": np.zeros(()),
            "Wg": rng.normal(0, s, (L, H)), "bg": np.zeros(H),
            "Ws": rng.normal(0, s, (H, H)), "bs": np.zeros(H),
            "Wd": rng.normal(0, s, H), "bd": np.zeros(()),
        }
        self._phase_ae(p, Xt, Xv, rng)
        self._phase_sup(p, Xt, Xv, rng)
        self._phase_joint(p, Xt, Xv, rng)
        self.p = p
        return self

    def _batches(self, n: int, rng: np.random.Generator) -> Iterator[np.ndarray]:
        idx = rng.permutation(n)
        steps = max(1, n // self.batch_size)
        for s in range(steps):
            yield idx[s * self.batch_size : (s + 1) * self.batch_size]

    def _phase_ae(self, p, Xt, Xv, rng) -> None:
        opt = _Adam(["We", "be", "Wr", "br"], self.lr)
        best, wait, snap = np.inf, 0, None
        for _ in range(self.epochs_ae):
            for bi in self._batches(len(Xt), rng):
                x = Xt[bi]
                h = self._embed(p, x)
                xh = self._recover(p, h)
                r = xh - x
                dxh = np.sign(r) / r.size
                g = {
                    "Wr": np.einsum("bth,bt->h", h, dxh),
                    "br": np.asarray(dxh.sum()),
                }
                dh = dxh[..., None] * p["Wr"]
                dpre = dh * h * (1 - h)
                g["We"] = np.einsum("bt,bth->h", x, dpre)
                g["be"] = dpre.sum((0, 1))
                opt.step(p, g)
            val = float(np.abs(Xv - self._recover(p, self._embed(p, Xv))).mean())
            if val < best - self.min_delta:
                best, wait = val, 0
                snap = {k: p[k].copy() for k in ("We", "be", "Wr", "br")}
            else:
                wait += 1
            if wait >= self.patience_ae:
                break
        if snap is not None:
            p.update(snap)

    def _phase_sup(self, p, Xt, Xv, rng) -> None:
        opt = _Adam(["Ws", "bs"], self.lr)
        best, wait, snap = np.inf, 0, None
        for _ in range(self.epochs_sup):
            for bi in self._batches(len(Xt), rng):
                h = self._embed(p, Xt[bi])
                hh = self._supervise(p, h)
                diff = h[:, 1:, :] - hh[:, :-1, :]
                dhh = np.zeros_like(hh)
                dhh[:, :-1, :] = -np.sign(diff) / diff.size
                dpre = dhh * hh * (1 - hh)
                g = {
                    "Ws": np.einsum("bth,btk->hk", h, dpre),
                    "bs": dpre.sum((0, 1)),
                }
                opt.step(p, g)
            hv = self._embed(p, Xv)
            hvh = self._supervise(p, hv)
            val = float(np.abs(hv[:, 1:, :] - hvh[:, :-1, :]).mean())
            if val < best - self.min_delta:
                best, wait = val, 0
                snap = {k: p[k].copy() for k in ("Ws", "bs")}
            else:
                wait += 1
            if wait >= self.patience_sup:
                break
        if snap is not None:
            p.update(snap)

    @staticmethod
    def _moment_loss_grad(x_hat: np.ndarray, x: np.ndarray):
        """g_loss_v (:443-455): mean_t |std_B Δ| + mean_t |mean_B Δ|;
        returns (loss, dL/dx_hat)."""
        B, Tn = x_hat.shape
        mu_h, mu_x = x_hat.mean(0), x.mean(0)
        sd_h, sd_x = x_hat.std(0), x.std(0)
        loss = float(np.abs(sd_h - sd_x).mean() + np.abs(mu_h - mu_x).mean())
        dmu = np.sign(mu_h - mu_x) / (B * Tn)
        sd_safe = np.where(sd_h > 1e-12, sd_h, 1.0)
        dsd = np.sign(sd_h - sd_x) / Tn
        dx = dmu[None, :] + dsd[None, :] * (x_hat - mu_h[None, :]) / (B * sd_safe[None, :])
        return loss, dx

    def _phase_joint(self, p, Xt, Xv, rng) -> None:
        g_opt = _Adam(["Wg", "bg", "Ws", "bs"], self.lr)
        d_opt = _Adam(["Wd", "bd"], self.lr)
        L = self.latent_dim
        best, wait, snap = np.inf, 0, None
        for _ in range(self.epochs_joint):
            for bi in self._batches(len(Xt), rng):
                x = Xt[bi]
                B, Tn = x.shape
                z = rng.standard_normal((B, Tn, L))

                # ---- generator step (grads to Wg,bg,Ws,bs; :457-477) --
                h_real = self._embed(p, x)
                e_hat = self._generate_e(p, z)
                h_hat = self._supervise(p, e_hat)
                x_hat = self._recover(p, h_hat)
                y_fake = self._discriminate(p, h_hat)

                # u: BCE(1, y_fake) with logits → d/dy = σ(y) - 1
                dy = (_sigmoid(y_fake) - 1.0) / y_fake.size
                dh_hat = dy[..., None] * p["Wd"]
                # v (×100): moment loss through recovery
                _, dx_hat = self._moment_loss_grad(x_hat, x)
                dh_hat = dh_hat + 100.0 * dx_hat[..., None] * p["Wr"]
                dpre_h = dh_hat * h_hat * (1 - h_hat)
                gWs = np.einsum("bth,btk->hk", e_hat, dpre_h)
                gbs = dpre_h.sum((0, 1))
                de = dpre_h @ p["Ws"].T
                dpre_e = de * e_hat * (1 - e_hat)
                gWg = np.einsum("btl,bth->lh", z, dpre_e)
                gbg = dpre_e.sum((0, 1))
                # s (×10): supervised loss on the REAL latent path
                hh_r = self._supervise(p, h_real)
                diff = h_real[:, 1:, :] - hh_r[:, :-1, :]
                dhh = np.zeros_like(hh_r)
                dhh[:, :-1, :] = -np.sign(diff) / diff.size
                dpre_s = dhh * hh_r * (1 - hh_r)
                gWs = gWs + 10.0 * np.einsum("bth,btk->hk", h_real, dpre_s)
                gbs = gbs + 10.0 * dpre_s.sum((0, 1))
                g_opt.step(p, {"Wg": gWg, "bg": gbg, "Ws": gWs, "bs": gbs})

                # ---- discriminator step (fresh forward; :478-496) -----
                h_hat2 = self._supervise(p, self._generate_e(p, z))
                y_r = self._discriminate(p, h_real)
                y_f = self._discriminate(p, h_hat2)
                dyr = (_sigmoid(y_r) - 1.0) / y_r.size
                dyf = _sigmoid(y_f) / y_f.size
                gWd = np.einsum("bth,bt->h", h_real, dyr) + np.einsum(
                    "bth,bt->h", h_hat2, dyf
                )
                gbd = np.asarray(dyr.sum() + dyf.sum())
                d_opt.step(p, {"Wd": gWd, "bd": gbd})

            # val moment loss on generated vs X_val (:503-519)
            zv = rng.standard_normal((len(Xv), Xv.shape[1], L))
            xv_hat = self._recover(p, self._supervise(p, self._generate_e(p, zv)))
            val, _ = self._moment_loss_grad(xv_hat, Xv)
            if val < best - self.min_delta:
                best, wait = val, 0
                snap = {k: v.copy() for k, v in p.items()}
            else:
                wait += 1
            if wait >= self.patience_joint:
                break
        if snap is not None:
            p.update(snap)

    # ------------------------------------------------------- generate --
    def decode(self, z: np.ndarray) -> np.ndarray:
        """z (…, T, L) → denormalized windows (…, T): R(S(G(z)))·range+min."""
        if self.p is None:
            raise RuntimeError("fit() first")
        x = self._recover(self.p, self._supervise(self.p, self._generate_e(self.p, z)))
        return x * self.data_range + self.data_min

    def export(self) -> dict:
        if self.p is None:
            raise RuntimeError("fit() first")
        return {
            "p": {k: v.tolist() for k, v in self.p.items()},
            "data_min": self.data_min,
            "data_range": self.data_range,
            "seq_len": self.seq_len,
            "latent_dim": self.latent_dim,
        }

    def generate(
        self,
        spark: SparkSession,
        anchor_pool: np.ndarray,
        seed: int,
        n_samples: int,
        n_series: int = 1,
    ) -> DataFrame:
        """G11 distributed inference: broadcast the five weight sets,
        one mapInPandas decode per (series, window) grid chunk — the
        same plan as LinearDecoder.generate, chain decode swapped in
        (reference inference: timegan_generator.py:192-266 generates
        windows from z then rebuilds prices)."""
        if self.p is None:
            raise RuntimeError("fit() first")
        Tn, L = self.seq_len, self.latent_dim
        p = {k: v.copy() for k, v in self.p.items()}
        dmin, drange = self.data_min, self.data_range
        pool = np.asarray(anchor_pool, dtype=np.float64)
        n_windows = int(np.ceil(n_samples / Tn))

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
                    z = rng.standard_normal((Tn, L))
                    e = _sigmoid(z @ p["Wg"] + p["bg"])
                    h = _sigmoid(e @ p["Ws"] + p["bs"])
                    rets = (h @ p["Wr"] + p["br"]) * drange + dmin
                    rets = rets - rets.mean()
                    anchor = float(pool[rng.integers(len(pool))])
                    prices = anchor * np.exp(np.cumsum(rets))
                    frames.append(
                        pd.DataFrame(
                            {
                                "series_id": np.full(Tn, sid, dtype=np.int64),
                                "t": int(wid) * Tn + np.arange(Tn, dtype=np.int64),
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


def save_timegan(tg: NumpyTimeGan, path: str) -> None:
    """S5/S7-style artifact layout (reference saves five .keras files +
    meta.json side by side, timegan_generator.py:165-186): one npz per
    network role, meta.json carrying the normalization constants."""
    import json
    import os

    if tg.p is None:
        raise RuntimeError("fit() first")
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, "weights.npz"), **tg.p)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "seq_len": tg.seq_len,
                "hidden_dim": tg.hidden_dim,
                "latent_dim": tg.latent_dim,
                "data_min": tg.data_min,
                "data_range": tg.data_range,
                "format_version": 1,
            },
            f,
        )


def load_timegan(path: str) -> NumpyTimeGan:
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    tg = NumpyTimeGan(
        seq_len=meta["seq_len"],
        hidden_dim=meta["hidden_dim"],
        latent_dim=meta["latent_dim"],
    )
    with np.load(os.path.join(path, "weights.npz")) as z:
        tg.p = {k: z[k].copy() for k in z.files}
    tg.data_min = meta["data_min"]
    tg.data_range = meta["data_range"]
    return tg
