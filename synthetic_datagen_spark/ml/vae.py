"""M1/M2 — linear VAE (+ adversarial variant) trained with numpy SGD.

The reference's trainers are driver-side Keras gradient loops over
Spark-preparable window matrices (vae_gan_trainer.py:220-309: per batch
a VAE step, a discriminator step, and a generator-adversarial step;
vae_trainer.py:46-113 is the pure-VAE subset). TF/torch are absent in
this environment, so this module implements the same contract with
analytic gradients for the LINEAR special case:

  encoder   μ = XWe + be,  logσ² = XWv + bv
  sampling  z = μ + ε·exp(½logσ²)           (reparameterization)
  decoder   X̂ = zWd + bd
  losses    MSE(X̂, X) + β·KL(q‖N(0,I))      (VAE step)
            BCE on D(x)=σ(xw+b)             (discriminator step)
            −log D(X̂)                       (generator-adversarial step)

Scale shape: Spark builds the window matrix (prep.py — scan → union →
log-return → sliding windows, all distributed); the trainer consumes a
BOUNDED, deterministically-ordered sample of windows on the driver
(SURVEY §4.2's ≤10⁴-point driver-fallback rule — the reference's whole
dataset is ~22k rows). The fitted decoder broadcasts into the existing
LinearDecoder mapInPandas generate plan unchanged.

Determinism contract (reference tests/test_plugins.py:74-83): training
is a pure function of (windows, train_seed) — windows are sorted before
use so partitioning cannot reorder them — and generation of a fitted
model is a pure function of (model, seed).
"""

from __future__ import annotations

import numpy as np


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


class LinearVae:
    """Linear-Gaussian VAE with optional adversarial decoder gradient.

    ``adversarial=False`` is M2 (vae_trainer.py); ``True`` adds the
    discriminator + generator steps of M1 (vae_gan_trainer.py:250-278).
    """

    def __init__(
        self,
        window_rows: int = 32,
        latent_dim: int = 16,
        beta_kl: float = 1e-3,
        adversarial: bool = False,
        adv_weight: float = 1e-2,
        epochs: int = 40,
        batch_size: int = 128,
        lr: float = 5e-3,
        train_seed: int = 42,
    ):
        self.window_rows = window_rows
        self.latent_dim = latent_dim
        self.beta_kl = beta_kl
        self.adversarial = adversarial
        self.adv_weight = adv_weight
        self.epochs = epochs
        self.batch_size = batch_size
        self.lr = lr
        self.train_seed = train_seed
        # fitted state
        self.We = self.be = self.Wv = self.bv = None
        self.Wd = self.bd = None
        self.x_scale = 1.0
        self.loss_history: list[float] = []

    # ------------------------------------------------------------- fit --
    def fit(self, X: np.ndarray) -> "LinearVae":
        """SGD over window rows. X: (N, window_rows) float array in a
        deterministic order (the caller sorts)."""
        D, L = self.window_rows, self.latent_dim
        X = np.asarray(X, dtype=np.float64)
        if X.ndim != 2 or X.shape[1] != D:
            raise ValueError(f"expected (N, {D}) windows, got {X.shape}")
        self.x_scale = float(X.std()) or 1.0
        Xn = X / self.x_scale
        rng = np.random.default_rng(self.train_seed)
        s = 1.0 / np.sqrt(D)
        We = rng.normal(0, s, (D, L)); be = np.zeros(L)
        Wv = rng.normal(0, s, (D, L)); bv = np.zeros(L) - 2.0
        Wd = rng.normal(0, 1.0 / np.sqrt(L), (L, D)); bd = np.zeros(D)
        wD = rng.normal(0, s, D); bD = 0.0  # discriminator (M1 only)
        lr, beta = self.lr, self.beta_kl
        n = len(Xn)
        self.loss_history = []
        for _ in range(self.epochs):
            order = rng.permutation(n)
            ep_loss = 0.0
            for i0 in range(0, n, self.batch_size):
                xb = Xn[order[i0 : i0 + self.batch_size]]
                B = len(xb)
                mu = xb @ We + be
                lv = np.clip(xb @ Wv + bv, -10.0, 10.0)
                eps = rng.standard_normal((B, L))
                sd = np.exp(0.5 * lv)
                z = mu + eps * sd
                xh = z @ Wd + bd
                diff = xh - xb
                recon = float(np.mean(diff * diff))
                kl = float(-0.5 * np.mean(np.sum(1 + lv - mu * mu - np.exp(lv), axis=1)))
                ep_loss += (recon + beta * kl) * B
                # ---- backprop (analytic; linear layers) ----
                dxh = 2.0 * diff / (B * D)
                if self.adversarial:
                    # generator-adversarial: minimize −log D(x̂)
                    dfake = _sigmoid(xh @ wD + bD)           # D(x̂)
                    dxh = dxh + self.adv_weight * (-(1.0 - dfake))[:, None] * wD[None, :] / B
                gWd = z.T @ dxh
                gbd = dxh.sum(axis=0)
                dz = dxh @ Wd.T
                dmu = dz + beta * mu / (B)
                dlv = dz * eps * 0.5 * sd + beta * (-0.5) * (1.0 - np.exp(lv)) / B
                gWe = xb.T @ dmu
                gbe = dmu.sum(axis=0)
                gWv = xb.T @ dlv
                gbv = dlv.sum(axis=0)
                We -= lr * gWe; be -= lr * gbe
                Wv -= lr * gWv; bv -= lr * gbv
                Wd -= lr * gWd; bd -= lr * gbd
                if self.adversarial:
                    # discriminator step: BCE real-vs-fake on the batch
                    pr = _sigmoid(xb @ wD + bD)
                    pf = _sigmoid(xh @ wD + bD)
                    gw = (xb.T @ (pr - 1.0) + xh.T @ pf) / B
                    gb = float(np.mean(pr - 1.0) + np.mean(pf))
                    wD -= lr * gw; bD -= lr * gb
            self.loss_history.append(ep_loss / n)
        self.We, self.be, self.Wv, self.bv = We, be, Wv, bv
        self.Wd, self.bd = Wd, bd
        return self

    # -------------------------------------------------------- exports --
    def decoder_weights(self) -> tuple[np.ndarray, np.ndarray]:
        """(W, b) in DATA units — the x_scale folds into the linear map,
        so the exported decoder is exactly `z @ W + b`."""
        if self.Wd is None:
            raise RuntimeError("fit() first")
        return self.Wd * self.x_scale, self.bd * self.x_scale

    def reconstruction_mse(self, X: np.ndarray) -> float:
        """Deterministic (ε=0) reconstruction error in data units."""
        if self.Wd is None:
            raise RuntimeError("fit() first")
        Xn = np.asarray(X, dtype=np.float64) / self.x_scale
        mu = Xn @ self.We + self.be
        xh = mu @ self.Wd + self.bd
        return float(np.mean((xh - Xn) ** 2)) * self.x_scale**2
