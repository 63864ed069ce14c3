"""M3 — standalone pure-GAN trainer (no VAE encoder), numpy SGD.

The reference's GanTrainer (sdg_plugins/trainer/gan_trainer.py:31-108)
trains a plain GAN whose generator reuses the decoder architecture:
per batch a discriminator BCE step on real-vs-fake (generator frozen),
then a generator step minimizing BCE(1, D(G(z))) with the discriminator
frozen; at save time a *dummy* untrained encoder is written beside the
generator so the artifact layout matches the VAE-GAN's
(gan_trainer.py:105-107 via save_model_parts).

TF/keras are absent here, so — exactly as ml/vae.py does for M1/M2 —
this is the LINEAR special case with analytic gradients:

  generator      x̂ = zWg + bg,   z ~ N(0, I)
  discriminator  D(x) = σ(xw + b)
  d-step         BCE(1, D(x)) + BCE(0, D(x̂)), averaged  (gan_trainer.py:77-88)
  g-step         BCE(1, D(x̂)) = −log D(x̂)               (gan_trainer.py:90-97)

Scale shape is unchanged from the VAE trainers: Spark prepares the
window matrix distributed (ml/prep.py), the driver consumes a bounded
deterministically-ordered sample, and the fitted generator broadcasts
into the LinearDecoder mapInPandas generate plan.

Determinism: fit is a pure function of (windows, train_seed); windows
arrive sorted, so partitioning cannot reorder the training stream.
"""

from __future__ import annotations

import numpy as np

from .vae import _sigmoid


class LinearGan:
    """Pure GAN, linear generator + logistic discriminator."""

    def __init__(
        self,
        window_rows: int = 32,
        latent_dim: int = 16,
        epochs: int = 40,
        batch_size: int = 128,
        lr: float = 5e-3,
        train_seed: int = 42,
    ):
        self.window_rows = window_rows
        self.latent_dim = latent_dim
        self.epochs = epochs
        self.batch_size = batch_size
        self.lr = lr
        self.train_seed = train_seed
        self.Wg = self.bg = None
        self.x_scale = 1.0
        self.d_loss_history: list[float] = []
        self.g_loss_history: list[float] = []

    def fit(self, X: np.ndarray) -> "LinearGan":
        """Alternating SGD. X: (N, window_rows) in deterministic order."""
        D, L = self.window_rows, self.latent_dim
        X = np.asarray(X, dtype=np.float64)
        if X.ndim != 2 or X.shape[1] != D:
            raise ValueError(f"expected (N, {D}) windows, got {X.shape}")
        self.x_scale = float(X.std()) or 1.0
        Xn = X / self.x_scale
        rng = np.random.default_rng(self.train_seed)
        Wg = rng.normal(0, 1.0 / np.sqrt(L), (L, D))
        bg = np.zeros(D)
        w = rng.normal(0, 1.0 / np.sqrt(D), D)
        b = 0.0
        lr, n = self.lr, len(Xn)
        self.d_loss_history, self.g_loss_history = [], []
        for _ in range(self.epochs):
            order = rng.permutation(n)
            ep_d = ep_g = 0.0
            for i0 in range(0, n, self.batch_size):
                xb = Xn[order[i0 : i0 + self.batch_size]]
                B = len(xb)
                # --- discriminator step (generator frozen) ---
                z = rng.standard_normal((B, L))
                fake = z @ Wg + bg
                pr = _sigmoid(xb @ w + b)
                pf = _sigmoid(fake @ w + b)
                d_loss = -0.5 * float(
                    np.mean(np.log(np.clip(pr, 1e-12, 1.0)))
                    + np.mean(np.log(np.clip(1.0 - pf, 1e-12, 1.0)))
                )
                # d/dw of the averaged BCE pair: σ'(·) folds into (p − y)
                gw = 0.5 * (xb.T @ (pr - 1.0) + fake.T @ pf) / B
                gb = 0.5 * float(np.mean(pr - 1.0) + np.mean(pf))
                w -= lr * gw
                b -= lr * gb
                # --- generator step (discriminator frozen) ---
                z = rng.standard_normal((B, L))
                fake = z @ Wg + bg
                pf = _sigmoid(fake @ w + b)
                g_loss = -float(np.mean(np.log(np.clip(pf, 1e-12, 1.0))))
                dfake = (-(1.0 - pf))[:, None] * w[None, :] / B
                Wg -= lr * (z.T @ dfake)
                bg -= lr * dfake.sum(axis=0)
                ep_d += d_loss * B
                ep_g += g_loss * B
            self.d_loss_history.append(ep_d / n)
            self.g_loss_history.append(ep_g / n)
        self.Wg, self.bg = Wg, bg
        return self

    def generator_weights(self) -> tuple[np.ndarray, np.ndarray]:
        """(W, b) in DATA units (x_scale folded in), drop-in for the
        LinearDecoder broadcast-mapInPandas generate plan."""
        if self.Wg is None:
            raise RuntimeError("fit() first")
        return self.Wg * self.x_scale, self.bg * self.x_scale


class MlpGan:
    """Reference-architecture pure GAN: tanh MLP generator (the decoder
    stack of vae_gan_trainer.py:80-103, reused by gan_trainer.py) vs a
    LeakyReLU(0.2) MLP discriminator with seeded inverted
    Dropout(disc_dropout) between layers (vae_gan_trainer.py:106-124 —
    gan_trainer.py imports the same _build_discriminator). Same
    alternating BCE protocol as LinearGan (gan_trainer.py:77-97) but
    with full backprop through both stacks; unlike a linear generator
    this can push the prior onto NON-GAUSSIAN (e.g. bimodal) window
    distributions — pinned in tests/test_generators.py.
    """

    def __init__(
        self,
        window_rows: int = 32,
        latent_dim: int = 16,
        hidden: tuple[int, ...] = (24, 48),
        disc_hidden: tuple[int, ...] = (64, 32),
        disc_dropout: float = 0.3,
        epochs: int = 40,
        batch_size: int = 128,
        lr: float = 5e-3,
        disc_lr: float = 1e-3,
        train_seed: int = 42,
    ):
        self.window_rows = window_rows
        self.latent_dim = latent_dim
        self.hidden = tuple(max(h, latent_dim) for h in hidden)
        self.disc_hidden = tuple(disc_hidden)
        self.disc_dropout = disc_dropout
        self.epochs = epochs
        self.batch_size = batch_size
        self.lr = lr
        self.disc_lr = disc_lr
        self.train_seed = train_seed
        self.gen_hidden: list = []
        self.out_head = None
        self.disc_layers: list = []
        self.disc_head = None
        self.x_scale = 1.0
        self.d_loss_history: list[float] = []
        self.g_loss_history: list[float] = []

    def _gen_forward(self, z: np.ndarray):
        from .mlp import tanh_stack_forward

        h, acts = tanh_stack_forward(z, self.gen_hidden)
        return h @ self.out_head[0] + self.out_head[1], (acts, h)

    def _disc_forward(self, x: np.ndarray, rng: np.random.Generator | None = None):
        """With ``rng`` (training): seeded inverted Dropout(disc_dropout)
        after each LeakyReLU, fresh masks per call (Keras training=True
        semantics). Without: identity (inference)."""
        from .mlp import lrelu_stack_forward

        h, acts, scales = lrelu_stack_forward(
            x, self.disc_layers, dropout=self.disc_dropout, rng=rng
        )
        return _sigmoid((h @ self.disc_head[0] + self.disc_head[1])[:, 0]), acts, scales

    def fit(self, X: np.ndarray) -> "MlpGan":
        """Alternating SGD. X: (N, window_rows) in deterministic order."""
        from .mlp import (
            dense_init,
            disc_bce_update,
            lrelu_stack_backward,
            sgd_step,
            tanh_stack_backward,
        )

        D, L = self.window_rows, self.latent_dim
        X = np.asarray(X, dtype=np.float64)
        if X.ndim != 2 or X.shape[1] != D:
            raise ValueError(f"expected (N, {D}) windows, got {X.shape}")
        self.x_scale = float(X.std()) or 1.0
        Xn = X / self.x_scale
        rng = np.random.default_rng(self.train_seed)
        self.gen_hidden = []
        w = L
        for units in self.hidden:
            self.gen_hidden.append(dense_init(rng, w, units))
            w = units
        self.out_head = dense_init(rng, w, D)
        self.disc_layers = []
        w = D
        for units in self.disc_hidden:
            self.disc_layers.append(dense_init(rng, w, units))
            w = units
        self.disc_head = dense_init(rng, w, 1)
        n = len(Xn)
        self.d_loss_history, self.g_loss_history = [], []
        for _ in range(self.epochs):
            order = rng.permutation(n)
            ep_d = ep_g = 0.0
            for i0 in range(0, n, self.batch_size):
                xb = Xn[order[i0 : i0 + self.batch_size]]
                B = len(xb)
                # --- discriminator step (generator frozen) ---
                z = rng.standard_normal((B, L))
                fake, _ = self._gen_forward(z)
                pr, acts_r, sc_r = self._disc_forward(xb, rng)
                pf, acts_f, sc_f = self._disc_forward(fake, rng)
                d_loss = disc_bce_update(
                    pr, acts_r, pf, acts_f,
                    self.disc_layers, self.disc_head, self.disc_lr,
                    scales_real=sc_r, scales_fake=sc_f,
                )
                # --- generator step (discriminator frozen) ---
                z = rng.standard_normal((B, L))
                fake, (acts_g, hg) = self._gen_forward(z)
                pf, acts_f, sc_f = self._disc_forward(fake, rng)
                g_loss = -float(np.mean(np.log(np.clip(pf, 1e-12, 1.0))))
                ds = ((pf - 1.0) / B)[:, None]
                dfake, _ = lrelu_stack_backward(
                    ds @ self.disc_head[0].T, acts_f, self.disc_layers, scales=sc_f
                )
                g_out = (hg.T @ dfake, dfake.sum(axis=0))
                dhg = dfake @ self.out_head[0].T
                _, g_gen = tanh_stack_backward(dhg, acts_g, self.gen_hidden)
                sgd_step(self.gen_hidden, g_gen, self.lr)
                sgd_step([self.out_head], [g_out], self.lr)
                ep_d += d_loss * B
                ep_g += g_loss * B
            self.d_loss_history.append(ep_d / n)
            self.g_loss_history.append(ep_g / n)
        return self

    def generator_export(self):
        """(hidden, out_head, n_temporal=0) in DATA units, drop-in for
        the MlpDecoder broadcast-mapInPandas generate plan."""
        if self.out_head is None:
            raise RuntimeError("fit() first")
        hidden = [(W.copy(), b.copy()) for W, b in self.gen_hidden]
        out = (self.out_head[0] * self.x_scale, self.out_head[1] * self.x_scale)
        return hidden, out, 0

    def sample(self, n: int, seed: int) -> np.ndarray:
        """Driver-side prior sampling in data units (for tests)."""
        z = np.random.default_rng(seed).standard_normal((n, self.latent_dim))
        out, _ = self._gen_forward(z)
        return out * self.x_scale
