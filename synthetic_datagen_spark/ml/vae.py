"""M1/M2 — VAE (+ adversarial variant) trained with numpy SGD.

Two fidelity tiers live here:

* ``LinearVae`` — the round-1..3 LINEAR special case (no hidden layer,
  no MMD), kept because its analytic gradients are the simplest
  reference point and several tests pin its behavior.
* ``MlpVae`` — the reference architecture: tanh MLP encoder/decoder
  (vae_gan_trainer.py:46-103 — Dense stacks sized
  ``initial_layer_size=48`` → ``//layer_size_divisor=2`` per layer,
  activation tanh from app/config.py), Gaussian-kernel MMD² loss term
  (vae_gan_trainer.py:131-139, weight ``mmd_lambda=1e-2``), KL
  annealing (``kl_weight * min(1, epoch/kl_anneal_epochs)``,
  train loop :221), LeakyReLU(0.2) MLP discriminator with
  seeded inverted Dropout(disc_dropout=0.3) between layers (:106-124;
  masks drawn from the training rng, so determinism holds), early
  stopping with ``start_from_epoch``/``min_delta``/``early_patience``
  (:300-309), and optional temporal conditioning: the 6 cyclical
  features concat after the first encoder layer and at the decoder /
  discriminator inputs (:64-67, :91-94, :112-115).

The reference's trainers are driver-side Keras gradient loops over
Spark-preparable window matrices (vae_gan_trainer.py:220-309: per batch
a VAE step, a discriminator step, and a generator-adversarial step;
vae_trainer.py:46-113 is the pure-VAE subset). TF/torch are absent in
this environment, so both classes implement the same contract with
analytic gradients; the LINEAR special case is:

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


class MlpVae:
    """Reference-architecture VAE(-GAN): tanh MLP encoder/decoder + MMD.

    Mirrors vae_gan_trainer.py faithfully (see module docstring):
    ``hidden`` is the encoder Dense-stack width sequence (the decoder
    uses the reverse, vae_gan_trainer.py:98-102), ``mmd_lambda`` weights
    the Gaussian-kernel MMD² between each batch and its reconstruction,
    ``kl_anneal_epochs`` ramps the KL weight linearly, and
    ``adversarial=True`` adds the reference's per-batch discriminator +
    generator steps with their own learning rates (:198-200). With
    ``n_temporal > 0`` the model is conditional: ``fit``/``decode`` take
    a (N, n_temporal) cyclical-feature matrix, concat after the first
    encoder layer and at the decoder/discriminator inputs.

    ``adversarial=False`` is M2 (vae_trainer.py); ``True`` is M1.
    """

    def __init__(
        self,
        window_rows: int = 32,
        latent_dim: int = 16,
        hidden: tuple[int, ...] = (48, 24),
        beta_kl: float = 1e-3,
        kl_anneal_epochs: int = 0,
        mmd_lambda: float = 1e-2,
        adversarial: bool = False,
        disc_hidden: tuple[int, ...] = (64, 32),
        disc_dropout: float = 0.3,
        disc_lr: float = 1e-4,
        gen_lr: float = 1e-4,
        epochs: int = 40,
        batch_size: int = 128,
        lr: float = 5e-3,
        train_seed: int = 42,
        n_temporal: int = 0,
        early_patience: int = 0,
        start_from_epoch: int = 15,
        min_delta: float = 1e-7,
    ):
        self.window_rows = window_rows
        self.latent_dim = latent_dim
        self.hidden = tuple(max(h, latent_dim) for h in hidden)
        self.beta_kl = beta_kl
        self.kl_anneal_epochs = kl_anneal_epochs
        self.mmd_lambda = mmd_lambda
        self.adversarial = adversarial
        self.disc_hidden = tuple(disc_hidden)
        self.disc_dropout = disc_dropout
        self.disc_lr = disc_lr
        self.gen_lr = gen_lr
        self.epochs = epochs
        self.batch_size = batch_size
        self.lr = lr
        self.train_seed = train_seed
        self.n_temporal = n_temporal
        self.early_patience = early_patience
        self.start_from_epoch = start_from_epoch
        self.min_delta = min_delta
        # fitted state
        self.enc0 = None          # first encoder layer (pre-concat)
        self.enc_rest: list = []  # tanh layers after the temporal concat
        self.mu_head = self.lv_head = None
        self.dec_hidden: list = []
        self.out_head = None
        self.disc_layers: list = []
        self.disc_head = None
        self.x_scale = 1.0
        self.loss_history: list[float] = []
        self.mmd_history: list[float] = []
        self.d_loss_history: list[float] = []
        self.g_loss_history: list[float] = []

    # -------------------------------------------------------- forward --
    def _encode(self, xb: np.ndarray, tb: np.ndarray | None):
        from .mlp import tanh_stack_forward

        h0, acts0 = tanh_stack_forward(xb, [self.enc0])
        h = np.concatenate([h0, tb], axis=1) if tb is not None else h0
        hr, acts_r = tanh_stack_forward(h, self.enc_rest)
        mu = hr @ self.mu_head[0] + self.mu_head[1]
        lv = np.clip(hr @ self.lv_head[0] + self.lv_head[1], -10.0, 10.0)
        return mu, lv, (acts0, acts_r, hr)

    def _decode_batch(self, z: np.ndarray, tb: np.ndarray | None):
        from .mlp import tanh_stack_forward

        d_in = np.concatenate([z, tb], axis=1) if tb is not None else z
        hd, acts_d = tanh_stack_forward(d_in, self.dec_hidden)
        xh = hd @ self.out_head[0] + self.out_head[1]
        return xh, (acts_d, hd)

    def _disc_forward(
        self,
        xb: np.ndarray,
        tb: np.ndarray | None,
        rng: np.random.Generator | None = None,
    ):
        """Discriminator forward. With ``rng`` (training), each layer
        applies seeded inverted Dropout(disc_dropout) after its
        LeakyReLU — the reference discriminator block
        (vae_gan_trainer.py:119-122) — drawing fresh masks per call the
        way Keras does per training=True invocation. Without ``rng``
        (inference), dropout is the identity."""
        from .mlp import lrelu_stack_forward

        d_in = np.concatenate([xb, tb], axis=1) if tb is not None else xb
        h, acts, scales = lrelu_stack_forward(
            d_in, self.disc_layers, dropout=self.disc_dropout, rng=rng
        )
        s = h @ self.disc_head[0] + self.disc_head[1]
        return _sigmoid(s[:, 0]), acts, scales

    def _disc_backprop_input(
        self, p: np.ndarray, target: np.ndarray, acts: list, scales: list | None = None
    ):
        """d(BCE(target, p))/d(disc input), discriminator frozen.
        Mean-over-batch convention; sigmoid folds to (p − target)."""
        from .mlp import lrelu_stack_backward

        B = len(p)
        ds = ((p - target) / B)[:, None] @ self.disc_head[0].T
        d_in, _ = lrelu_stack_backward(ds, acts, self.disc_layers, scales=scales)
        return d_in

    # ----------------------------------------------------- loss/grads --
    def vae_step_grads(
        self,
        xb: np.ndarray,
        tb: np.ndarray | None,
        eps: np.ndarray,
        kl_w: float,
    ):
        """One VAE-step loss + analytic gradients for a fixed ε draw —
        a pure function of (params, batch, ε), so tests can check it
        against central differences. Returns (recon, kl, mmd, grads)."""
        from .mlp import mmd_and_grad, tanh_stack_backward

        D, L, NT = self.window_rows, self.latent_dim, self.n_temporal
        B = len(xb)
        mu, lv, (acts0, acts_r, hr) = self._encode(xb, tb)
        sd = np.exp(0.5 * lv)
        z = mu + eps * sd
        xh, (acts_d, hd) = self._decode_batch(z, tb)
        diff = xh - xb
        recon = float(np.mean(diff * diff))
        kl = float(-0.5 * np.mean(1.0 + lv - mu * mu - np.exp(lv)))
        if self.mmd_lambda:
            mmd, g_mmd = mmd_and_grad(xb, xh)
        else:
            mmd, g_mmd = 0.0, 0.0
        dxh = 2.0 * diff / (B * D) + self.mmd_lambda * g_mmd
        g_out = (hd.T @ dxh, dxh.sum(axis=0))
        dhd = dxh @ self.out_head[0].T
        d_din, g_dec = tanh_stack_backward(dhd, acts_d, self.dec_hidden)
        dz = d_din[:, :L] if NT else d_din
        # KL uses the reference's element-wise mean (over B·L)
        dmu = dz + kl_w * mu / (B * L)
        clip_mask = (lv > -10.0) & (lv < 10.0)
        dlv = (dz * eps * 0.5 * sd + kl_w * (-0.5) * (1.0 - np.exp(lv)) / (B * L)) * clip_mask
        g_mu = (hr.T @ dmu, dmu.sum(axis=0))
        g_lv = (hr.T @ dlv, dlv.sum(axis=0))
        dhr = dmu @ self.mu_head[0].T + dlv @ self.lv_head[0].T
        dh, g_enc_rest = tanh_stack_backward(dhr, acts_r, self.enc_rest)
        dh0 = dh[:, : self.hidden[0]] if NT else dh
        _, g_enc0 = tanh_stack_backward(dh0, acts0, [self.enc0])
        grads = {
            "enc0": g_enc0[0],
            "enc_rest": g_enc_rest,
            "mu_head": g_mu,
            "lv_head": g_lv,
            "dec_hidden": g_dec,
            "out_head": g_out,
        }
        return recon, kl, mmd, grads

    def vae_step_loss(self, xb, tb, eps, kl_w) -> float:
        """The scalar the VAE step descends (for numerical checks)."""
        from .mlp import mmd_and_grad

        mu, lv, _ = self._encode(xb, tb)
        z = mu + eps * np.exp(0.5 * lv)
        xh, _ = self._decode_batch(z, tb)
        recon = float(np.mean((xh - xb) ** 2))
        kl = float(-0.5 * np.mean(1.0 + lv - mu * mu - np.exp(lv)))
        mmd = mmd_and_grad(xb, xh)[0] if self.mmd_lambda else 0.0
        return recon + kl_w * kl + self.mmd_lambda * mmd

    def init_params(self, n_features_seen: int | None = None) -> None:
        """Seed-derived parameter init (exposed so tests can build an
        un-fitted network for gradient checking)."""
        from .mlp import dense_init

        D, L, NT = self.window_rows, self.latent_dim, self.n_temporal
        rng = np.random.default_rng(self.train_seed)
        h = list(self.hidden)
        self.enc0 = dense_init(rng, D, h[0])
        w = h[0] + NT
        self.enc_rest = []
        for units in h[1:]:
            self.enc_rest.append(dense_init(rng, w, units))
            w = units
        self.mu_head = dense_init(rng, w, L)
        self.lv_head = dense_init(rng, w, L)
        self.lv_head[1] -= 2.0  # start with small posterior variance
        self.dec_hidden = []
        w = L + NT
        for units in reversed(h):
            self.dec_hidden.append(dense_init(rng, w, units))
            w = units
        self.out_head = dense_init(rng, w, D)
        self.disc_layers = []
        w = D + NT
        for units in self.disc_hidden:
            self.disc_layers.append(dense_init(rng, w, units))
            w = units
        self.disc_head = dense_init(rng, w, 1)

    # ------------------------------------------------------------ fit --
    def fit(self, X: np.ndarray, temporal: np.ndarray | None = None) -> "MlpVae":
        """SGD over window rows. X: (N, window_rows) in deterministic
        order (the caller sorts); temporal: (N, n_temporal) aligned
        cyclical features when conditional."""
        from .mlp import dense_init, mmd_and_grad, sgd_step, tanh_stack_backward

        D, L, NT = self.window_rows, self.latent_dim, self.n_temporal
        X = np.asarray(X, dtype=np.float64)
        if X.ndim != 2 or X.shape[1] != D:
            raise ValueError(f"expected (N, {D}) windows, got {X.shape}")
        if NT:
            if temporal is None or np.asarray(temporal).shape != (len(X), NT):
                raise ValueError(f"conditional model needs (N, {NT}) temporal features")
            temporal = np.asarray(temporal, dtype=np.float64)
        self.x_scale = float(X.std()) or 1.0
        Xn = X / self.x_scale
        self.init_params()
        # the training stream uses a SEPARATE rng from the init so
        # init_params() in tests reproduces fit()'s starting point
        rng = np.random.default_rng(self.train_seed + 0x9E3779B9)

        n = len(Xn)
        lr = self.lr
        self.loss_history, self.mmd_history = [], []
        self.d_loss_history, self.g_loss_history = [], []
        best = float("inf")
        patience = 0
        for epoch in range(1, self.epochs + 1):
            kl_w = self.beta_kl * (
                min(1.0, epoch / max(self.kl_anneal_epochs, 1))
                if self.kl_anneal_epochs
                else 1.0
            )
            order = rng.permutation(n)
            ep_recon = ep_kl = ep_mmd = ep_d = ep_g = 0.0
            for i0 in range(0, n, self.batch_size):
                idx = order[i0 : i0 + self.batch_size]
                xb = Xn[idx]
                tb = temporal[idx] if NT else None
                B = len(xb)

                # ---- VAE step (encoder + decoder; vae_gan_trainer.py:236-248)
                eps = rng.standard_normal((B, L))
                recon, kl, mmd, g = self.vae_step_grads(xb, tb, eps, kl_w)
                sgd_step([self.enc0], [g["enc0"]], lr)
                sgd_step(self.enc_rest, g["enc_rest"], lr)
                sgd_step([self.mu_head], [g["mu_head"]], lr)
                sgd_step([self.lv_head], [g["lv_head"]], lr)
                sgd_step(self.dec_hidden, g["dec_hidden"], lr)
                sgd_step([self.out_head], [g["out_head"]], lr)

                d_loss = g_loss = 0.0
                if self.adversarial:
                    from .mlp import disc_bce_update

                    # ---- discriminator step (decoder frozen; :251-266) —
                    # one combined real+fake update, shared with MlpGan
                    noise = rng.standard_normal((B, L))
                    fake, _ = self._decode_batch(noise, tb)
                    pr, acts_real, sc_real = self._disc_forward(xb, tb, rng)
                    pf, acts_fake, sc_fake = self._disc_forward(fake, tb, rng)
                    d_loss = disc_bce_update(
                        pr, acts_real, pf, acts_fake,
                        self.disc_layers, self.disc_head, self.disc_lr,
                        scales_real=sc_real, scales_fake=sc_fake,
                    )

                    # ---- generator-adversarial step (disc frozen; :269-278)
                    noise = rng.standard_normal((B, L))
                    fake, (acts_fd, hfd) = self._decode_batch(noise, tb)
                    pf, acts_fake, sc_fake = self._disc_forward(fake, tb, rng)
                    g_loss = -float(np.mean(np.log(np.clip(pf, 1e-12, 1.0))))
                    dfake_full = self._disc_backprop_input(
                        pf, np.ones(B), acts_fake, sc_fake
                    )
                    dfake = dfake_full[:, :D] if NT else dfake_full
                    g_out2 = (hfd.T @ dfake, dfake.sum(axis=0))
                    dhfd = dfake @ self.out_head[0].T
                    _, g_dec2 = tanh_stack_backward(dhfd, acts_fd, self.dec_hidden)
                    sgd_step(self.dec_hidden, g_dec2, self.gen_lr)
                    sgd_step([self.out_head], [g_out2], self.gen_lr)

                ep_recon += recon * B
                ep_kl += kl * B
                ep_mmd += mmd * B
                ep_d += d_loss * B
                ep_g += g_loss * B
            avg_recon, avg_kl, avg_mmd = ep_recon / n, ep_kl / n, ep_mmd / n
            total = avg_recon + kl_w * avg_kl + self.mmd_lambda * avg_mmd
            self.loss_history.append(total)
            self.mmd_history.append(avg_mmd)
            self.d_loss_history.append(ep_d / n)
            self.g_loss_history.append(ep_g / n)
            # early stopping protocol (vae_gan_trainer.py:300-309)
            if self.early_patience and epoch >= self.start_from_epoch:
                if total < best - self.min_delta:
                    best, patience = total, 0
                else:
                    patience += 1
                    if patience >= self.early_patience:
                        break
        return self

    # -------------------------------------------------------- exports --
    def decoder_export(self):
        """(dec_hidden, out_head, n_temporal) in DATA units — the linear
        output head absorbs x_scale, so downstream decode is exactly
        `tanh-stack(z⊕temp) @ Wo + bo`."""
        if self.out_head is None:
            raise RuntimeError("fit() first")
        hidden = [(W.copy(), b.copy()) for W, b in self.dec_hidden]
        out = (self.out_head[0] * self.x_scale, self.out_head[1] * self.x_scale)
        return hidden, out, self.n_temporal

    def reconstruction_mse(self, X: np.ndarray, temporal: np.ndarray | None = None) -> float:
        """Deterministic (ε=0) reconstruction error in data units."""
        if self.out_head is None:
            raise RuntimeError("fit() first")
        Xn = np.asarray(X, dtype=np.float64) / self.x_scale
        tb = np.asarray(temporal, dtype=np.float64) if self.n_temporal else None
        mu, _, _ = self._encode(Xn, tb)
        xh, _ = self._decode_batch(mu, tb)
        return float(np.mean((xh - Xn) ** 2)) * self.x_scale**2
