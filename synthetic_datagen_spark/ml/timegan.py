"""M4/G11 — protocol-faithful numpy TimeGAN with real GRU stacks.

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

TF is absent in this environment, so the networks are implemented
directly in numpy with analytic backprop-through-time: each network is
the reference's architecture (timegan_generator.py:273-316) — a stack
of `n_layers` GRU(hidden_dim, return_sequences=True) layers plus a
Dense head (sigmoid heads for embedder/generator/supervisor :282,298,
306; linear heads for recovery/discriminator :290,314; the supervisor
stacks `n_layers - 1` GRUs :304). GRU cells use the standard Keras
gate equations (update/reset/candidate, h_t = z·h_{t-1} + (1-z)·ĥ_t);
gradients are exact BPTT, verified against central differences in
`tests/test_ml_and_sources.py`. `n_layers=0` degenerates every net to
its per-timestep Dense head — the legacy (format_version 1) artifact
layout loads as exactly that case.

The three-phase PROTOCOL — loss weighting, per-phase Adam,
patience/min_delta early stopping, best-weight restore, [0,1] min-max
data normalization (:88-97) — is the reference's exactly.
Deterministic in the seed (single default_rng drives init, shuffling,
z draws).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession


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


# ------------------------------------------------------------------ GRU --
# Keras-convention cell (layers.GRU defaults):
#   z_t = σ(x_t·Wz + h_{t-1}·Uz + bz)          update gate
#   r_t = σ(x_t·Wr + h_{t-1}·Ur + br)          reset gate
#   ĥ_t = tanh(x_t·Wh + (r_t ⊙ h_{t-1})·Uh + bh)
#   h_t = z_t ⊙ h_{t-1} + (1 − z_t) ⊙ ĥ_t
_GRU_SUFFIXES = ("Wz", "Wr", "Wh", "Uz", "Ur", "Uh", "bz", "br", "bh")


def _gru_init(rng: np.random.Generator, d_in: int, h: int, scale: float) -> dict:
    return {
        "Wz": rng.normal(0, scale, (d_in, h)),
        "Wr": rng.normal(0, scale, (d_in, h)),
        "Wh": rng.normal(0, scale, (d_in, h)),
        "Uz": rng.normal(0, scale, (h, h)),
        "Ur": rng.normal(0, scale, (h, h)),
        "Uh": rng.normal(0, scale, (h, h)),
        "bz": np.zeros(h),
        "br": np.zeros(h),
        "bh": np.zeros(h),
    }


def _gru_forward(p: dict, pre: str, x: np.ndarray):
    """x (B,T,D) → h (B,T,H) with full BPTT cache."""
    Wz, Wr, Wh = p[pre + ".Wz"], p[pre + ".Wr"], p[pre + ".Wh"]
    Uz, Ur, Uh = p[pre + ".Uz"], p[pre + ".Ur"], p[pre + ".Uh"]
    bz, br, bh = p[pre + ".bz"], p[pre + ".br"], p[pre + ".bh"]
    B, Tn, _ = x.shape
    H = Wz.shape[1]
    # input projections for all timesteps at once (one matmul each)
    xz = x @ Wz + bz
    xr = x @ Wr + br
    xh = x @ Wh + bh
    h = np.zeros((B, Tn, H))
    z = np.empty((B, Tn, H))
    r = np.empty((B, Tn, H))
    hh = np.empty((B, Tn, H))
    h_prev = np.zeros((B, H))
    for t in range(Tn):
        z[:, t] = _sigmoid(xz[:, t] + h_prev @ Uz)
        r[:, t] = _sigmoid(xr[:, t] + h_prev @ Ur)
        hh[:, t] = np.tanh(xh[:, t] + (r[:, t] * h_prev) @ Uh)
        h[:, t] = z[:, t] * h_prev + (1.0 - z[:, t]) * hh[:, t]
        h_prev = h[:, t]
    return h, (x, z, r, hh, h)


def _gru_backward(p: dict, pre: str, dh_out: np.ndarray, cache):
    """dh_out (B,T,H) grads on every h_t → (dx, grads) via exact BPTT."""
    x, z, r, hh, h = cache
    Wz, Wr, Wh = p[pre + ".Wz"], p[pre + ".Wr"], p[pre + ".Wh"]
    Uz, Ur, Uh = p[pre + ".Uz"], p[pre + ".Ur"], p[pre + ".Uh"]
    B, Tn, H = h.shape
    g = {s: np.zeros_like(p[pre + "." + s]) for s in _GRU_SUFFIXES}
    dx = np.empty_like(x)
    dh_carry = np.zeros((B, H))
    for t in range(Tn - 1, -1, -1):
        h_prev = h[:, t - 1] if t > 0 else np.zeros((B, H))
        zt, rt, hht = z[:, t], r[:, t], hh[:, t]
        dh = dh_out[:, t] + dh_carry
        dz = dh * (h_prev - hht)
        dhh = dh * (1.0 - zt)
        dh_prev = dh * zt
        # candidate (tanh)
        dhh_pre = dhh * (1.0 - hht * hht)
        g["Wh"] += x[:, t].T @ dhh_pre
        g["Uh"] += (rt * h_prev).T @ dhh_pre
        g["bh"] += dhh_pre.sum(0)
        drh = dhh_pre @ Uh.T  # grad wrt (r ⊙ h_prev)
        dr = drh * h_prev
        dh_prev += drh * rt
        dxt = dhh_pre @ Wh.T
        # gates (sigmoid)
        dz_pre = dz * zt * (1.0 - zt)
        dr_pre = dr * rt * (1.0 - rt)
        g["Wz"] += x[:, t].T @ dz_pre
        g["Uz"] += h_prev.T @ dz_pre
        g["bz"] += dz_pre.sum(0)
        g["Wr"] += x[:, t].T @ dr_pre
        g["Ur"] += h_prev.T @ dr_pre
        g["br"] += dr_pre.sum(0)
        dxt += dz_pre @ Wz.T + dr_pre @ Wr.T
        dh_prev += dz_pre @ Uz.T + dr_pre @ Ur.T
        dx[:, t] = dxt
        dh_carry = dh_prev
    return dx, {pre + "." + s: g[s] for s in _GRU_SUFFIXES}


# ------------------------------------------------------------------ net --
# A network = n_gru GRU layers + a Dense head ((H|D_in, out) weight,
# sigmoid or linear activation). n_gru == 0 → per-timestep Dense only.


def _net_init(
    rng: np.random.Generator, name: str, d_in: int, h: int, out: int, n_gru: int,
    scale: float = 0.1,
) -> dict:
    p: dict[str, np.ndarray] = {}
    d = d_in
    for i in range(n_gru):
        layer = _gru_init(rng, d, h, scale)
        for s in _GRU_SUFFIXES:
            p[f"{name}.g{i}.{s}"] = layer[s]
        d = h
    p[f"{name}.head.W"] = rng.normal(0, scale, (d, out))
    p[f"{name}.head.b"] = np.zeros(out)
    return p


def _net_forward(p: dict, name: str, n_gru: int, x: np.ndarray, head_act: str):
    caches = []
    a = x
    for i in range(n_gru):
        a, c = _gru_forward(p, f"{name}.g{i}", a)
        caches.append(c)
    pre = a @ p[f"{name}.head.W"] + p[f"{name}.head.b"]
    y = _sigmoid(pre) if head_act == "sigmoid" else pre
    return y, (caches, a, y)


def _net_backward(p: dict, name: str, n_gru: int, dy: np.ndarray, cache, head_act: str):
    caches, a, y = cache
    dpre = dy * y * (1.0 - y) if head_act == "sigmoid" else dy
    grads = {
        f"{name}.head.W": np.einsum("btd,bto->do", a, dpre),
        f"{name}.head.b": dpre.sum((0, 1)),
    }
    da = dpre @ p[f"{name}.head.W"].T
    for i in range(n_gru - 1, -1, -1):
        da, g = _gru_backward(p, f"{name}.g{i}", da, caches[i])
        grads.update(g)
    return da, grads


def _net_keys(p: dict, name: str) -> list[str]:
    return sorted(k for k in p if k.startswith(name + "."))


class NumpyTimeGan:
    """Five GRU-stack networks over windows X ∈ (N, T), reference
    architecture (timegan_generator.py:273-316):

    embedder       h = σ-Dense(GRU×n(x))        (1 → H)
    recovery       x̂ = Dense(GRU×n(h))          (H → 1)
    generator      e = σ-Dense(GRU×n(z))        (L → H)
    supervisor     ĥ = σ-Dense(GRU×(n−1)(h))    (H → H)
    discriminator  y = Dense(GRU×n(h))          (H → 1, logits)
    """

    def __init__(
        self,
        seq_len: int,
        hidden_dim: int = 16,
        latent_dim: int = 8,
        n_layers: int = 3,
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
        self.n_layers = n_layers
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

    @property
    def _n_sup(self) -> int:
        return max(0, self.n_layers - 1)

    # ------------------------------------------------------------ fwd --
    def _embed(self, p: dict, x: np.ndarray):
        return _net_forward(p, "e", self.n_layers, x[..., None], "sigmoid")

    def _recover(self, p: dict, h: np.ndarray):
        y, c = _net_forward(p, "r", self.n_layers, h, "linear")
        return y[..., 0], c

    def _generate_e(self, p: dict, z: np.ndarray):
        return _net_forward(p, "g", self.n_layers, z, "sigmoid")

    def _supervise(self, p: dict, h: np.ndarray):
        return _net_forward(p, "s", self._n_sup, h, "sigmoid")

    def _discriminate(self, p: dict, h: np.ndarray):
        y, c = _net_forward(p, "d", self.n_layers, h, "linear")
        return y[..., 0], c

    def _init_params(self, rng: np.random.Generator) -> dict:
        H, L, n = self.hidden_dim, self.latent_dim, self.n_layers
        p: dict[str, np.ndarray] = {}
        p.update(_net_init(rng, "e", 1, H, H, n))
        p.update(_net_init(rng, "r", H, H, 1, n))
        p.update(_net_init(rng, "g", L, H, H, n))
        p.update(_net_init(rng, "s", H, H, H, self._n_sup))
        p.update(_net_init(rng, "d", H, H, 1, n))
        return p

    # ------------------------------------------------------------ fit --
    def fit(self, X: np.ndarray) -> "NumpyTimeGan":
        """X: (N, T) raw windows (returns). Normalized to [0,1] by
        global min/max (reference :88-97), chronological 15% val split
        (:102-108)."""
        rng = np.random.default_rng(self.seed)
        X = np.asarray(X, dtype=np.float64)
        self.data_min = float(X.min())
        rngv = float(X.max()) - self.data_min
        self.data_range = rngv if rngv >= 1e-10 else 1.0
        Xn = (X - self.data_min) / self.data_range
        n_val = max(1, int(len(Xn) * self.val_fraction))
        Xt, Xv = Xn[:-n_val], Xn[-n_val:]
        if len(Xt) == 0:
            Xt = Xn

        p = self._init_params(rng)
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

    # exposed as pure functions of p for gradient checking -------------
    def ae_loss(self, p: dict, x: np.ndarray) -> float:
        h, _ = self._embed(p, x)
        xh, _ = self._recover(p, h)
        return float(np.abs(xh - x).mean())

    def ae_grads(self, p: dict, x: np.ndarray) -> dict:
        h, ce = self._embed(p, x)
        xh, cr = self._recover(p, h)
        res = xh - x
        dxh = np.sign(res) / res.size
        dh, g_r = _net_backward(p, "r", self.n_layers, dxh[..., None], cr, "linear")
        _, g_e = _net_backward(p, "e", self.n_layers, dh, ce, "sigmoid")
        return {**g_r, **g_e}

    def sup_loss(self, p: dict, x: np.ndarray) -> float:
        h, _ = self._embed(p, x)
        hh, _ = self._supervise(p, h)
        return float(np.abs(h[:, 1:, :] - hh[:, :-1, :]).mean())

    def sup_grads(self, p: dict, x: np.ndarray) -> dict:
        h, _ = self._embed(p, x)
        hh, cs = self._supervise(p, h)
        diff = h[:, 1:, :] - hh[:, :-1, :]
        dhh = np.zeros_like(hh)
        dhh[:, :-1, :] = -np.sign(diff) / diff.size
        _, g_s = _net_backward(p, "s", self._n_sup, dhh, cs, "sigmoid")
        return g_s

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

    def gen_step_loss(self, p: dict, x: np.ndarray, z: np.ndarray) -> float:
        """Generator-step objective (:457-477): BCE(1, D(S(G(z)))) +
        100·moment(R(S(G(z))), x) + 10·sup-loss on the real path."""
        e_hat, _ = self._generate_e(p, z)
        h_hat, _ = self._supervise(p, e_hat)
        x_hat, _ = self._recover(p, h_hat)
        y_fake, _ = self._discriminate(p, h_hat)
        # BCE with logits against ones: mean(softplus(-y))
        u = float(np.logaddexp(0.0, -y_fake).mean())
        v, _ = self._moment_loss_grad(x_hat, x)
        h_real, _ = self._embed(p, x)
        hh_r, _ = self._supervise(p, h_real)
        diff = h_real[:, 1:, :] - hh_r[:, :-1, :]
        s = float(np.abs(diff).mean())
        return u + 100.0 * v + 10.0 * s

    def gen_step_grads(self, p: dict, x: np.ndarray, z: np.ndarray) -> dict:
        """Grads of gen_step_loss wrt generator + supervisor params only
        (embedder/recovery/discriminator frozen, reference :468-476)."""
        e_hat, cg = self._generate_e(p, z)
        h_hat, cs = self._supervise(p, e_hat)
        x_hat, cr = self._recover(p, h_hat)
        y_fake, cd = self._discriminate(p, h_hat)
        # u: BCE(1, y_fake) with logits → d/dy = σ(y) − 1
        dy = (_sigmoid(y_fake) - 1.0) / y_fake.size
        dh_hat, _ = _net_backward(p, "d", self.n_layers, dy[..., None], cd, "linear")
        # v (×100): moment loss through recovery
        _, dx_hat = self._moment_loss_grad(x_hat, x)
        dh_r, _ = _net_backward(
            p, "r", self.n_layers, 100.0 * dx_hat[..., None], cr, "linear"
        )
        dh_hat = dh_hat + dh_r
        de_hat, g_s = _net_backward(p, "s", self._n_sup, dh_hat, cs, "sigmoid")
        _, g_g = _net_backward(p, "g", self.n_layers, de_hat, cg, "sigmoid")
        # s (×10): supervised loss on the REAL latent path
        h_real, _ = self._embed(p, x)
        hh_r, cs_r = self._supervise(p, h_real)
        diff = h_real[:, 1:, :] - hh_r[:, :-1, :]
        dhh = np.zeros_like(hh_r)
        dhh[:, :-1, :] = -np.sign(diff) / diff.size
        _, g_s2 = _net_backward(p, "s", self._n_sup, 10.0 * dhh, cs_r, "sigmoid")
        for k, v in g_s2.items():
            g_s[k] = g_s[k] + v
        return {**g_g, **g_s}

    def disc_loss(self, p: dict, x: np.ndarray, z: np.ndarray) -> float:
        """Discriminator objective (:478-496): BCE(1, D(h_real)) +
        BCE(0, D(S(G(z))))."""
        h_real, _ = self._embed(p, x)
        e_hat, _ = self._generate_e(p, z)
        h_hat, _ = self._supervise(p, e_hat)
        y_r, _ = self._discriminate(p, h_real)
        y_f, _ = self._discriminate(p, h_hat)
        return float(
            np.logaddexp(0.0, -y_r).mean() + np.logaddexp(0.0, y_f).mean()
        )

    def disc_grads(self, p: dict, x: np.ndarray, z: np.ndarray) -> dict:
        h_real, _ = self._embed(p, x)
        e_hat, _ = self._generate_e(p, z)
        h_hat, _ = self._supervise(p, e_hat)
        y_r, cdr = self._discriminate(p, h_real)
        y_f, cdf = self._discriminate(p, h_hat)
        dyr = (_sigmoid(y_r) - 1.0) / y_r.size
        dyf = _sigmoid(y_f) / y_f.size
        _, g1 = _net_backward(p, "d", self.n_layers, dyr[..., None], cdr, "linear")
        _, g2 = _net_backward(p, "d", self.n_layers, dyf[..., None], cdf, "linear")
        return {k: g1[k] + g2[k] for k in g1}

    # --------------------------------------------------------- phases --
    def _phase_ae(self, p, Xt, Xv, rng) -> None:
        keys = _net_keys(p, "e") + _net_keys(p, "r")
        opt = _Adam(keys, self.lr)
        best, wait, snap = np.inf, 0, None
        for _ in range(self.epochs_ae):
            for bi in self._batches(len(Xt), rng):
                opt.step(p, self.ae_grads(p, Xt[bi]))
            val = self.ae_loss(p, Xv)
            if val < best - self.min_delta:
                best, wait = val, 0
                snap = {k: p[k].copy() for k in keys}
            else:
                wait += 1
            if wait >= self.patience_ae:
                break
        if snap is not None:
            p.update(snap)

    def _phase_sup(self, p, Xt, Xv, rng) -> None:
        keys = _net_keys(p, "s")
        opt = _Adam(keys, self.lr)
        best, wait, snap = np.inf, 0, None
        for _ in range(self.epochs_sup):
            for bi in self._batches(len(Xt), rng):
                opt.step(p, self.sup_grads(p, Xt[bi]))
            val = self.sup_loss(p, Xv)
            if val < best - self.min_delta:
                best, wait = val, 0
                snap = {k: p[k].copy() for k in keys}
            else:
                wait += 1
            if wait >= self.patience_sup:
                break
        if snap is not None:
            p.update(snap)

    def _phase_joint(self, p, Xt, Xv, rng) -> None:
        g_opt = _Adam(_net_keys(p, "g") + _net_keys(p, "s"), self.lr)
        d_opt = _Adam(_net_keys(p, "d"), self.lr)
        L = self.latent_dim
        best, wait, snap = np.inf, 0, None
        for _ in range(self.epochs_joint):
            for bi in self._batches(len(Xt), rng):
                x = Xt[bi]
                z = rng.standard_normal((len(x), x.shape[1], L))
                g_opt.step(p, self.gen_step_grads(p, x, z))
                d_opt.step(p, self.disc_grads(p, x, z))
            # val moment loss on generated vs X_val (:503-519)
            zv = rng.standard_normal((len(Xv), Xv.shape[1], L))
            ev, _ = self._generate_e(p, zv)
            hv, _ = self._supervise(p, ev)
            xv_hat, _ = self._recover(p, hv)
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
        """z (B, T, L) → denormalized windows (B, T): R(S(G(z)))·range+min."""
        if self.p is None:
            raise RuntimeError("fit() first")
        e, _ = self._generate_e(self.p, z)
        h, _ = self._supervise(self.p, e)
        x, _ = self._recover(self.p, h)
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
            "n_layers": self.n_layers,
        }

    def generate(
        self,
        spark: SparkSession,
        anchor_pool: np.ndarray,
        seed: int,
        n_samples: int,
        n_series: int = 1,
        quantize_sig: int | None = None,
    ) -> DataFrame:
        """G11 distributed inference: broadcast the five weight sets,
        the shared windowed_generate_plan with the GRU chain z→G→S→R
        swapped in as make_rets (reference inference:
        timegan_generator.py:192-266 generates windows from z then
        rebuilds prices)."""
        from .decoder import windowed_generate_plan

        if self.p is None:
            raise RuntimeError("fit() first")
        Tn, L = self.seq_len, self.latent_dim
        n_layers, n_sup = self.n_layers, self._n_sup
        p = {k: v.copy() for k, v in self.p.items()}
        dmin, drange = self.data_min, self.data_range

        def make_rets(rng: np.random.Generator, wid: int) -> np.ndarray:
            z = rng.standard_normal((1, Tn, L))
            e, _ = _net_forward(p, "g", n_layers, z, "sigmoid")
            h, _ = _net_forward(p, "s", n_sup, e, "sigmoid")
            return (
                _net_forward(p, "r", n_layers, h, "linear")[0][0, :, 0]
                * drange
                + dmin
            )

        return windowed_generate_plan(
            spark, anchor_pool, seed, n_samples, n_series, Tn, make_rets,
            quantize_sig=quantize_sig,
        )


# ------------------------------------------------------------ artifacts --
_LEGACY_KEY_MAP = {
    # format_version 1 stored the per-timestep (n_layers=0) special
    # case under bare names; map onto the Dense-head layout.
    "We": ("e.head.W", lambda a, H: a.reshape(1, H)),
    "be": ("e.head.b", lambda a, H: a.reshape(H)),
    "Wr": ("r.head.W", lambda a, H: a.reshape(H, 1)),
    "br": ("r.head.b", lambda a, H: a.reshape(1)),
    "Wg": ("g.head.W", lambda a, H: a),
    "bg": ("g.head.b", lambda a, H: a.reshape(H)),
    "Ws": ("s.head.W", lambda a, H: a),
    "bs": ("s.head.b", lambda a, H: a.reshape(H)),
    "Wd": ("d.head.W", lambda a, H: a.reshape(H, 1)),
    "bd": ("d.head.b", lambda a, H: a.reshape(1)),
}


def save_timegan(tg: NumpyTimeGan, path: str) -> None:
    """S5/S7-style artifact layout (reference saves five .keras files +
    meta.json side by side, timegan_generator.py:165-186): one npz
    holding every network's weights, meta.json carrying the
    normalization constants and architecture."""
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
                "n_layers": tg.n_layers,
                "data_min": tg.data_min,
                "data_range": tg.data_range,
                "format_version": 2,
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
        n_layers=meta.get("n_layers", 0),
    )
    H = meta["hidden_dim"]
    with np.load(os.path.join(path, "weights.npz")) as z:
        if meta.get("format_version", 1) >= 2:
            tg.p = {k: z[k].copy() for k in z.files}
        else:
            tg.p = {}
            for old, (new, fix) in _LEGACY_KEY_MAP.items():
                tg.p[new] = fix(z[old].copy(), H)
    tg.data_min = meta["data_min"]
    tg.data_range = meta["data_range"]
    return tg
