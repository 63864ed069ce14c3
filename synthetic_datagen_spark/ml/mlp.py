"""Numpy MLP micro-kernels shared by the deep trainers (M1/M2/M3).

The reference builds its encoder/decoder/discriminator as small Keras
MLPs (vae_gan_trainer.py:46-124: tanh Dense stacks sized
``initial_layer_size`` → ``//divisor`` per layer, LeakyReLU(0.2)
discriminator) and adds a Gaussian-kernel MMD² term to the VAE loss
(vae_gan_trainer.py:131-139, weight ``mmd_lambda``). TF is absent in
this environment, so these are the same computations with explicit
analytic gradients; every consumer seed-derives its weights from
``numpy.random.default_rng`` so training stays a pure function of
(windows, train_seed).

All forward passes cache activations so the matching backward pass is
exact (gradient-checked against central differences in
tests/test_generators.py::test_mlp_gradient_check).
"""

from __future__ import annotations

import numpy as np


# ------------------------------------------------------------- layers --
def dense_init(rng: np.random.Generator, fan_in: int, fan_out: int) -> list:
    """[W, b] with 1/sqrt(fan_in) init (mutable lists so SGD updates
    in place)."""
    return [rng.normal(0.0, 1.0 / np.sqrt(fan_in), (fan_in, fan_out)), np.zeros(fan_out)]


def tanh_stack_forward(x: np.ndarray, layers: list) -> tuple[np.ndarray, list]:
    """tanh(x @ W + b) through the stack; returns (out, activations)
    where activations[0] = x and activations[i+1] = output of layer i."""
    acts = [x]
    h = x
    for W, b in layers:
        h = np.tanh(h @ W + b)
        acts.append(h)
    return h, acts


def tanh_stack_backward(dout: np.ndarray, acts: list, layers: list) -> tuple[np.ndarray, list]:
    """Backprop through the tanh stack. Returns (dx, grads) with
    grads[i] = (gW, gb) aligned to layers[i]."""
    grads: list = [None] * len(layers)
    for i in range(len(layers) - 1, -1, -1):
        W, _ = layers[i]
        a_in, a_out = acts[i], acts[i + 1]
        dpre = dout * (1.0 - a_out * a_out)
        grads[i] = (a_in.T @ dpre, dpre.sum(axis=0))
        dout = dpre @ W.T
    return dout, grads


def lrelu_stack_forward(
    x: np.ndarray,
    layers: list,
    alpha: float = 0.2,
    dropout: float = 0.0,
    rng: np.random.Generator | None = None,
    scales: list | None = None,
) -> tuple[np.ndarray, list, list | None]:
    """LeakyReLU(alpha) stack with optional inverted dropout after each
    layer — the reference discriminator's hidden block
    (vae_gan_trainer.py:119-122: Dense → LeakyReLU(0.2) →
    Dropout(disc_dropout) per layer). The mask is a seeded Bernoulli
    draw from the caller's rng, so training remains a pure function of
    (windows, train_seed) with dropout active.

    Returns (out, acts, scales): ``acts`` holds POST-dropout activations
    (the actual inputs of each next layer, which is what the weight
    gradients need); ``scales`` is the per-layer mask/(1-p) array, or
    None when dropout is off (inference / dropout=0.0). Pass ``scales``
    back in to replay a forward under FIXED masks (gradient checks)."""
    acts = [x]
    h = x
    draw = dropout > 0.0 and rng is not None and scales is None
    out_scales: list | None = [] if draw else scales
    for i, (W, b) in enumerate(layers):
        pre = h @ W + b
        h = np.where(pre > 0.0, pre, alpha * pre)
        if draw:
            s = (rng.random(h.shape) >= dropout) / (1.0 - dropout)
            h = h * s
            out_scales.append(s)
        elif scales is not None:
            h = h * scales[i]
        acts.append(h)
    return h, acts, out_scales


def lrelu_stack_backward(
    dout: np.ndarray,
    acts: list,
    layers: list,
    alpha: float = 0.2,
    scales: list | None = None,
) -> tuple[np.ndarray, list]:
    """Backprop matching lrelu_stack_forward (same ``scales``). Dropped
    units have a_out == 0 AND scale == 0, so the LeakyReLU-derivative
    lookup on the post-dropout activation is exact: surviving units keep
    the sign of their pre-activation; dropped units contribute 0."""
    grads: list = [None] * len(layers)
    for i in range(len(layers) - 1, -1, -1):
        W, _ = layers[i]
        a_in, a_out = acts[i], acts[i + 1]
        if scales is not None:
            dout = dout * scales[i]
        # a_out > 0 ⟺ pre-activation > 0 (alpha > 0 preserves sign)
        dpre = dout * np.where(a_out > 0.0, 1.0, alpha)
        grads[i] = (a_in.T @ dpre, dpre.sum(axis=0))
        dout = dpre @ W.T
    return dout, grads


def sgd_step(layers: list, grads: list, lr: float) -> None:
    for layer, (gW, gb) in zip(layers, grads):
        layer[0] -= lr * gW
        layer[1] -= lr * gb


# ----------------------------------------------------- adversarial step --
def disc_bce_update(
    pr: np.ndarray,
    acts_real: list,
    pf: np.ndarray,
    acts_fake: list,
    disc_layers: list,
    disc_head: list,
    lr: float,
    scales_real: list | None = None,
    scales_fake: list | None = None,
) -> float:
    """One discriminator step on the averaged real/fake BCE pair, shared
    by MlpGan.fit and MlpVae's adversarial phase.

    Both halves' gradients are evaluated at the CURRENT parameters (from
    the halves' own forward activations) and SUMMED before a single SGD
    update — the reference computes d_loss for both halves inside one
    GradientTape and applies one apply_gradients
    (gan_trainer.py:77-88, vae_gan_trainer.py:251-266). Stepping after
    the real half and then backpropagating the fake half through the
    already-updated weights with pre-update activations would apply a
    vector that is the gradient at no parameter point, biasing every D
    step by O(lr).

    Returns the averaged d_loss.
    """
    B = len(pr)
    d_loss = -0.5 * float(
        np.mean(np.log(np.clip(pr, 1e-12, 1.0)))
        + np.mean(np.log(np.clip(1.0 - pf, 1e-12, 1.0)))
    )
    tot_layers: list | None = None
    tot_head: tuple | None = None
    for p, target, acts, scales in (
        (pr, 1.0, acts_real, scales_real), (pf, 0.0, acts_fake, scales_fake)
    ):
        ds = (0.5 * (p - target) / B)[:, None]
        g_head = (acts[-1].T @ ds, ds.sum(axis=0))
        _, g_disc = lrelu_stack_backward(
            ds @ disc_head[0].T, acts, disc_layers, scales=scales
        )
        if tot_layers is None:
            tot_layers, tot_head = g_disc, g_head
        else:
            tot_layers = [
                (a0 + b0, a1 + b1) for (a0, a1), (b0, b1) in zip(tot_layers, g_disc)
            ]
            tot_head = (tot_head[0] + g_head[0], tot_head[1] + g_head[1])
    sgd_step(disc_layers, tot_layers, lr)
    sgd_step([disc_head], [tot_head], lr)
    return d_loss


# ---------------------------------------------------------------- MMD --
def _sq_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise squared euclidean distances, (len(a), len(b))."""
    aa = np.sum(a * a, axis=1)[:, None]
    bb = np.sum(b * b, axis=1)[None, :]
    return np.maximum(aa + bb - 2.0 * (a @ b.T), 0.0)


def mmd_and_grad(
    real: np.ndarray, fake: np.ndarray, gamma: float | None = None
) -> tuple[float, np.ndarray]:
    """Gaussian-kernel MMD² between two batches and d(MMD²)/d(fake).

    Matches the reference estimator exactly (vae_gan_trainer.py:131-139):
    biased all-pairs means, gamma defaulting to
    1 / (mean pairwise sq-dist among real + 1e-8). gamma depends on the
    real batch only, so treating it as a constant in the gradient is
    exact, not an approximation.
    """
    rr = _sq_dists(real, real)
    if gamma is None:
        gamma = 1.0 / (float(rr.mean()) + 1e-8)
    ff = _sq_dists(fake, fake)
    rf = _sq_dists(real, fake)
    kxx = np.exp(-gamma * rr)
    kyy = np.exp(-gamma * ff)
    kxy = np.exp(-gamma * rf)
    n_r, n_f = len(real), len(fake)
    mmd = float(kxx.mean() + kyy.mean() - 2.0 * kxy.mean())
    # d mean(Kyy)/dy_i  = (-4γ/n_f²) Σ_j Kyy[i,j] (y_i − y_j)
    # d(−2 mean(Kxy))/dy_i = (+4γ/(n_r·n_f)) Σ_j Kxy[j,i] (y_i − x_j)
    g_yy = (-4.0 * gamma / (n_f * n_f)) * (kyy.sum(axis=1)[:, None] * fake - kyy @ fake)
    g_xy = (4.0 * gamma / (n_r * n_f)) * (kxy.sum(axis=0)[:, None] * fake - kxy.T @ real)
    return mmd, g_yy + g_xy
