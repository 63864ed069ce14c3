"""M10 — numpy LSTM eval predictor, architecture-faithful to the
reference (predictive_evaluator.py:75-135: LSTM(H) → Dense(Dh, relu) →
Dense(1), adam, mse loss, early stopping on val loss with best-weight
restore). TF is absent in this environment, so forward + BPTT + Adam
are implemented directly — everything batched numpy, deterministic in
the seed.

Scale split (SURVEY §3.3): training consumes a BOUNDED window sample on
the driver (the reference trains driver-side too); inference broadcasts
the weight dict and scores batches inside `mapInPandas`, so MAE over
arbitrarily large val/test sets stays a distributed aggregate.
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


class NumpyLstm:
    """Single-layer LSTM + relu dense head, trained with Adam on MSE."""

    def __init__(
        self,
        window: int,
        hidden: int = 32,
        dense: int = 16,
        epochs: int = 50,
        batch_size: int = 64,
        lr: float = 1e-3,
        patience: int = 10,
        seed: int = 42,
    ):
        self.window = window
        self.hidden = hidden
        self.dense = dense
        self.epochs = epochs
        self.batch_size = batch_size
        self.lr = lr
        self.patience = patience
        self.seed = seed
        self.params: dict[str, np.ndarray] | None = None
        self.norm = (0.0, 1.0)  # (mean, std) of train targets/inputs
        self.history: list[float] = []

    # ------------------------------------------------------------ fwd --
    @staticmethod
    def _forward(p: dict, X: np.ndarray, keep: bool = False):
        """X: (B, T) normalized. Returns ŷ (B,) and, if keep, the per-step
        cache for BPTT."""
        B, T = X.shape
        H = p["Wh"].shape[0]
        h = np.zeros((B, H))
        c = np.zeros((B, H))
        cache = []
        for t in range(T):
            z = X[:, t : t + 1] @ p["Wx"] + h @ p["Wh"] + p["b"]
            i = _sigmoid(z[:, :H])
            f = _sigmoid(z[:, H : 2 * H] + 1.0)  # keras unit_forget_bias
            g = np.tanh(z[:, 2 * H : 3 * H])
            o = _sigmoid(z[:, 3 * H :])
            c_new = f * c + i * g
            tc = np.tanh(c_new)
            h_new = o * tc
            if keep:
                cache.append((h, c, i, f, g, o, c_new, tc))
            h, c = h_new, c_new
        d_pre = h @ p["Wd"] + p["bd"]
        d = np.maximum(d_pre, 0.0)
        y = (d @ p["Wo"] + p["bo"])[:, 0]
        if keep:
            return y, (cache, h, d_pre, d)
        return y

    def _backward(self, p, X, dy, fwd):
        """Gradients of 0.5·mean((ŷ−y)²) wrt every parameter."""
        cache, hT, d_pre, d = fwd
        B, T = X.shape
        H = self.hidden
        g_ = {k: np.zeros_like(v) for k, v in p.items()}
        # dense head
        g_["Wo"] = d.T @ dy[:, None] / B
        g_["bo"] = np.array([dy.mean()])
        dd = (dy[:, None] @ p["Wo"].T) * (d_pre > 0)
        g_["Wd"] = hT.T @ dd / B
        g_["bd"] = dd.mean(axis=0)
        dh = dd @ p["Wd"].T
        dc = np.zeros_like(dh)
        for t in range(T - 1, -1, -1):
            h_prev, c_prev, i, f, g, o, c_new, tc = cache[t]
            do = dh * tc
            dc = dc + dh * o * (1.0 - tc * tc)
            di = dc * g
            df = dc * c_prev
            dg = dc * i
            dz = np.concatenate(
                [
                    di * i * (1 - i),
                    df * f * (1 - f),
                    dg * (1 - g * g),
                    do * o * (1 - o),
                ],
                axis=1,
            )
            g_["Wx"] += X[:, t : t + 1].T @ dz / B
            g_["Wh"] += h_prev.T @ dz / B
            g_["b"] += dz.mean(axis=0)
            dh = dz @ p["Wh"].T
            dc = dc * f
        return g_

    # ------------------------------------------------------------ fit --
    def fit(self, X: np.ndarray, y: np.ndarray, Xv: np.ndarray, yv: np.ndarray) -> "NumpyLstm":
        rng = np.random.default_rng(self.seed)
        H, D = self.hidden, self.dense
        mu, sd = float(X.mean()), float(X.std()) or 1.0
        self.norm = (mu, sd)
        Xn, yn = (X - mu) / sd, (y - mu) / sd
        Xvn, yvn = (Xv - mu) / sd, (yv - mu) / sd
        s = 1.0 / np.sqrt(H)
        p = {
            "Wx": rng.normal(0, 1.0, (1, 4 * H)),
            "Wh": rng.normal(0, s, (H, 4 * H)),
            "b": np.zeros(4 * H),
            "Wd": rng.normal(0, s, (H, D)),
            "bd": np.zeros(D),
            "Wo": rng.normal(0, 1.0 / np.sqrt(D), (D, 1)),
            "bo": np.zeros(1),
        }
        m = {k: np.zeros_like(v) for k, v in p.items()}
        v = {k: np.zeros_like(vv) for k, vv in p.items()}
        b1, b2, eps = 0.9, 0.999, 1e-7
        step = 0
        best_val = float("inf")
        best_p = {k: vv.copy() for k, vv in p.items()}
        stale = 0
        n = len(Xn)
        for _ in range(self.epochs):
            order = rng.permutation(n)
            for i0 in range(0, n, self.batch_size):
                idx = order[i0 : i0 + self.batch_size]
                xb, yb = Xn[idx], yn[idx]
                yh, fwd = self._forward(p, xb, keep=True)
                dy = (yh - yb) / 1.0
                grads = self._backward(p, xb, dy, fwd)
                step += 1
                for k in p:
                    m[k] = b1 * m[k] + (1 - b1) * grads[k]
                    v[k] = b2 * v[k] + (1 - b2) * grads[k] ** 2
                    mh = m[k] / (1 - b1**step)
                    vh = v[k] / (1 - b2**step)
                    p[k] -= self.lr * mh / (np.sqrt(vh) + eps)
            val_loss = float(np.mean((self._forward(p, Xvn) - yvn) ** 2))
            self.history.append(val_loss)
            if val_loss < best_val - 1e-12:
                best_val = val_loss
                best_p = {k: vv.copy() for k, vv in p.items()}
                stale = 0
            else:
                stale += 1
                if stale >= self.patience:
                    break
        self.params = best_p  # keras restore_best_weights
        return self

    # -------------------------------------------------------- predict --
    def predict(self, X: np.ndarray) -> np.ndarray:
        """ŷ in ORIGINAL units. Safe to call inside executors with the
        broadcast (params, norm)."""
        if self.params is None:
            raise RuntimeError("fit() first")
        mu, sd = self.norm
        return self._forward(self.params, (X - mu) / sd) * sd + mu

    def export(self) -> dict:
        return {"params": self.params, "norm": self.norm, "window": self.window}

    @staticmethod
    def predict_with(export: dict, X: np.ndarray) -> np.ndarray:
        mu, sd = export["norm"]
        return NumpyLstm._forward(export["params"], (X - mu) / sd) * sd + mu
