"""NN — single-hidden-layer MLP classifier (SURVEY.md §2.9).

The reference's ``NN`` learner is ND4J-backed (crash log shows
``libnd4jcpu.so`` loaded inside FlinkSpoke, hs_err_pid77107.log:10) and lives
in the external mlAPI library. Here: a numpy MLP with

* deterministic seeded init (seed 25, FlinkSpoke.scala:52 discipline),
* sequential SGD partial_fit (tanh hidden layer, sigmoid output, log loss),
* BSP merge = weighted parameter averaging (same family as the linear
  learners; valid for small nets trained from a shared init point —
  the standard parameter-server treatment).

Labels {-1, +1} to match the binary-classifier surface of PA/SVM.
"""

from __future__ import annotations

import numpy as np

from .base import Learner, register


@register
class NN(Learner):
    name = "NN"
    is_classifier = True

    def init_state(self, dim: int, hyper: dict) -> dict:
        hidden = int(hyper.get("hidden", 8))
        rng = np.random.default_rng(int(hyper.get("seed", 25)))
        return {
            "W1": rng.normal(0.0, 1.0 / np.sqrt(dim + 1), size=(hidden, dim + 1)),
            "W2": rng.normal(0.0, 1.0 / np.sqrt(hidden + 1), size=hidden + 1),
            "n": 0,
            "cum_loss": 0.0,
        }

    def _forward(self, x: np.ndarray, W1: np.ndarray, W2: np.ndarray):
        h = np.tanh(W1 @ x)
        hb = np.append(h, 1.0)
        p = 1.0 / (1.0 + np.exp(-float(W2 @ hb)))
        return h, hb, p

    def partial_fit(self, X, y, state, hyper):
        lr = float(hyper.get("lr", 0.05))
        W1 = state["W1"].copy()
        W2 = state["W2"].copy()
        cum = float(state["cum_loss"])
        Xb = np.hstack([X, np.ones((X.shape[0], 1))])
        y01 = (np.asarray(y) + 1.0) / 2.0  # {-1,1} -> {0,1}
        for i in range(Xb.shape[0]):
            x, t = Xb[i], y01[i]
            h, hb, p = self._forward(x, W1, W2)
            eps = 1e-12
            cum += -(t * np.log(p + eps) + (1 - t) * np.log(1 - p + eps))
            # backprop: dL/dz_out = p - t
            dz = p - t
            gW2 = dz * hb
            dh = dz * W2[:-1] * (1.0 - h * h)
            gW1 = np.outer(dh, x)
            W2 -= lr * gW2
            W1 -= lr * gW1
        return {
            "W1": W1,
            "W2": W2,
            "n": int(state["n"]) + Xb.shape[0],
            "cum_loss": cum,
        }

    def _scores(self, X, state):
        Xb = np.hstack([X, np.ones((X.shape[0], 1))])
        H = np.tanh(Xb @ state["W1"].T)
        Hb = np.hstack([H, np.ones((H.shape[0], 1))])
        return 1.0 / (1.0 + np.exp(-(Hb @ state["W2"])))

    def predict(self, X, state):
        return np.where(self._scores(X, state) >= 0.5, 1.0, -1.0)

    def loss(self, X, y, state):
        p = np.clip(self._scores(X, state), 1e-12, 1 - 1e-12)
        t = (np.asarray(y) + 1.0) / 2.0
        return float(np.mean(-(t * np.log(p) + (1 - t) * np.log(1 - p))))
