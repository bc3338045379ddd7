"""NN — configurable-topology MLP classifier (SURVEY.md §2.9).

The reference's ``NN`` learner is ND4J-backed (crash log shows
``libnd4jcpu.so`` loaded inside FlinkSpoke, hs_err_pid77107.log:10) and
lives in the external mlAPI library; its topology arrives through the
learner's generic ``dataStructure`` map, which the hub splits and ships
alongside parameters and hyper-parameters (FlinkNetwork.scala:160-176).
Here: a numpy MLP with

* arbitrary hidden-layer widths — ``hyper["dataStructure"]
  ["hiddenLayers"]`` (reference parity spelling), ``hyper
  ["hidden_layers"]``, or the legacy scalar ``hyper["hidden"]`` — the
  single-hidden-layer configuration reproduces the previous fixed
  topology bit-for-bit (same rng draw order),
* deterministic seeded init (seed 25, FlinkSpoke.scala:52 discipline),
* sequential SGD partial_fit (tanh hidden layers, sigmoid output, log
  loss) with full backprop through every layer,
* BSP merge = weighted parameter averaging over the per-layer arrays
  ``W1..W{L+1}`` (same family as the linear learners; valid for small
  nets trained from a shared init point — the standard parameter-server
  treatment; merge-soundness pinned in tests/test_ht_nn.py).

Labels {-1, +1} to match the binary-classifier surface of PA/SVM.
"""

from __future__ import annotations

import numpy as np

from .base import Learner, register


def _hidden_layers(hyper: dict) -> list[int]:
    ds = hyper.get("dataStructure") or {}
    layers = (
        ds.get("hiddenLayers")
        or hyper.get("hidden_layers")
        or [hyper.get("hidden", 8)]
    )
    layers = [int(h) for h in layers]
    if not layers or any(h < 1 for h in layers):
        raise ValueError(f"invalid hidden layer widths: {layers}")
    return layers


@register
class NN(Learner):
    name = "NN"
    is_classifier = True

    def init_state(self, dim: int, hyper: dict) -> dict:
        layers = _hidden_layers(hyper)
        rng = np.random.default_rng(int(hyper.get("seed", 25)))
        sizes = [dim] + layers + [1]
        state: dict = {"n": 0, "cum_loss": 0.0}
        for li in range(len(sizes) - 1):
            fan_in, fan_out = sizes[li], sizes[li + 1]
            state[f"W{li + 1}"] = rng.normal(
                0.0, 1.0 / np.sqrt(fan_in + 1), size=(fan_out, fan_in + 1)
            )
        return state

    @staticmethod
    def _weights(state: dict) -> list[np.ndarray]:
        ws = []
        li = 1
        while f"W{li}" in state:
            ws.append(np.atleast_2d(state[f"W{li}"]))
            li += 1
        return ws

    @staticmethod
    def _forward(x: np.ndarray, ws: list[np.ndarray]):
        """Per-example forward pass; returns the biased activations of
        every layer input (acts[0] = biased x) and the output prob."""
        acts = [x]
        a = x
        for W in ws[:-1]:
            h = np.tanh(W @ a)
            a = np.append(h, 1.0)
            acts.append(a)
        z = float((ws[-1] @ a)[0])
        p = 1.0 / (1.0 + np.exp(-z))
        return acts, p

    def partial_fit(self, X, y, state, hyper):
        lr = float(hyper.get("lr", 0.05))
        ws = [W.copy() for W in self._weights(state)]
        cum = float(state["cum_loss"])
        Xb = np.hstack([X, np.ones((X.shape[0], 1))])
        y01 = (np.asarray(y) + 1.0) / 2.0  # {-1,1} -> {0,1}
        eps = 1e-12
        for i in range(Xb.shape[0]):
            x, t = Xb[i], y01[i]
            acts, p = self._forward(x, ws)
            cum += -(t * np.log(p + eps) + (1 - t) * np.log(1 - p + eps))
            # backprop: dL/dz_out = p - t, then through each tanh layer
            delta = np.array([p - t])          # output-layer dL/dz
            grads = [None] * len(ws)
            for li in range(len(ws) - 1, -1, -1):
                a_in = acts[li]
                grads[li] = np.outer(delta, a_in)
                if li > 0:
                    h = acts[li][:-1]          # pre-bias activations
                    da = ws[li][:, :-1].T @ delta
                    delta = da * (1.0 - h * h)
            for li, g in enumerate(grads):
                ws[li] -= lr * g
        out = {
            "n": int(state["n"]) + Xb.shape[0],
            "cum_loss": cum,
        }
        for li, W in enumerate(ws):
            key = f"W{li + 1}"
            # keep the legacy vector shape for a 1-row output layer whose
            # stored state was a vector (bit-compat with older states)
            if np.ndim(state[key]) == 1:
                out[key] = W.reshape(-1)
            else:
                out[key] = W
        return out

    def _scores(self, X, state):
        ws = self._weights(state)
        A = np.hstack([X, np.ones((X.shape[0], 1))])
        for W in ws[:-1]:
            H = np.tanh(A @ W.T)
            A = np.hstack([H, np.ones((H.shape[0], 1))])
        Z = (A @ ws[-1].T).reshape(-1)
        return 1.0 / (1.0 + np.exp(-Z))

    def predict(self, X, state):
        return np.where(self._scores(X, state) >= 0.5, 1.0, -1.0)

    def loss(self, X, y, state):
        p = np.clip(self._scores(X, state), 1e-12, 1 - 1e-12)
        t = (np.asarray(y) + 1.0) / 2.0
        return float(np.mean(-(t * np.log(p) + (1 - t) * np.log(1 - p))))
