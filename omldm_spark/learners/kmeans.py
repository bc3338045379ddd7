"""K-means — online/mini-batch clustering (SURVEY.md §2.9).

The reference forces K-means onto the SingleLearner protocol (one central
learner; src/main/scala/omldm/operators/spoke/FlinkSpoke.scala:207-209). In
Spark we keep the same semantic option (train on one partition) but default
to the mini-batch variant (Sculley, "Web-Scale K-Means Clustering", WWW 2010)
with per-centroid count-weighted merges, which parallelizes: each partition
updates a local copy from the broadcast centroids; the merge weights by
points-assigned. Deterministic seeding: first k distinct points by id.
"""

from __future__ import annotations

import numpy as np

from .base import Learner, register


@register
class KMeans(Learner):
    name = "K-means"
    is_classifier = True  # predict returns a centroid index

    def init_state(self, dim: int, hyper: dict) -> dict:
        k = int(hyper.get("k", 4))
        return {
            "centroids": np.zeros((k, dim)),
            "counts": np.zeros(k),
            "initialized": 0.0,
            "n": 0,
            "cum_loss": 0.0,
        }

    def partial_fit(self, X, y, state, hyper):
        cents = state["centroids"].copy()
        counts = state["counts"].copy()
        init = bool(state["initialized"])
        cum = float(state["cum_loss"])
        k = cents.shape[0]
        start = 0
        if not init:
            take = min(k, X.shape[0])
            cents[:take] = X[:take]
            counts[:take] = 1.0
            start = take
            init = take >= k
        for i in range(start, X.shape[0]):
            x = X[i]
            d2 = np.sum((cents - x) ** 2, axis=1)
            c = int(np.argmin(d2))
            cum += float(d2[c])
            counts[c] += 1.0
            eta = 1.0 / counts[c]
            cents[c] = (1.0 - eta) * cents[c] + eta * x
        return {
            "centroids": cents,
            "counts": counts,
            "initialized": 1.0 if init else 0.0,
            "n": int(state["n"]) + X.shape[0],
            "cum_loss": cum,
        }

    def merge(self, states):
        """Count-weighted centroid merge (not plain parameter averaging)."""
        k = states[0]["centroids"].shape[0]
        dim = states[0]["centroids"].shape[1]
        num = np.zeros((k, dim))
        den = np.zeros(k)
        for s in states:
            num += s["centroids"] * s["counts"][:, None]
            den += s["counts"]
        cents = np.where(den[:, None] > 0, num / np.maximum(den, 1.0)[:, None], 0.0)
        return {
            "centroids": cents,
            "counts": den,
            "initialized": max(float(s["initialized"]) for s in states),
            "n": sum(int(s["n"]) for s in states),
            "cum_loss": sum(float(s["cum_loss"]) for s in states),
        }

    def predict(self, X, state):
        cents = state["centroids"]
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(d2, axis=1).astype(float)

    def loss(self, X, y, state):
        cents = state["centroids"]
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return float(np.mean(np.min(d2, axis=1)))
