"""HT — Hoeffding Tree / VFDT (SURVEY.md §2.9, the hard one).

The reference forces HT onto the SingleLearner protocol — every point is
forwarded to one central learner (src/main/scala/omldm/operators/spoke/
FlinkSpoke.scala:204-206) — because an incremental tree has no cheap model
merge. We keep that: ``merge`` of multiple partial trees is refused; the
trainer runs it on one partition (the ``SingleLearner`` path of
streaming/training_loop.py).

Algorithm: Domingos & Hulten, "Mining High-Speed Data Streams" (KDD 2000),
with Gaussian numeric attribute observers (per-leaf, per-class running
n/sum/sumsq — the standard MOA treatment of numeric features): at every
``grace_period`` examples a leaf compares the two best candidate split
gains; if best - second > Hoeffding bound eps = sqrt(ln(1/delta) / 2n) (or
best alone clears a tie threshold) the leaf splits at the feature's running
mean. Binary labels {-1,+1}.

State is a plain nested dict serialized as JSON (``uses_blob`` trainer
contract) — variable-size model, unlike the flat vector learners.
"""

from __future__ import annotations

import json
import math

import numpy as np

from .base import Learner, register


def _entropy(c0: float, c1: float) -> float:
    n = c0 + c1
    if n <= 0:
        return 0.0
    h = 0.0
    for c in (c0, c1):
        if c > 0:
            p = c / n
            h -= p * math.log2(p)
    return h


def _new_leaf(dim: int, depth: int = 0) -> dict:
    return {
        "leaf": True,
        "depth": depth,
        "counts": [0.0, 0.0],
        # numeric observers — per feature: per class: [n, sum, sumsq]
        "fstats": [[[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]] for _ in range(dim)],
        # discrete observers — {feature: {value: [c0, c1]}} (MOA nominal
        # attribute observer; populated only for hyper["discrete"] dims)
        "dstats": {},
        "since_eval": 0,
    }


def _parse_discrete(hyper: dict) -> list[int]:
    """hyper["discrete"] = "0,2" -> [0, 2]: feature indices treated as
    nominal (multiway splits). Matches the reference's discreteFeatures
    channel of DataInstance (DataInstanceParser surface)."""
    raw = hyper.get("discrete", "")
    if isinstance(raw, (list, tuple)):
        return [int(v) for v in raw]
    return [int(v) for v in str(raw).split(",") if str(v).strip() != ""]


@register
class HT(Learner):
    name = "HT"
    is_classifier = True

    uses_blob = True

    def init_state(self, dim: int, hyper: dict) -> dict:
        return {
            "tree": {"0": _new_leaf(dim)},
            "dim": dim,
            "n": 0,
            "cum_loss": 0.0,
        }

    # -- blob serialization (variable-size model) ---------------------------

    def to_blob(self, state: dict) -> str:
        return json.dumps(
            {"tree": state["tree"], "dim": state["dim"], "n": int(state["n"]),
             "cum_loss": float(state["cum_loss"])}
        )

    def from_blob(self, blob: str) -> dict:
        d = json.loads(blob)
        d["n"] = int(d["n"])
        return d

    # -- core ---------------------------------------------------------------

    def _route(self, tree: dict, x: np.ndarray) -> str:
        nid = "0"
        while not tree[nid]["leaf"]:
            node = tree[nid]
            if node.get("multi"):
                # multiway split on a nominal feature; unseen value falls
                # through to the majority child (MOA convention)
                nid = node["children"].get(
                    str(int(x[node["feature"]])), node["default"]
                )
            else:
                nid = node["left"] if x[node["feature"]] <= node["threshold"] \
                    else node["right"]
        return nid

    def _gaussian_split_gain(self, leaf: dict, j: int) -> tuple[float, float]:
        """(info gain, threshold) for splitting feature j at its running mean."""
        s = leaf["fstats"][j]
        n0, sum0, ss0 = s[0]
        n1, sum1, ss1 = s[1]
        n = n0 + n1
        if n0 < 2 or n1 < 2:
            return 0.0, 0.0
        thr = (sum0 + sum1) / n
        est = []
        for cn, csum, css in ((n0, sum0, ss0), (n1, sum1, ss1)):
            mu = csum / cn
            var = max(css / cn - mu * mu, 1e-12)
            z = (thr - mu) / math.sqrt(2.0 * var)
            p_left = 0.5 * (1.0 + math.erf(z))
            est.append((cn * p_left, cn * (1.0 - p_left)))
        l0, r0 = est[0]
        l1, r1 = est[1]
        nl, nr = l0 + l1, r0 + r1
        if nl < 1e-9 or nr < 1e-9:
            return 0.0, thr
        parent = _entropy(n0, n1)
        child = (nl / n) * _entropy(l0, l1) + (nr / n) * _entropy(r0, r1)
        return parent - child, thr

    def _histogram_split_gain(self, leaf: dict, j: int, width: float):
        """(info gain, threshold) for the BEST binary split of numeric
        feature j from integer bin counts (the exhaustive-binary /
        histogram numeric observer of Gama et al.'s VFDT treatments —
        MOA's alternative to the Gaussian observer). Pure count
        arithmetic + log2: exactly SQL-reproducible, no erf.

        Bins are floor(x / width); the threshold for "left" is the bin
        value itself, so routing ``x <= thr`` is exact when feature
        values are quantized to multiples of ``width`` (always true for
        integer features with width=1 — document the resolution for
        continuous features).
        """
        stats = leaf.get("hstats", {}).get(str(j))
        if not stats or len(stats) < 2:
            return 0.0, 0.0
        n0, n1 = leaf["counts"]
        n = n0 + n1
        if n <= 0:
            return 0.0, 0.0
        parent = _entropy(n0, n1)
        bins = sorted(stats, key=float)
        l0 = l1 = 0.0
        best_gain, best_thr = -1.0, 0.0
        # every bin boundary except the last is a candidate threshold;
        # ascending iteration + strict > keeps the SMALLEST threshold on
        # gain ties (mirrors ORDER BY gain DESC, v ASC in the oracle SQL)
        for b in bins[:-1]:
            c0, c1 = stats[b]
            l0 += c0
            l1 += c1
            nl = l0 + l1
            nr = n - nl
            child = (nl / n) * _entropy(l0, l1) + (nr / n) * _entropy(
                n0 - l0, n1 - l1
            )
            gain = parent - child
            if gain > best_gain:
                best_gain, best_thr = gain, float(b) * width
        return max(best_gain, 0.0), best_thr

    def _discrete_split_gain(self, leaf: dict, j: int) -> float:
        """Info gain of the MULTIWAY split on nominal feature j — pure
        count arithmetic (exactly SQL-reproducible, no erf)."""
        stats = leaf["dstats"].get(str(j))
        if not stats or len(stats) < 2:
            return 0.0
        n0, n1 = leaf["counts"]
        n = n0 + n1
        if n <= 0:
            return 0.0
        child = 0.0
        # sorted value order: deterministic regardless of stream insertion
        # order, and mirrors the oracle SQL's per-value aggregation
        for v in sorted(stats, key=float):
            c0, c1 = stats[v]
            nv = c0 + c1
            child += (nv / n) * _entropy(c0, c1)
        return _entropy(n0, n1) - child

    def split_candidates(self, leaf: dict, hyper: dict, dim: int):
        """Ranked (gain, threshold|None, feature, kind) candidates plus the
        Hoeffding epsilon — exposed so the split DECISION is a queryable,
        oracle-checkable value (pre-pruning surface)."""
        discrete = set(_parse_discrete(hyper))
        histogram = str(hyper.get("numeric_observer", "gaussian")) == "histogram"
        width = float(hyper.get("hist_bin_width", 1.0))
        cands = []
        for j in range(dim):
            if j in discrete:
                cands.append((self._discrete_split_gain(leaf, j), None, j, "multi"))
            else:
                if histogram:
                    g, thr = self._histogram_split_gain(leaf, j, width)
                else:
                    g, thr = self._gaussian_split_gain(leaf, j)
                cands.append((g, thr, j, "binary"))
        cands.sort(key=lambda t: (t[0], -t[2]), reverse=True)
        n = leaf["counts"][0] + leaf["counts"][1]
        delta = float(hyper.get("delta", 1e-4))
        eps = math.sqrt(math.log(1.0 / delta) / (2.0 * n)) if n > 0 else float("inf")
        return cands, eps

    def _try_split(self, tree: dict, nid: str, hyper: dict, dim: int) -> None:
        leaf = tree[nid]
        tie = float(hyper.get("tie_threshold", 0.05))
        max_depth = int(hyper.get("max_depth", 6))
        if int(leaf.get("depth", 0)) >= max_depth:  # pre-pruning
            return
        cands, eps = self.split_candidates(leaf, hyper, dim)
        g1, thr1, j1, kind = cands[0]
        g2 = cands[1][0] if dim > 1 else 0.0
        if not (g1 > 0 and (g1 - g2 > eps or eps < tie)):
            return
        depth = int(leaf.get("depth", 0))
        if kind == "multi":
            stats = leaf["dstats"][str(j1)]
            children = {}
            best_v, best_mass = None, -1.0
            for v, (c0, c1) in stats.items():
                cid = f"{nid}v{v}"
                children[v] = cid
                tree[cid] = _new_leaf(dim, depth + 1)
                if c0 + c1 > best_mass:
                    best_mass, best_v = c0 + c1, v
            tree[nid] = {
                "leaf": False,
                "multi": True,
                "feature": j1,
                "children": children,
                "default": children[best_v],
            }
        else:
            left_id, right_id = nid + "l", nid + "r"
            tree[nid] = {
                "leaf": False,
                "feature": j1,
                "threshold": thr1,
                "left": left_id,
                "right": right_id,
            }
            tree[left_id] = _new_leaf(dim, depth + 1)
            tree[right_id] = _new_leaf(dim, depth + 1)

    def partial_fit(self, X, y, state, hyper):
        grace = int(hyper.get("grace_period", 200))
        discrete = set(_parse_discrete(hyper))
        histogram = str(hyper.get("numeric_observer", "gaussian")) == "histogram"
        width = float(hyper.get("hist_bin_width", 1.0))
        tree = state["tree"]
        dim = state["dim"]
        cum = float(state["cum_loss"])
        for i in range(X.shape[0]):
            x = X[i]
            cls = 1 if y[i] > 0 else 0
            nid = self._route(tree, x)
            leaf = tree[nid]
            # prequential error: test-then-train
            pred = 1 if leaf["counts"][1] >= leaf["counts"][0] else 0
            if pred != cls:
                cum += 1.0
            leaf["counts"][cls] += 1.0
            for j in range(dim):
                if j in discrete:
                    v = str(int(x[j]))
                    dstats = leaf["dstats"].setdefault(str(j), {})
                    cc = dstats.setdefault(v, [0.0, 0.0])
                    cc[cls] += 1.0
                elif histogram:
                    b = str(int(math.floor(float(x[j]) / width)))
                    hstats = leaf.setdefault("hstats", {}).setdefault(str(j), {})
                    cc = hstats.setdefault(b, [0.0, 0.0])
                    cc[cls] += 1.0
                else:
                    st = leaf["fstats"][j][cls]
                    v = float(x[j])
                    st[0] += 1.0
                    st[1] += v
                    st[2] += v * v
            leaf["since_eval"] += 1
            if leaf["since_eval"] >= grace:
                leaf["since_eval"] = 0
                self._try_split(tree, nid, hyper, dim)
        return {
            "tree": tree,
            "dim": dim,
            "n": int(state["n"]) + X.shape[0],
            "cum_loss": cum,
        }

    def merge(self, states):
        if len(states) == 1:
            return states[0]
        raise ValueError(
            "HT has no model merge; train with the SingleLearner protocol "
            "(one partition), as the reference forces (FlinkSpoke.scala:204-206)"
        )

    def predict(self, X, state):
        tree = state["tree"]
        out = np.empty(X.shape[0])
        for i in range(X.shape[0]):
            leaf = tree[self._route(tree, X[i])]
            out[i] = 1.0 if leaf["counts"][1] >= leaf["counts"][0] else -1.0
        return out

    def loss(self, X, y, state):
        return float(np.mean(self.predict(X, state) != np.asarray(y)))
