"""HT (Hoeffding tree) + NN (MLP) learners."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from omldm_spark.learners import get_learner, trainer

RNG = np.random.default_rng(25)


def _axis_data(n=4000):
    """x0 > 1 => +1, else -1 — one clean axis-aligned split."""
    X = RNG.uniform(0, 2, size=(n, 3))
    y = np.where(X[:, 0] > 1.0, 1.0, -1.0)
    return X, y


def test_ht_learns_axis_split():
    X, y = _axis_data()
    ln = get_learner("HT")
    hyper = {"grace_period": 200, "delta": 1e-4}
    st = ln.partial_fit(X, y, ln.init_state(3, hyper), hyper)
    tree = st["tree"]
    assert not tree["0"]["leaf"], "root should have split"
    assert tree["0"]["feature"] == 0
    assert 0.8 < tree["0"]["threshold"] < 1.2
    acc = np.mean(ln.predict(X, st) == y)
    assert acc > 0.95


def test_ht_blob_roundtrip():
    X, y = _axis_data(1000)
    ln = get_learner("HT")
    st = ln.partial_fit(X, y, ln.init_state(3, {}), {})
    st2 = ln.from_blob(ln.to_blob(st))
    assert np.array_equal(ln.predict(X, st2), ln.predict(X, st))


def test_ht_refuses_merge():
    ln = get_learner("HT")
    s = ln.init_state(3, {})
    with pytest.raises(ValueError, match="SingleLearner"):
        ln.merge([s, s])


def test_ht_via_trainer_single_partition(spark):
    X, y = _axis_data(3000)
    pdf = pd.DataFrame(
        {"id": range(3000), "features": [list(map(float, r)) for r in X],
         "label": y.astype(float)}
    )
    df = spark.createDataFrame(pdf)
    st = trainer.fit(df, "HT", dim=3, hyper={"grace_period": 200},
                     num_partitions=1, order_cols=["id"])
    assert st["n"] == 3000
    ev = trainer.evaluate(df, "HT", st)
    assert ev["score"] > 0.9


def test_nn_learns_xor():
    """XOR — not linearly separable; a hidden layer is required."""
    n = 6000
    X = RNG.uniform(-1, 1, size=(n, 2))
    y = np.where((X[:, 0] > 0) ^ (X[:, 1] > 0), 1.0, -1.0)
    ln = get_learner("NN")
    hyper = {"hidden": 8, "lr": 0.1, "seed": 25}
    st = ln.init_state(2, hyper)
    for _ in range(8):
        st = ln.partial_fit(X, y, st, hyper)
    assert ln.score(X, y, st) > 0.9


def test_nn_deterministic_init_and_fit():
    X, y = _axis_data(500)
    ln = get_learner("NN")
    hyper = {"seed": 25}
    s1 = ln.partial_fit(X, y, ln.init_state(3, hyper), hyper)
    s2 = ln.partial_fit(X, y, ln.init_state(3, hyper), hyper)
    assert np.allclose(s1["W1"], s2["W1"]) and np.allclose(s1["W2"], s2["W2"])


def test_nn_merge_average():
    ln = get_learner("NN")
    hyper = {"hidden": 4, "seed": 25}
    a = ln.init_state(3, hyper)
    b = ln.init_state(3, hyper)
    a["n"], b["n"] = 1, 1
    m = ln.merge([a, b])
    assert np.allclose(m["W1"], a["W1"])  # identical states average to self


def test_ht_multiway_split_on_discrete_feature():
    """Nominal observer: a 4-valued discrete feature that determines the
    label splits multiway; routing sends each value to its own child and
    unseen values fall through to the majority child."""
    from omldm_spark.learners import get_learner

    rng = np.random.default_rng(3)
    n = 400
    v = rng.integers(0, 4, size=n)
    X = np.stack([v.astype(float), rng.normal(size=n)], axis=1)
    y = np.where(v >= 2, 1.0, -1.0)
    ln = get_learner("HT")
    hyper = {"discrete": "0", "grace_period": 200}
    st = ln.partial_fit(X, y, ln.init_state(2, hyper), hyper)
    root = st["tree"]["0"]
    assert not root["leaf"] and root.get("multi") and root["feature"] == 0
    assert set(root["children"]) == {"0", "1", "2", "3"}
    # children are at depth 1 (explicit depth field, multiway-safe)
    assert all(st["tree"][c]["depth"] == 1 for c in root["children"].values())
    pred = ln.predict(X, st)
    assert float(np.mean(pred == y)) > 0.95
    # unseen value routes to the majority child without KeyError
    ln.predict(np.array([[9.0, 0.0]]), st)


def test_ht_histogram_observer_finds_true_threshold():
    """Histogram numeric observer: integer feature with a step label at
    v <= 4; the exhaustive-binary gain must pick exactly that boundary
    (no erf, pure count arithmetic) and the tree must split and classify."""
    from omldm_spark.learners import get_learner

    rng = np.random.default_rng(7)
    n = 600
    v = rng.integers(0, 10, size=n)
    X = np.stack([v.astype(float), rng.normal(size=n)], axis=1)
    y = np.where(v <= 4, -1.0, 1.0)
    ln = get_learner("HT")
    hyper = {"numeric_observer": "histogram", "hist_bin_width": 1.0,
             "grace_period": 300}
    st = ln.partial_fit(X, y, ln.init_state(2, hyper), hyper)
    root = st["tree"]["0"]
    assert not root["leaf"] and root["feature"] == 0
    assert root["threshold"] == 4.0
    pred = ln.predict(X, st)
    assert float(np.mean(pred == y)) > 0.95


def test_ht_histogram_gain_tie_breaks_to_smallest_threshold():
    """Two equally-good boundaries (symmetric counts) -> the ascending
    scan with strict > keeps the smaller threshold, mirroring the oracle's
    ORDER BY gain DESC, v ASC."""
    from omldm_spark.learners import get_learner
    from omldm_spark.learners.ht import _new_leaf

    ln = get_learner("HT")
    leaf = _new_leaf(1)
    # bins 0,1,2,3 with counts making splits at 1 and 2 give EQUAL gain:
    # class0 mass in bins {0,1}, class1 in {2,3}, but bin 1 and 2 empty of
    # the other class -> thresholds 1 and 2 separate perfectly, same gain
    leaf["counts"] = [4.0, 4.0]
    leaf["hstats"] = {"0": {
        "0": [2.0, 0.0], "1": [2.0, 0.0], "2": [0.0, 2.0], "3": [0.0, 2.0],
    }}
    gain, thr = ln._histogram_split_gain(leaf, 0, 1.0)
    assert gain == 1.0  # perfect split: full parent entropy recovered
    assert thr == 1.0   # not 2.0: smallest of the tied thresholds
