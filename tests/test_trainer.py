"""BSP trainer: determinism, single-partition == sequential, merge math."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from omldm_spark.learners import get_learner, trainer

RNG = np.random.default_rng(25)


@pytest.fixture(scope="module")
def points(spark):
    n = 500
    X = RNG.normal(size=(n, 3))
    y = np.sign(X @ np.array([1.0, -2.0, 0.5]) + 0.05 * RNG.normal(size=n))
    y[y == 0] = 1.0
    pdf = pd.DataFrame(
        {
            "id": range(n),
            "worker": [i % 4 for i in range(n)],
            "features": [list(map(float, r)) for r in X],
            "label": y.astype(float),
        }
    )
    return spark.createDataFrame(pdf)


def test_fit_deterministic(spark, points):
    kw = dict(
        dim=3, hyper={"C": 0.1}, num_partitions=4, partition_col="worker",
        order_cols=["id"],
    )
    s1 = trainer.fit(points, "PA", **kw)
    s2 = trainer.fit(points, "PA", **kw)
    assert np.allclose(s1["w"], s2["w"])
    assert s1["n"] == s2["n"] == 500


def test_single_partition_matches_sequential(spark, points):
    state = trainer.fit(
        points, "PA", dim=3, hyper={"C": 0.1}, num_partitions=1,
        partition_col="worker", order_cols=["id"],
    )
    pdf = points.orderBy("id").toPandas()
    X = np.asarray(pdf["features"].tolist())
    y = pdf["label"].to_numpy()
    ln = get_learner("PA")
    ref = ln.partial_fit(X, y, ln.init_state(3, {"C": 0.1}), {"C": 0.1})
    # repartition(1, worker) holds every row; in-partition order is the sort
    assert np.allclose(state["w"], ref["w"])


def test_fit_learns_and_evaluates(spark, points):
    state = trainer.fit(
        points, "PA", dim=3, hyper={"C": 1.0}, epochs=3, num_partitions=4,
        partition_col="worker", order_cols=["id"],
    )
    ev = trainer.evaluate(points, "PA", state)
    assert ev["n_test"] == 500
    assert ev["score"] > 0.8  # separable-ish data, merged model still learns


def test_epochs_accumulate_counts(spark, points):
    s1 = trainer.fit(points, "SVM", dim=3, hyper={}, epochs=2, num_partitions=2,
                     partition_col="worker", order_cols=["id"])
    assert s1["n"] == 1000  # 2 epochs x 500 points


def test_evaluate_linear_matches_numpy_evaluate(spark, points):
    state = trainer.fit(
        points, "PA", dim=3, hyper={"C": 1.0}, num_partitions=4,
        partition_col="worker", order_cols=["id"],
    )
    ev_np = trainer.evaluate(points, "PA", state)
    ev_sql = trainer.evaluate_linear(points, "PA", state)
    assert ev_sql["n_test"] == ev_np["n_test"]
    assert abs(ev_sql["score"] - ev_np["score"]) < 1e-12
    assert abs(ev_sql["loss"] - ev_np["loss"]) < 1e-9
    # regressor path too
    st_r = trainer.fit(points, "RegressorPA", dim=3, hyper={}, num_partitions=4,
                       partition_col="worker", order_cols=["id"])
    ev_np = trainer.evaluate(points, "RegressorPA", st_r)
    ev_sql = trainer.evaluate_linear(points, "RegressorPA", st_r)
    assert abs(ev_sql["loss"] - ev_np["loss"]) < 1e-9
