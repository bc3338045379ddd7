"""Statistical convergence of the distributed-protocol emulations
(SURVEY.md §2.9): on a seeded separable stream, every protocol's published
model must reach Synchronous-level holdout accuracy, while the
communication-saving protocols actually save communication — the property
the reference's GM/FGM papers claim (Sharfman SIGMOD'06; Samoladas
VLDB'19; EASGD NIPS'15; SSP NIPS'13)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from omldm_spark.plans.catalog import PipelineCatalog
from omldm_spark.streaming.training_loop import train_batch

RNG = np.random.default_rng(42)
W_TRUE = np.array([2.0, -1.0, 0.5])


def _stream(n):
    X = RNG.normal(size=(n, 3))
    y = np.sign(X @ W_TRUE)
    y[y == 0] = 1.0
    return pd.DataFrame(
        {
            "id": range(n),
            "features": [list(map(float, r)) for r in X],
            "label": y.astype(float),
        }
    )


def _holdout_accuracy(spec, pdf):
    w = np.asarray(spec.model["w"], dtype=float)
    X = np.asarray(pdf["features"].tolist())
    yhat = np.sign(np.hstack([X, np.ones((len(X), 1))]) @ w)
    return float((yhat == pdf["label"].to_numpy()).mean())


@pytest.fixture(scope="module")
def protocol_runs(spark):
    """Train one pipeline per protocol over the same 7-batch stream
    (odd count: the final round falls BETWEEN SSP syncs, so the divergence
    test sees un-merged worker states)."""
    train_pdf = _stream(2100)
    test_pdf = _stream(500)
    protos = ["Synchronous", "SSP", "EASGD", "GM", "FGM", "Asynchronous"]
    cat = PipelineCatalog()
    for pid, proto in enumerate(protos):
        cat.apply_request(
            {
                "id": pid,
                "request": "Create",
                "learner": {"name": "PA", "hyperParameters": {
                    "C": "0.1", "staleness": "2", "drift_threshold": "0.05",
                }},
                "trainingConfiguration": {"protocol": proto},
            }
        )
    for b in range(7):
        chunk = train_pdf.iloc[b * 300:(b + 1) * 300]
        train_batch(spark.createDataFrame(chunk), cat, dim=3,
                    num_partitions=4, batch_id=b)
    return cat, {p: cat.pipelines[i] for i, p in enumerate(protos)}, test_pdf


def test_all_protocols_reach_synchronous_accuracy(protocol_runs):
    _, specs, test_pdf = protocol_runs
    accs = {p: _holdout_accuracy(s, test_pdf) for p, s in specs.items()}
    assert accs["Synchronous"] > 0.93  # the baseline itself learned
    for proto, acc in accs.items():
        # within 5 points of the sync baseline (bounded-staleness guarantee)
        assert acc > accs["Synchronous"] - 0.05, (proto, accs)


def test_communication_hierarchy(protocol_runs):
    """SSP ships on every 2nd round; GM/FGM ship only on drift violations;
    sync ships every round — models_shipped must reflect exactly that."""
    _, specs, _ = protocol_runs
    sync = specs["Synchronous"].models_shipped
    assert sync == 7 * 4  # 7 rounds x 4 workers
    assert specs["SSP"].models_shipped == 3 * 4  # rounds 1,3,5 only
    assert specs["GM"].models_shipped <= sync
    assert specs["FGM"].models_shipped <= specs["GM"].models_shipped
    # drift threshold 0.05 must trigger at least once on a moving model
    assert specs["GM"].models_shipped > 0


def test_worker_states_diverge_between_ssp_syncs(protocol_runs):
    """Between syncs SSP workers run on their own models — per-worker states
    must exist and differ from the published global."""
    _, specs, _ = protocol_runs
    ssp = specs["SSP"]
    assert ssp.worker_models and len(ssp.worker_models) == 4
    g = np.asarray(ssp.model["w"], dtype=float)
    worker_ws = [np.asarray(v["w"], dtype=float)
                 for v in ssp.worker_models.values()]
    assert any(not np.allclose(w, g) for w in worker_ws)


def test_fitted_counts_identical_across_protocols(protocol_runs):
    """Every protocol fits every training row exactly once per round —
    the accounting invariant the job statistics depend on."""
    _, specs, _ = protocol_runs
    for proto, spec in specs.items():
        assert spec.fitted == 2100, (proto, spec.fitted)
