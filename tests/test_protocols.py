"""Training-protocol emulation: SSP staleness, GM drift gating, EASGD."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from omldm_spark.plans.catalog import PipelineCatalog
from omldm_spark.streaming.training_loop import train_batch

RNG = np.random.default_rng(25)


def _batch(spark, n=400, offset=0):
    X = RNG.normal(size=(n, 3))
    y = np.sign(X @ np.array([2.0, -1.0, 0.5]))
    y[y == 0] = 1.0
    pdf = pd.DataFrame(
        {
            "id": range(offset, offset + n),
            "features": [list(map(float, r)) for r in X],
            "label": y.astype(float),
        }
    )
    return spark.createDataFrame(pdf)


def _catalog(protocol, hyper=None):
    cat = PipelineCatalog()
    req = {
        "id": 1, "request": "Create",
        "learner": {"name": "PA", "hyperParameters": hyper or {"C": "0.1"}},
        "trainingConfiguration": {"protocol": protocol},
    }
    assert cat.apply_request(req) == "Create"
    return cat


@pytest.mark.parametrize("protocol", ["SSP", "GM", "FGM", "EASGD"])
def test_per_worker_protocols_train(spark, protocol):
    cat = _catalog(protocol)
    df = _batch(spark)
    st = train_batch(df, cat, dim=3, num_partitions=4, batch_id=0)
    spec = cat.pipelines[1]
    assert spec.fitted == 400
    assert spec.worker_models is not None and len(spec.worker_models) == 4
    assert len(st) == 1 and st[0].protocol == protocol


def test_ssp_merges_every_staleness_rounds(spark):
    cat = _catalog("SSP", {"C": "0.1", "staleness": "2"})
    df = _batch(spark)
    s0 = train_batch(df, cat, dim=3, num_partitions=4, batch_id=0)
    s1 = train_batch(df, cat, dim=3, num_partitions=4, batch_id=1)
    # round 0: no sync (ship 0); round 1: sync (ship 4)
    assert s0[0].models_shipped == 0
    assert s1[0].models_shipped == 4


def test_gm_ships_on_drift_then_stays_silent(spark):
    # huge threshold -> never violate -> never ship
    cat = _catalog("GM", {"C": "0.1", "drift_threshold": "1e9"})
    df = _batch(spark)
    s0 = train_batch(df, cat, dim=3, num_partitions=4, batch_id=0)
    assert s0[0].models_shipped == 0
    # tiny threshold -> violate immediately -> full sync
    cat2 = _catalog("GM", {"C": "0.1", "drift_threshold": "1e-9"})
    s1 = train_batch(df, cat2, dim=3, num_partitions=4, batch_id=0)
    assert s1[0].models_shipped == 4
    # after a sync all workers share the global model
    wm = cat2.pipelines[1].worker_models
    ws = [np.asarray(v["w"]) for v in wm.values()]
    assert all(np.allclose(ws[0], w) for w in ws[1:])


def test_easgd_center_moves_toward_workers(spark):
    cat = _catalog("EASGD", {"C": "0.1", "alpha": "0.5"})
    df = _batch(spark)
    train_batch(df, cat, dim=3, num_partitions=4, batch_id=0)
    spec = cat.pipelines[1]
    center = np.asarray(spec.model["w"])
    assert np.linalg.norm(center) > 0  # moved off the zero init
    # workers pulled toward (but not equal to) the center
    ws = [np.asarray(v["w"]) for v in spec.worker_models.values()]
    assert not all(np.allclose(center, w) for w in ws)


def test_protocol_statistics_accumulate(spark):
    cat = _catalog("EASGD")
    df = _batch(spark)
    train_batch(df, cat, dim=3, num_partitions=4, batch_id=0)
    train_batch(df, cat, dim=3, num_partitions=4, batch_id=1)
    spec = cat.pipelines[1]
    assert spec.models_shipped == 8  # 4 workers x 2 rounds
    assert spec.bytes_shipped > 0
    assert spec.rounds == 2
    assert len(spec.learning_curve) == 2


def test_async_ssp_drift_characterization(spark):
    """VERDICT r4 item 7: turn the SURVEY §7 caveat into checked
    behavior.  The same batch sequence runs under Synchronous, the
    BSP-Async emulation, and SSP(staleness=3):

    * Async ≡ Synchronous under BSP — bit-identical final model and
      identical communication (the documented semantic mapping: async's
      wall-clock overlap has no BSP equivalent, nothing else differs);
    * communication hierarchy: SSP ships a 1/staleness fraction of the
      synchronous model volume;
    * divergence envelope: the SSP final model differs from synchronous
      (staleness is real) but stays within a bounded relative distance,
      and its holdout accuracy stays within 5 points — bounded-staleness
      consistency (Ho et al., NIPS 2013) surviving the emulation.
    """
    batches = [_batch(spark, n=400, offset=400 * i) for i in range(6)]
    finals, shipped, scores = {}, {}, {}
    Xh = RNG.normal(size=(600, 3))
    yh = np.sign(Xh @ np.array([2.0, -1.0, 0.5]))
    yh[yh == 0] = 1.0

    from omldm_spark.learners.base import get_learner

    ln = get_learner("PA")
    for proto, hyper in [
        ("Synchronous", {"C": "0.1"}),
        ("Asynchronous", {"C": "0.1"}),
        ("SSP", {"C": "0.1", "staleness": "3"}),
    ]:
        cat = _catalog(proto, hyper)
        total = 0
        for i, df in enumerate(batches):
            st = train_batch(df, cat, dim=3, num_partitions=4, batch_id=i)
            total += st[0].models_shipped
        spec = cat.pipelines[1]
        finals[proto] = np.asarray(spec.model["w"], dtype=float)
        shipped[proto] = total
        state = {"w": finals[proto],
                 "b": float(spec.model.get("b", 0.0)),
                 "n": spec.fitted, "cum_loss": 0.0}
        scores[proto] = float(np.mean(ln.predict(Xh, state) == yh))

    # Async ≡ Sync under BSP: bit-identical model, same communication
    assert np.array_equal(finals["Asynchronous"], finals["Synchronous"])
    assert shipped["Asynchronous"] == shipped["Synchronous"] == 6 * 4

    # SSP ships 1/staleness of the synchronous volume (rounds 2 and 5)
    assert shipped["SSP"] == 2 * 4
    assert 0 < shipped["SSP"] < shipped["Synchronous"]

    # bounded divergence: real but enveloped; accuracy parity within 5pt
    d = np.linalg.norm(finals["SSP"] - finals["Synchronous"])
    base = np.linalg.norm(finals["Synchronous"])
    assert d > 0.0
    assert d <= 0.5 * base
    assert scores["SSP"] >= scores["Synchronous"] - 0.05
    assert scores["Synchronous"] > 0.9
