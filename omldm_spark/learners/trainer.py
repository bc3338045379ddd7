"""BSP trainer: the FlinkSpoke + FlinkHub pair collapsed into map/merge.

Reference hot path (SURVEY.md §3.1): workers partial-fit, push params to a
hub via an RPC fabric + Kafka feedback topic; the hub merges and broadcasts
back. Here one *round* is:

    partitions --mapInPandas partial_fit--> tiny state rows --driver merge-->
    broadcast model --next round

The per-partition state is O(model), not O(data) — collecting P of them to
the driver is the same communication pattern as MLlib's treeAggregate and is
exactly what the reference's hub does (it, too, centralizes the merged
model: src/main/scala/omldm/operators/hub/FlinkHub.scala:54-162). At 1000
executors this moves ~1000 × (dim+1) doubles per round — trivial.

Epochs over a *bounded* stream replay = the reference's multi-epoch file
replay (workload ``lin_class_mil_e10.txt`` = 10 epochs,
DefaultJobParameters.scala:7).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .base import Learner, get_learner

# Serialized state row: flat float arrays + counts; one row per partition.
STATE_SCHEMA = "part_id long, n long, cum_loss double, flat array<double>, blob string"


def _flatten_state(learner: Learner, state: dict) -> list[float]:
    """Pack model arrays into one flat vector (order: sorted keys, excluding
    bookkeeping); the driver unpacks with the same layout."""
    out: list[float] = []
    for k in sorted(state):
        if k in ("n", "cum_loss"):
            continue
        v = state[k]
        if isinstance(v, np.ndarray):
            out.extend(np.asarray(v, dtype=float).ravel().tolist())
        else:
            out.append(float(v))
    return out


def _unflatten_state(learner: Learner, template: dict, flat: list[float]) -> dict:
    state = {}
    i = 0
    for k in sorted(template):
        if k in ("n", "cum_loss"):
            continue
        v = template[k]
        if isinstance(v, np.ndarray):
            size = v.size
            state[k] = np.asarray(flat[i : i + size], dtype=float).reshape(v.shape)
            i += size
        else:
            state[k] = float(flat[i])
            i += 1
    return state


def fit(
    points: DataFrame,
    learner_name: str,
    dim: int,
    hyper: dict | None = None,
    *,
    features_col: str = "features",
    label_col: str = "label",
    epochs: int = 1,
    num_partitions: int | None = None,
    partition_col: str | None = None,
    order_cols: list[str] | None = None,
    init_state: dict | None = None,
) -> dict:
    """Train over a bounded DataFrame; returns the merged model state.

    ``points`` must carry ``features_col`` (ARRAY<DOUBLE>) and ``label_col``
    (DOUBLE). With ``partition_col`` + ``order_cols`` the run is fully
    deterministic: rows shuffle by a stable key and are sorted within each
    partition before the sequential pass — the Spark analogue of the
    reference's fixed-seed replay (FlinkSpoke.scala:52).
    """
    hyper = dict(hyper or {})
    learner = get_learner(learner_name)
    if getattr(learner, "closed_form", False):
        # ORR: exact sufficient-statistics aggregation — one Catalyst agg
        # per epoch pass, inherently distributed and order-independent, so
        # partitioning/ordering parameters are irrelevant (epochs > 1 would
        # double-count sufficient statistics; one pass IS the exact fit).
        return learner.fit_dataframe(
            points, dim, hyper,
            features_col=features_col, label_col=label_col,
            init_state=init_state,
        )
    template = learner.init_state(dim, hyper)

    if partition_col is not None and num_partitions is not None:
        points = points.repartition(num_partitions, partition_col)
    elif num_partitions is not None:
        points = points.repartition(num_partitions)
    if order_cols:
        points = points.sortWithinPartitions(*order_cols)
        sel = points.select(features_col, label_col)
    else:
        sel = points.select(features_col, label_col)

    uses_blob = bool(getattr(learner, "uses_blob", False))
    state = init_state or learner.init_state(dim, hyper)
    for _ in range(epochs):
        bc_blob = learner.to_blob(state) if uses_blob else None
        bc_flat = None if uses_blob else _flatten_state(learner, state)
        bc_n, bc_cum = int(state["n"]), float(state["cum_loss"])

        def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            if uses_blob:
                local = learner.from_blob(bc_blob)
            else:
                local = _unflatten_state(learner, template, bc_flat)
            local["n"], local["cum_loss"] = 0, 0.0
            local = learner.begin_pass(local)
            seen = 0
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.asarray(pdf[features_col].tolist(), dtype=float)
                yv = pdf[label_col].to_numpy(dtype=float)
                local = learner.partial_fit(X, yv, local, hyper)
                seen += len(pdf)
            if seen:
                yield pd.DataFrame(
                    {
                        "part_id": [0],
                        "n": [int(local["n"])],
                        "cum_loss": [float(local["cum_loss"])],
                        "flat": [
                            [] if uses_blob else _flatten_state(learner, local)
                        ],
                        "blob": [learner.to_blob(local) if uses_blob else None],
                    }
                )

        rows = sel.mapInPandas(run_partition, schema=STATE_SCHEMA).collect()
        if not rows:
            break
        partials = []
        for r in rows:
            if uses_blob:
                s = learner.from_blob(r["blob"])
            else:
                s = _unflatten_state(learner, template, list(r["flat"]))
            s["n"], s["cum_loss"] = int(r["n"]), float(r["cum_loss"])
            partials.append(s)
        merged = learner.merge(partials)
        merged["n"] = bc_n + sum(int(p["n"]) for p in partials)
        merged["cum_loss"] = bc_cum + sum(float(p["cum_loss"]) for p in partials)
        state = merged
    return state


def evaluate(
    points: DataFrame,
    learner_name: str,
    state: dict,
    *,
    features_col: str = "features",
    label_col: str = "label",
    max_rows: int = 100_000,
) -> dict:
    """Holdout loss/score on a (small) test split — the reference's
    Query-on-testSet path (FlinkSpoke.scala:160-163).

    The ``toPandas`` here is deliberate and BOUNDED: the reference's
    holdout is a 256-point rolling test set (FlinkSpoke.scala:41), so
    the collect is model-query-sized, not data-sized.  ``max_rows``
    guards the contract — a caller that feeds a full table gets a loud
    error instead of a silent driver OOM; score big frames with the
    distributed prediction path instead."""
    learner = get_learner(learner_name)
    # limit+count probes the bound without materializing the full frame
    if points.limit(max_rows + 1).count() > max_rows:
        raise ValueError(
            f"evaluate() collects the holdout to the driver; more than "
            f"{max_rows} rows supplied. Score large frames distributed "
            "instead."
        )
    pdf = points.select(features_col, label_col).toPandas()
    if len(pdf) == 0:
        return {"loss": math.nan, "score": math.nan, "n_test": 0}
    X = np.asarray(pdf[features_col].tolist(), dtype=float)
    yv = pdf[label_col].to_numpy(dtype=float)
    return {
        "loss": learner.loss(X, yv, state),
        "score": learner.score(X, yv, state),
        "n_test": len(pdf),
    }


GROUP_STATE_SCHEMA = (
    "grp long, n long, cum_loss double, flat array<double>, blob string"
)


def fit_groups(
    points: DataFrame,
    learner_name: str,
    dim: int,
    hyper: dict | None = None,
    *,
    key_col: str,
    features_col: str = "features",
    label_col: str = "label",
    order_cols: list[str] | None = None,
    init_states: dict[int, dict] | None = None,
) -> dict[int, dict]:
    """Per-group sequential training: each key keeps ITS OWN model.

    This is the per-worker state the distributed-protocol emulations need
    (GM/FGM/EASGD keep worker models that diverge between syncs —
    SURVEY.md §2.9). applyInPandas gives one pandas frame per group; rows
    are sorted in-frame by ``order_cols``, so the pass is deterministic
    regardless of shuffle arrival order.
    """
    hyper = dict(hyper or {})
    learner = get_learner(learner_name)
    template = learner.init_state(dim, hyper)
    uses_blob = bool(getattr(learner, "uses_blob", False))
    init_states = init_states or {}
    bc: dict[int, tuple] = {}
    for k, st in init_states.items():
        if uses_blob:
            bc[int(k)] = (None, learner.to_blob(st))
        else:
            bc[int(k)] = (_flatten_state(learner, st), None)
    order_cols = order_cols or []

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        key = int(pdf[key_col].iloc[0])
        if order_cols:
            pdf = pdf.sort_values(order_cols)
        packed = bc.get(key)
        if packed is None:
            local = learner.init_state(dim, hyper)
        elif uses_blob:
            local = learner.from_blob(packed[1])
        else:
            local = _unflatten_state(learner, template, packed[0])
        local["n"], local["cum_loss"] = 0, 0.0
        local = learner.begin_pass(local)
        X = np.asarray(pdf[features_col].tolist(), dtype=float)
        yv = pdf[label_col].to_numpy(dtype=float)
        local = learner.partial_fit(X, yv, local, hyper)
        return pd.DataFrame(
            {
                "grp": [key],
                "n": [int(local["n"])],
                "cum_loss": [float(local["cum_loss"])],
                "flat": [[] if uses_blob else _flatten_state(learner, local)],
                "blob": [learner.to_blob(local) if uses_blob else None],
            }
        )

    rows = (
        points.select(key_col, features_col, label_col, *order_cols)
        .groupBy(key_col)
        .applyInPandas(run_group, schema=GROUP_STATE_SCHEMA)
        .collect()
    )
    out: dict[int, dict] = {}
    for r in rows:
        if uses_blob:
            s = learner.from_blob(r["blob"])
        else:
            s = _unflatten_state(learner, template, list(r["flat"]))
        prev_n = int(init_states.get(r["grp"], {}).get("n", 0))
        prev_cum = float(init_states.get(r["grp"], {}).get("cum_loss", 0.0))
        s["n"] = prev_n + int(r["n"])
        s["cum_loss"] = prev_cum + float(r["cum_loss"])
        out[int(r["grp"])] = s
    return out


def evaluate_linear(
    points: DataFrame,
    learner_name: str,
    state: dict,
    *,
    features_col: str = "features",
    label_col: str = "label",
) -> dict:
    """Catalyst-only holdout evaluation for flat linear models (state['w']):
    the loss/score aggregations run JVM-side — no toPandas transfer, no
    Python in the scoring path. Falls back to :func:`evaluate` for
    non-linear state shapes."""
    from pyspark.sql import functions as F

    from ..functions.vector import linear_predict

    if "w" not in state:
        return evaluate(points, learner_name, state,
                        features_col=features_col, label_col=label_col)
    learner = get_learner(learner_name)
    w = np.asarray(state["w"], dtype=float)
    raw = linear_predict(features_col, list(w[:-1]), float(w[-1]))
    y = F.col(label_col)
    if learner.is_classifier:
        pred = F.when(raw >= 0, 1.0).otherwise(-1.0)
        hinge = F.greatest(F.lit(0.0), F.lit(1.0) - y * raw)
        row = points.agg(
            F.avg(hinge).alias("loss"),
            F.avg((pred == y).cast("double")).alias("score"),
            F.count(F.lit(1)).alias("n"),
        ).first()
    else:
        err = raw - y
        row = points.agg(
            F.avg(err * err).alias("loss"),
            (-F.avg(err * err)).alias("score"),
            F.count(F.lit(1)).alias("n"),
        ).first()
    if row["n"] == 0:
        return {"loss": math.nan, "score": math.nan, "n_test": 0}
    return {"loss": float(row["loss"]), "score": float(row["score"]),
            "n_test": int(row["n"])}
