"""Arbitrary stateful streaming operators (keyed state store + pandas).

Implemented on ``applyInPandasWithState`` (GroupState API). Spark 4.x also
offers ``transformWithStateInPandas`` — the richer successor (value/list/map
state, timers) that SURVEY.md §4.2 targets — but its Python driver worker
imports ``google.protobuf``, which is not installed in this container; the
GroupState API provides the same keyed-state semantics for these operators
without that dependency. Swapping to transformWithStateInPandas on a
production image is a mechanical change (same processor logic).

Operators:

* ``streaming_dedup``         cross-batch exact dedup: the first record per
                              key passes; every later duplicate (same batch
                              or later) is dropped. State: one boolean per
                              key — O(distinct keys), checkpointed.
* ``streaming_running_stats`` per-key running count/sum/min/max — the
                              streaming StandardScaler fit (running moments,
                              SURVEY.md §7 step 5).

Both shuffle once on the key; state lives with the partition and
rescale/restore come from Structured Streaming checkpointing — the
properties the reference hand-built with CheckpointedFunction
(FlinkSpoke.scala:233-334).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    if state.exists:
        return
    first = None
    for pdf in pdfs:
        if len(pdf):
            first = pdf.head(1)
            break
    state.update((True,))
    if first is not None:
        yield first


def streaming_dedup(
    stream: DataFrame, key_col: str, output_schema, ttl_ms: int | None = None
) -> DataFrame:
    """Cross-batch exact dedup on ``key_col`` (e.g. md5(text)).

    With ``ttl_ms`` (requires an event-time watermark upstream) each key's
    seen-marker expires ``ttl_ms`` past the watermark and is REMOVED from the
    state store — bounding state to keys seen within the TTL horizon instead
    of all keys ever. That is the 100 TB shape: unbounded-retention dedup
    state grows with total distinct keys; watermark-TTL'd state grows with
    the dedup window only. A duplicate arriving after expiry passes again
    (standard watermark-bounded dedup semantics — same contract as Spark's
    own dropDuplicatesWithinWatermark)."""
    if ttl_ms is None:
        return stream.groupBy(key_col).applyInPandasWithState(
            _dedup_fn,
            outputStructType=output_schema,
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def dedup_ttl(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        first = None
        if not state.exists:
            for pdf in pdfs:
                if len(pdf):
                    first = pdf.head(1)
                    break
        state.update((True,))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttl_ms)
        if first is not None:
            yield first

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup_ttl,
        outputStructType=output_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _stats_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    if state.exists:
        cnt, total, mn, mx = state.get
    else:
        cnt, total, mn, mx = 0, 0.0, float("inf"), float("-inf")
    for pdf in pdfs:
        if not len(pdf):
            continue
        v = pdf["v"]
        cnt += int(len(v))
        total += float(v.sum())
        mn = min(mn, float(v.min()))
        mx = max(mx, float(v.max()))
    state.update((cnt, total, mn, mx))
    yield pd.DataFrame(
        {"key": [key[0]], "cnt": [cnt], "total": [total], "mn": [mn], "mx": [mx]}
    )


def streaming_running_stats(stream: DataFrame, key_col: str) -> DataFrame:
    return stream.groupBy(key_col).applyInPandasWithState(
        _stats_fn,
        outputStructType="key bigint, cnt bigint, total double, mn double, mx double",
        stateStructType="cnt bigint, total double, mn double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
