"""Event-time windows + watermarks + idle-timeout termination
(SURVEY.md §2.5 W1-W3, §2.1 S5).

The reference runs on ingestion time with no watermarks (Job.scala:119) and
terminates itself via a per-record re-registered event-time timer with a 30 s
idle timeout (StatisticsOperator.scala:86-91,135-142) plus a poison-pill
performance topic (JobTerminator.scala:6-10). Spark-native equivalents:

* windowed aggregation with ``withWatermark`` — late data beyond the
  watermark is dropped by the engine (an upgrade the reference lacks);
* idle-timeout: a StreamingQueryListener watching batch progress — when no
  batch makes progress for ``timeout``, stop the query (the
  ``JobTerminator`` + timer pair collapsed into one listener).
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "5 minutes",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts with late-data handling.

    Output: window_start, window_end, key, cnt. The shuffle is on
    (window, key); state is bounded by the watermark horizon.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            "cnt",
        )
    )


class IdleTimeoutStopper:
    """Stop a streaming query after ``timeout_sec`` without new input rows —
    the reference's 30 s idle-timeout self-termination
    (DefaultJobParameters.scala:10, StatisticsOperator.scala:135-142)."""

    def __init__(self, query, timeout_sec: float = 30.0, poll_sec: float = 1.0):
        self.query = query
        self.timeout_sec = timeout_sec
        self.poll_sec = poll_sec
        self._last_data = time.time()
        self._thread = threading.Thread(target=self._watch, daemon=True)

    def start(self) -> "IdleTimeoutStopper":
        self._thread.start()
        return self

    def _watch(self) -> None:
        seen: int | None = None
        while self.query.isActive:
            prog = self.query.lastProgress
            if prog and prog["numInputRows"] > 0 and prog["batchId"] != seen:
                seen = prog["batchId"]
                self._last_data = time.time()
            if time.time() - self._last_data > self.timeout_sec:
                self.query.stop()
                return
            time.sleep(self.poll_sec)


def stream_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window_s: int = 600,
    watermark: str = "20 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join (W2 surface the reference
    lacks — its only two-stream operator is the data x control connect,
    FlinkLearning.scala:61-77, which keys on pipeline id with no time
    semantics): attribute each purchase to every click by the same user in
    the preceding ``window_s`` seconds.

    Scale: BOTH sides carry a watermark and the join predicate bounds
    purchase_ts inside [click_ts, click_ts + window_s), so the engine
    evicts join state older than watermark + window — state is
    O(in-flight window), not O(stream).  The equality key (user_id) is the
    shuffle key; the range predicate prunes inside each key group.

    Exactness: microsecond timestamps compare exactly; output quantizes to
    integer epoch seconds / cents only AFTER the join, so an availableNow
    single-batch replay reproduces the batch SQL join bit-for-bit
    (queries.py stream_click_attribution oracle).

    ``how="left_outer"`` emits a null-padded row for a click whose window
    closes with no purchase — Spark releases the outer row only when the
    watermark passes the click's join window, one batch after the state
    could first be evicted (tests/test_streaming.py pins the cadence)."""
    c = (
        clicks.select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    p = (
        purchases.select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            "value",
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = F.expr(
        f"user_id = p_user_id AND purchase_ts >= click_ts"
        f" AND purchase_ts < click_ts + interval {window_s} seconds"
    )
    joined = c.join(p, cond, how)
    return joined.select(
        "click_id", "purchase_id", "user_id",
        F.unix_timestamp("click_ts").alias("click_ts_s"),
        F.unix_timestamp("purchase_ts").alias("purchase_ts_s"),
        F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias("value_c"),
    )
