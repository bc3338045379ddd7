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
