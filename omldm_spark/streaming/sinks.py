"""Streaming sinks: exactly-once delivery over at-least-once foreachBatch.

Structured Streaming guarantees foreachBatch is called with a monotone
(batch_id, deterministic batch content) pair, but a crash between the
user's write and the checkpoint commit REPLAYS the batch — the handler
must be idempotent or the sink shows duplicates (the classic
at-least-once → exactly-once gap; same contract the reference's Kafka
predictions sink leaves to the consumer, Job.scala:98-105).

IdempotentBatchSink closes the gap with the standard txn-log recipe used
by the Delta/Iceberg sinks: each batch writes to an isolated directory
``batch_id=N`` and then records N in a commit log; a replayed batch id is
detected BEFORE writing and skipped entirely.  Readers take only
committed directories, so a torn write (dir exists, no commit record) is
invisible and simply overwritten by the replay.
"""

from __future__ import annotations

import os


class IdempotentBatchSink:
    """foreachBatch handler delivering exactly-once parquet output.

    Usage::

        sink = IdempotentBatchSink(path)
        stream.writeStream.foreachBatch(sink).start()
        ...
        spark.read.parquet(*sink.committed_dirs())

    Scale: the commit log is one tiny file per batch (list+read at
    reader open is O(batches)); data volume writes once per batch with
    Spark's normal parallelism.  The log lives next to the data so a
    restart from checkpoint sees the same commit state."""

    def __init__(self, path: str):
        self.path = path
        self.log_dir = os.path.join(path, "_commits")
        os.makedirs(self.log_dir, exist_ok=True)

    def _commit_file(self, batch_id: int) -> str:
        return os.path.join(self.log_dir, f"{batch_id}.committed")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._commit_file(batch_id))

    def __call__(self, df, batch_id: int) -> None:
        if self.is_committed(batch_id):
            return  # replayed batch: the write already happened
        out = os.path.join(self.path, f"batch_id={batch_id}")
        df.write.mode("overwrite").parquet(out)
        # the commit record is the atomicity point: written only after
        # the data directory is complete
        with open(self._commit_file(batch_id), "w") as fh:
            fh.write("ok")

    def committed_dirs(self) -> list[str]:
        ids = sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.log_dir)
            if f.endswith(".committed")
        )
        return [os.path.join(self.path, f"batch_id={i}") for i in ids]
