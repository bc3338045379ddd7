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


class KeyedUpsertSink:
    """foreachBatch handler delivering a DISTRIBUTED keyed upsert sink —
    the lakehouse-MERGE shape (Delta/Iceberg ``MERGE INTO`` on the key)
    built from parquet + a commit log, for update-mode streaming
    aggregations whose result is "last write per key wins".

    Layout (a miniature copy-on-write table, bucketed by key hash)::

        path/_staged/<batch_id>/__bucket=B/...   raw batch, hash-bucketed
        path/state/<batch_id>/__bucket=B/...     merged state version
        path/_commits/<batch_id>.json            touched-bucket manifest

    Per batch: the updates are written once ``partitionBy(__bucket)``
    (only buckets with rows materialize a directory — that filesystem
    listing, not a ``collect()``, is how the touched set is discovered),
    then ONLY those buckets' current state is read back, anti-joined
    against the batch's keys, unioned with the updates and rewritten as a
    new version of those buckets.  Work per batch is proportional to the
    touched buckets' size, never to the whole state, and no data row ever
    crosses to the driver — the driver handles only bucket numbers and
    commit records (tests/test_stateful.py pins collect-free operation).

    Exactly-once: the commit record is written only after the new state
    version is complete.  A replayed committed batch is skipped before
    any write; a torn (uncommitted) version is invisible to readers and
    simply overwritten by the replay.  The merge itself is idempotent —
    re-applying a batch against the last COMMITTED state yields byte-equal
    state — so crash-replay cannot diverge.

    At 100 TB: ``n_buckets`` picks the merge granularity (buckets ~=
    shuffle partitions of the state); versions accrue one directory per
    touched bucket per batch and ``vacuum()`` drops superseded ones, the
    same compaction discipline Delta applies.  The reference publishes
    results through Kafka sinks and leaves compaction to the consumer
    (Job.scala:89-105); this sink IS that compacted view, queryable
    in-place.
    """

    BUCKET = "__bucket"

    def __init__(self, path: str, key_cols: list[str], n_buckets: int = 32):
        self.path = path
        self.key_cols = list(key_cols)
        self.n_buckets = n_buckets
        self.log_dir = os.path.join(path, "_commits")
        os.makedirs(self.log_dir, exist_ok=True)

    # -- commit log -------------------------------------------------------
    def _commit_file(self, batch_id: int) -> str:
        return os.path.join(self.log_dir, f"{batch_id}.json")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._commit_file(batch_id))

    def _committed(self) -> list[tuple[int, list[int]]]:
        """(batch_id, touched buckets) in commit order."""
        import json

        out = []
        for f in sorted(os.listdir(self.log_dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.log_dir, f)) as fh:
                    out.append((int(f.split(".")[0]), json.load(fh)["buckets"]))
        return sorted(out)

    def _latest(self) -> dict[int, int]:
        """bucket -> batch_id of its latest committed version."""
        latest: dict[int, int] = {}
        for bid, buckets in self._committed():
            for b in buckets:
                latest[b] = bid
        return latest

    # -- helpers ----------------------------------------------------------
    def _with_bucket(self, df):
        from pyspark.sql import functions as F

        return df.withColumn(
            self.BUCKET,
            F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_buckets))
            .cast("int"),
        )

    @staticmethod
    def _bucket_dirs(root: str) -> list[int]:
        if not os.path.isdir(root):
            return []
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(root)
            if d.startswith(KeyedUpsertSink.BUCKET + "=")
        )

    def _read_buckets(self, spark, latest: dict[int, int], buckets: list[int]):
        """Union the latest committed version of each requested bucket.
        The partition column is re-derived from the keys (deterministic),
        so no basePath juggling across versions is needed."""
        paths = [
            os.path.join(
                self.path, "state", str(latest[b]), f"{self.BUCKET}={b}"
            )
            for b in buckets
            if b in latest
        ]
        if not paths:
            return None
        return self._with_bucket(spark.read.parquet(*paths))

    # -- the handler ------------------------------------------------------
    def __call__(self, df, batch_id: int) -> None:
        import json

        if self.is_committed(batch_id):
            return  # replayed committed batch: already merged
        spark = df.sparkSession
        staged_dir = os.path.join(self.path, "_staged", str(batch_id))
        up = self._with_bucket(df)
        up.write.partitionBy(self.BUCKET).mode("overwrite").parquet(staged_dir)
        touched = self._bucket_dirs(staged_dir)
        if touched:
            staged = self._with_bucket(
                spark.read.parquet(
                    *[os.path.join(staged_dir, f"{self.BUCKET}={b}")
                      for b in touched]
                )
            )
            cur = self._read_buckets(spark, self._latest(), touched)
            if cur is not None:
                cond = None
                for k in self.key_cols:
                    c = cur[k].eqNullSafe(staged[k])
                    cond = c if cond is None else (cond & c)
                keep = cur.join(staged, cond, "left_anti")
                merged = staged.unionByName(keep)
            else:
                merged = staged
            merged.write.partitionBy(self.BUCKET).mode("overwrite").parquet(
                os.path.join(self.path, "state", str(batch_id))
            )
        with open(self._commit_file(batch_id), "w") as fh:
            json.dump({"buckets": touched}, fh)

    # -- readers / maintenance -------------------------------------------
    def current_state(self, spark, columns: list[str] | None = None):
        """The compacted keyed state as a DataFrame (one row per key) —
        a distributed read of each bucket's latest committed version."""
        latest = self._latest()
        cur = self._read_buckets(spark, latest, sorted(latest))
        if cur is None:
            return None
        out = cur.drop(self.BUCKET)
        return out.select(*columns) if columns else out

    def state_as_of(self, spark, batch_id: int,
                    columns: list[str] | None = None):
        """TIME TRAVEL: the compacted keyed state as it stood after
        ``batch_id`` committed — per bucket, the latest version with id
        <= batch_id is read.  Free with the copy-on-write layout (the
        same mechanism Delta's VERSION AS OF rides); versions survive
        until ``vacuum()`` discards them."""
        latest: dict[int, int] = {}
        for bid, buckets in self._committed():
            if bid > batch_id:
                break
            for b in buckets:
                latest[b] = bid
        cur = self._read_buckets(spark, latest, sorted(latest))
        if cur is None:
            return None
        out = cur.drop(self.BUCKET)
        return out.select(*columns) if columns else out

    def vacuum(self) -> int:
        """Delete superseded bucket versions; returns dirs removed."""
        import shutil

        latest = self._latest()
        removed = 0
        state_root = os.path.join(self.path, "state")
        for bid, buckets in self._committed():
            for b in buckets:
                if latest.get(b) != bid:
                    d = os.path.join(
                        state_root, str(bid), f"{self.BUCKET}={b}"
                    )
                    if os.path.isdir(d):
                        shutil.rmtree(d)
                        removed += 1
        shutil.rmtree(os.path.join(self.path, "_staged"), ignore_errors=True)
        return removed


class DeltaUpsertSink:
    """foreachBatch keyed upsert through a real lakehouse MERGE INTO —
    the production backend for clusters that ship delta-spark (absent in
    this container: the import is LAZY and surfaces as a clearly-marked
    NotImplementedError, the same gating discipline as the media
    decoders).  Semantics are identical to KeyedUpsertSink (last write
    per key wins, idempotent under foreachBatch replay because MERGE on
    the same updates converges); KeyedUpsertSink remains the
    dependency-free engine-owned implementation with the same contract,
    so the two are drop-in interchangeable behind the publish path."""

    def __init__(self, path: str, key_cols: list[str]):
        self.path = path
        self.key_cols = list(key_cols)

    def __call__(self, df, batch_id: int) -> None:
        try:
            from delta.tables import DeltaTable
        except ImportError as exc:  # pragma: no cover - env without delta
            raise NotImplementedError(
                "DeltaUpsertSink requires delta-spark; use KeyedUpsertSink "
                "(same contract, parquet + commit log) where it is absent"
            ) from exc
        spark = df.sparkSession
        if not DeltaTable.isDeltaTable(spark, self.path):
            df.write.format("delta").mode("overwrite").save(self.path)
            return
        tgt = DeltaTable.forPath(spark, self.path)
        cond = " AND ".join(
            f"t.{k} <=> s.{k}" for k in self.key_cols
        )
        (
            tgt.alias("t")
            .merge(df.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    def current_state(self, spark, columns: list[str] | None = None):
        out = spark.read.format("delta").load(self.path)
        return out.select(*columns) if columns else out
