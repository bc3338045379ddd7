"""Streaming sources (S1-S5 analogues, SURVEY.md §2.1).

In production these are Kafka topics:

    spark.readStream.format("kafka")
        .option("subscribe", "trainingData")
        .option("startingOffsets", "earliest")            # S1/S2
    + from_json parsing (functions/parsing.py)

The test/bench environment has no Kafka broker, so the same pipelines run on
file-replay sources: a parquet/json directory consumed with ``readStream``
(availableNow => bounded replay, identical semantics to the reference's
file-driven workload DefaultJobParameters.scala:7). Everything downstream of
the source is source-agnostic — swap the reader, keep the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1-S4: Kafka JSON stream -> raw value column (requires the Kafka
    connector package on the cluster; not available in the test env)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(
            F.col("value").cast("string").alias("value"),
            "topic", "partition", "offset", "timestamp",
        )
    )


def file_replay_source(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Bounded replay of a parquet directory as a stream."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def kafka_sink(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    """S6-S9: JSON rows to Kafka. The reference's custom partitioner
    (FlinkHubMessagePartitioner.scala:6-21) becomes an explicit `partition`
    column when needed; the feedback topic itself is gone (SURVEY.md §3.1)."""
    from ..functions.parsing import to_json_sink

    return (
        to_json_sink(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
