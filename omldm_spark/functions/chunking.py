"""R5: parameter chunking for size-capped transports (SURVEY.md §2.7).

The reference slices large parameter maps into <=10,000-element buckets
keyed ``name[start-end]`` for its Kafka RPC transport
(src/main/scala/omldm/network/FlinkNetwork.scala:48-149, bucket const :50;
``maxMsgParams`` defaults DefaultJobParameters.scala:6).

Spark's shuffle has no per-message cap, so the engine itself never needs
this; it survives as an optional sink-side operator for Kafka payload
limits — pure Catalyst (sequence + transform + explode), reassembly is a
groupBy + ordered flatten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PARAM_BUCKET = 10_000  # FlinkNetwork.scala:50


def chunk_parameters(
    params: DataFrame,
    bucket_size: int = MAX_PARAM_BUCKET,
    key_cols: tuple[str, ...] = ("pipeline_id", "name"),
    values_col: str = "values",
) -> DataFrame:
    """Split ARRAY<DOUBLE> parameter rows into bounded buckets.

    Output: key cols + bucket_idx, bucket_start, bucket (ARRAY<DOUBLE>).
    """
    n_buckets = F.ceil(F.size(F.col(values_col)) / F.lit(bucket_size)).cast("int")
    return (
        params.withColumn(
            "bucket_idx",
            F.explode(F.sequence(F.lit(0), F.greatest(n_buckets, F.lit(1)) - 1)),
        )
        .select(
            *key_cols,
            "bucket_idx",
            (F.col("bucket_idx") * bucket_size).alias("bucket_start"),
            F.slice(
                F.col(values_col),
                F.col("bucket_idx") * bucket_size + 1,
                bucket_size,
            ).alias("bucket"),
        )
    )


def reassemble_parameters(
    chunks: DataFrame,
    key_cols: tuple[str, ...] = ("pipeline_id", "name"),
) -> DataFrame:
    """Inverse of chunk_parameters: ordered concat of buckets per key."""
    return (
        chunks.groupBy(*key_cols)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("bucket_idx", "bucket"))
                ).bucket
            ).alias("values")
        )
    )
