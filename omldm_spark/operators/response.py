"""Scatter-gather response merging + statistics rollups (SURVEY.md §2.4).

* A5 ``ResponseConstructor`` (src/main/scala/omldm/utils/
  ResponseConstructor.scala:13-69): per ``responseId`` a count barrier waits
  for ``parallelism`` partial QueryResponses, then sums ``dataFitted`` and
  averages ``loss`` / ``cumulativeLoss`` / ``score``. In Spark the barrier is
  a HAVING on the group count — one partial-aggregated shuffle.
* A3 ``StatisticsAggregateFunction`` (src/main/scala/omldm/state/
  StateAccumulators.scala:54-126): per-pipeline rollup — means of
  blocks/models/fitted across hubs, concatenated learning curves.
* A4 ``StatisticsOperator`` (…/statistics/StatisticsOperator.scala:21-150):
  job-level min/max wall-clock + score normalization
  ``score / (parallelism * testSetSize)`` (:115-123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_query_responses(partials: DataFrame, parallelism: int) -> DataFrame:
    """A5: merge per-worker partial QueryResponses once all have arrived.

    Input columns: responseId, dataFitted, loss, cumulativeLoss, score.
    """
    return (
        partials.groupBy("responseId")
        .agg(
            F.sum("dataFitted").cast("long").alias("dataFitted"),
            F.avg("loss").alias("loss"),
            F.avg("cumulativeLoss").alias("cumulativeLoss"),
            F.avg("score").alias("score"),
            F.count(F.lit(1)).alias("n_partials"),
        )
        .filter(F.col("n_partials") == parallelism)
        .drop("n_partials")
    )


def response_merge_sql(inner_sql: str, parallelism: int) -> str:
    return f"""
SELECT "responseId",
       CAST(sum("dataFitted") AS BIGINT) AS "dataFitted",
       avg(loss) AS loss,
       avg("cumulativeLoss") AS "cumulativeLoss",
       avg(score) AS score
FROM ({inner_sql})
GROUP BY "responseId"
HAVING count(*) = {parallelism}
"""


def rollup_statistics(stats: DataFrame) -> DataFrame:
    """A3: per-pipeline statistics rollup across hub replicas.

    Input columns: pipeline, protocol, modelsShipped, bytesShipped,
    numOfBlocks, fitted.
    """
    return stats.groupBy("pipeline", "protocol").agg(
        F.avg("modelsShipped").alias("modelsShipped"),
        F.avg("bytesShipped").alias("bytesShipped"),
        F.avg("numOfBlocks").alias("numOfBlocks"),
        F.avg("fitted").alias("fitted"),
        F.count(F.lit(1)).cast("long").alias("numHubs"),
    )


def job_statistics(stats: DataFrame, parallelism: int, test_set_size: int) -> DataFrame:
    """A4: job-level aggregation with score normalization."""
    return stats.agg(
        F.min("startTs").alias("startTs"),
        F.max("endTs").alias("endTs"),
        F.sum("fitted").cast("long").alias("fitted"),
        (F.sum("score") / F.lit(float(parallelism * test_set_size))).alias("score"),
    )
