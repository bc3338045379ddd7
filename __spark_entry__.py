"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``omldm_spark/queries.py``; this file is the thin
driver-facing shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: Create(ORR +
    StandardScaler) through the catalog -> preprocessor chain fitted as
    exact running moments inside train_batch -> closed-form train on the
    deterministic 80/20 split -> Query -> QueryResponse row (holdout
    score, weights) — the full control-plane + training-loop wiring."""
    from omldm_spark.queries import QUERIES

    return QUERIES["orr_scaled_query_response"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from omldm_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from omldm_spark.queries import ORACLES

    return dict(ORACLES)
