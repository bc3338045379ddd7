"""Table loading + the lineitem->DataInstance derivation used everywhere.

The driver testdata (TESTDATA.md) is the canonical input. The reference
consumes JSON ``DataInstance`` records from Kafka; we derive an equivalent,
fully deterministic learning-point stream from ``lineitem`` so that every
step stays DuckDB-oracle-checkable:

* numericalFeatures = [l_quantity, l_discount, l_tax]
* target            = l_extendedprice  (regression target)
* label01           = sign test (l_returnflag = 'R')  for classifiers
* operation         = 'forecasting' for every 10th row else 'training'
  (deterministic on the key, mirroring the reference's count-based routing,
  FlinkSpoke.scala:92-107)
* id                = l_orderkey * 8 + l_linenumber (unique, replayable order)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) which vanilla Spark refuses; read the
        # physical INT64 as nanos-since-epoch (runtime-settable legacy conf)
        # and expose a proper timestamp column alongside.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def data_instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> DataInstance-shaped DataFrame (deterministic derivation).

    Columns: id, numericalFeatures, discreteFeatures, categoricalFeatures,
    target, operation — the schema parsed by the reference at
    DataPointParser.scala:17-47. Pure column expressions: stays inside
    whole-stage codegen, columns prune down to the 7 used lineitem fields.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rid = (F.col("l_orderkey") * F.lit(8) + F.col("l_linenumber")).cast("long")
    return li.select(
        rid.alias("id"),
        F.array(F.col("l_quantity"), F.col("l_discount"), F.col("l_tax")).alias(
            "numericalFeatures"
        ),
        F.array(F.col("l_linenumber")).alias("discreteFeatures"),
        F.array(F.col("l_returnflag"), F.col("l_linestatus")).alias(
            "categoricalFeatures"
        ),
        F.col("l_extendedprice").alias("target"),
        F.when(F.pmod(rid, F.lit(10)) == 0, F.lit("forecasting"))
        .otherwise(F.lit("training"))
        .alias("operation"),
    )


# The same derivation as ANSI SQL for the DuckDB oracle (views pre-registered
# by the driver). Kept adjacent to the Spark version so they evolve together.
DATA_INSTANCES_SQL = """
SELECT
  CAST(l_orderkey * 8 + l_linenumber AS BIGINT) AS id,
  [l_quantity, l_discount, l_tax] AS "numericalFeatures",
  [l_linenumber] AS "discreteFeatures",
  [l_returnflag, l_linestatus] AS "categoricalFeatures",
  l_extendedprice AS target,
  CASE WHEN (l_orderkey * 8 + l_linenumber) % 10 = 0
       THEN 'forecasting' ELSE 'training' END AS operation
FROM lineitem
"""
