"""Deterministic 80/20 holdout split (reference test strategy, SURVEY.md §5).

Reference semantics (src/main/scala/omldm/operators/spoke/FlinkSpoke.scala:
92-107): each worker keeps a per-record counter modulo 10; records #8 and #9
of every 10 go to a 256-element rolling test set; on eviction from the full
test buffer the evicted point is fed back to training. Fixed RNG seed 25
(FlinkSpoke.scala:52) makes the reference replayable; we go one further and
make the split a pure function of the record id so it is expressible in ANSI
SQL for the DuckDB oracle:

* worker  = id % num_workers               (the reference's rebalance)
* rn      = row_number() over (partition by worker order by id)
* test slot iff (rn - 1) % 10 in (8, 9)    (counter >= 8 of every 10)
* rolling eviction: of the test-slot rows per worker only the trailing
  ``test_set_size`` stay 'test'; older ones are re-tagged 'train'
  (eviction feeds them back to training, FlinkSpoke.scala:96-99).

Scale note: both windows partition by ``worker`` (and the slot flag) — no
global sort, and num_workers tracks cluster parallelism, so partitions stay
balanced by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TEST_SET_SIZE = 256  # DefaultJobParameters.scala:11
NUM_WORKERS = 8      # stand-in for job parallelism 16 at small SF


def train_test_split(
    points: DataFrame,
    num_workers: int | None = NUM_WORKERS,
    test_set_size: int = TEST_SET_SIZE,
    id_col: str = "id",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Adds ``worker`` (int), ``rn`` (per-worker row number) and ``split``
    ('train'|'test') columns, with the rolling-256 eviction applied.

    ``num_workers=None`` derives the worker count from the session's
    default parallelism — the production setting (each per-worker window
    sorts 1/parallelism of the data, the reference's rebalance across job
    parallelism). Oracle-checked callers pass an explicit count so the
    DuckDB SQL twin sees the same number.

    ``order_cols`` must be a deterministic TOTAL order (unique key) — ties in
    row_number would otherwise resolve differently per engine/run.
    """
    if num_workers is None:
        num_workers = int(points.sparkSession.sparkContext.defaultParallelism)
    order_cols = order_cols or [id_col]
    w = Window.partitionBy("worker").orderBy(*order_cols)
    numbered = points.withColumn(
        "worker", F.pmod(F.col(id_col), F.lit(num_workers)).cast("int")
    ).withColumn("rn", F.row_number().over(w))
    slotted = numbered.withColumn(
        "is_test_slot", F.pmod(F.col("rn") - 1, F.lit(10)) >= 8
    )
    wt = Window.partitionBy("worker", "is_test_slot").orderBy(F.col("rn").desc())
    return (
        slotted.withColumn("recency", F.row_number().over(wt))
        .withColumn(
            "split",
            F.when(
                F.col("is_test_slot") & (F.col("recency") <= test_set_size),
                F.lit("test"),
            ).otherwise(F.lit("train")),
        )
        .drop("is_test_slot", "recency")
    )


def split_sql(
    inner_sql: str,
    num_workers: int = NUM_WORKERS,
    test_set_size: int = TEST_SET_SIZE,
    id_col: str = "id",
    order_cols: list[str] | None = None,
) -> str:
    """DuckDB oracle equivalent of :func:`train_test_split` over ``inner_sql``."""
    order_by = ", ".join(order_cols or [id_col])
    return f"""
WITH pts AS ({inner_sql}),
numbered AS (
  SELECT *,
         CAST({id_col} % {num_workers} AS INTEGER) AS worker,
         CAST(ROW_NUMBER() OVER (PARTITION BY {id_col} % {num_workers}
                            ORDER BY {order_by}) AS INTEGER) AS rn
  FROM pts
),
slotted AS (
  SELECT *, ((rn - 1) % 10 >= 8) AS is_test_slot FROM numbered
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY worker, is_test_slot
                            ORDER BY rn DESC) AS recency
  FROM slotted
)
SELECT * EXCLUDE (is_test_slot, recency),
       CASE WHEN is_test_slot AND recency <= {test_set_size}
            THEN 'test' ELSE 'train' END AS split
FROM ranked
"""
