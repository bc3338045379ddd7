"""Declarative data-quality validation (beyond-reference §2.11; the
Deequ/Great-Expectations idea as engine-level DataFrame ops).

A constraint suite compiles into the MINIMUM number of passes:

* all row-local checks (not-null, range, set-membership, custom
  predicate) become ``sum(CASE WHEN violated)`` terms of ONE aggregate
  over one scan — adding a check costs zero extra reads;
* a uniqueness check adds one keyed groupBy (count rows in groups of
  size > 1);
* a referential check adds one LEFT ANTI join against the parent keys
  (broadcast when the parent is a dim).

Every metric is an exact BIGINT violation count, so the report is
oracle-checkable — no sampled or approximate validation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violated when non-null and outside [lo, hi]."""
    c = F.col(col)
    return (f"in_range({col},{lo},{hi})",
            c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))))


def in_set(col: str, values: list) -> tuple[str, Column]:
    c = F.col(col)
    return (f"in_set({col})", c.isNotNull() & ~c.isin(values))


def satisfies(name: str, violated: Column) -> tuple[str, Column]:
    """Custom predicate: ``violated`` true on bad rows."""
    return (name, violated)


def dq_report(
    df: DataFrame,
    row_checks: list[tuple[str, Column]],
    unique: list[list[str]] | None = None,
    references: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Run the suite; returns (constraint, violations, passed) — one row
    per constraint, violations an exact row count.

    ``unique``: each entry is a key-column list that must be unique.
    ``references``: (child_col, parent_df, parent_col) — child values
    (non-null) must exist in the parent."""
    spark = df.sparkSession
    agg = df.agg(*[
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_c{i}")
        for i, (_, cond) in enumerate(row_checks)
    ])
    reports = [
        agg.select(
            F.array(*[
                F.struct(
                    F.lit(name).alias("check_name"),
                    F.col(f"_c{i}").alias("violations"),
                )
                for i, (name, _) in enumerate(row_checks)
            ]).alias("_a")
        ).select(F.explode("_a").alias("_r")).select("_r.*")
    ]
    for cols in unique or []:
        dup = (
            df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long")
                 .alias("violations"))
            .select(
                F.lit(f"unique({','.join(cols)})").alias("check_name"),
                "violations",
            )
        )
        reports.append(dup)
    for child_col, parent, parent_col in references or []:
        orphans = (
            df.filter(F.col(child_col).isNotNull())
            .join(
                parent.select(F.col(parent_col).alias(child_col)).distinct(),
                on=child_col, how="left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .select(
                F.lit(f"references({child_col})").alias("check_name"),
                "violations",
            )
        )
        reports.append(orphans)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("violations") == 0)
