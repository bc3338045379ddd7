"""Concept-drift detection over error streams (DDM family).

Beyond-reference surface, but squarely in the reference's domain: OMLDM
trains online learners yet ships no drift detector (verified: no
DDM/ADWIN/EDDM anywhere in /root/reference/src); every production online-ML
loop pairs the learner with one. This is the batch/replay shape of DDM
(Gama et al. 2004): for a Bernoulli error stream e_1..e_n,

    p_i = (Σ e_j) / i          running error rate
    s_i = sqrt(p_i (1-p_i)/i)  its standard error

WARN  when p_i + s_i > min(p) + 2 * min(s)
DRIFT when p_i + s_i > min(p) + 3 * min(s)

Variant note (deliberate, documented): the minima of p and s are tracked
INDEPENDENTLY (running min of each), not jointly at the argmin of p+s as
in the original paper, and there is no post-drift reset — this is the
single-pass replay shape. Independent minima make the detector exactly
expressible as two running-min window aggregates on BOTH engines (a
joint argmin needs min-by-struct, which DuckDB windows don't guarantee);
thresholds are conservative relative to the original (min p + min s <=
p@argmin + s@argmin), so it flags at least as early. Two standard DDM
guards are kept: comparisons are STRICT (an all-clean history has
p = s = 0 and must not self-trigger) and both the minima and the flags
only engage after ``min_instances`` records per key (the paper's
warm-up; rate estimates before that are noise).

Scale design: everything is per-key windows over ONE (key)-partitioned
(ts, id)-ordered exchange — running sums and running minima are
constant-memory frame aggregates; the summary is a per-key groupBy on the
same partitioning. Parallelism = |keys| (pipelines/users), the natural
axis for per-model drift monitoring; no global sequential state.

Cross-engine exactness: p, s, and the thresholds are computed with a
mirrored operation sequence (one division each, sqrt is IEEE
correctly-rounded, same comparison expressions), so the boolean flag
sequence — and therefore the integer summary — is bit-identical in Spark
and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ddm_drift_summary(events: DataFrame, error_col,
                      key_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id",
                      min_instances: int = 30) -> DataFrame:
    """Per-key DDM replay summary: (key, n, n_warn, n_drift,
    first_drift_i). ``error_col`` is a boolean Column (the per-record
    mistake indicator)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = events.select(
        F.col(key_col), F.col(ts_col), F.col(id_col),
        error_col.cast("int").alias("_e"),
    )
    seq = base.select(
        key_col,
        F.row_number().over(
            Window.partitionBy(key_col).orderBy(ts_col, id_col)
        ).alias("i"),
        F.sum("_e").over(w).alias("_errs"),
    )
    p = F.col("_errs").cast("double") / F.col("i").cast("double")
    stats = seq.select(
        key_col, "i", p.alias("p"),
        F.sqrt(p * (F.lit(1.0) - p) / F.col("i").cast("double")).alias("s"),
    )
    wmin = (
        Window.partitionBy(key_col)
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    warm = F.col("i") >= min_instances
    flagged = stats.select(
        key_col, "i",
        (F.col("p") + F.col("s")).alias("ps"),
        F.min(F.when(warm, F.col("p"))).over(wmin).alias("pmin"),
        F.min(F.when(warm, F.col("s"))).over(wmin).alias("smin"),
    ).select(
        key_col, "i",
        (F.col("ps") > F.col("pmin") + 2 * F.col("smin")).alias("warn"),
        (F.col("ps") > F.col("pmin") + 3 * F.col("smin")).alias("drift"),
    )
    return (
        flagged.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("warn").cast("long")).cast("long").alias("n_warn"),
            F.sum(F.col("drift").cast("long")).cast("long").alias("n_drift"),
            F.min(F.when(F.col("drift"), F.col("i"))).cast("long")
             .alias("first_drift_i"),
        )
        .select(
            F.col(key_col).cast("long").alias(key_col),
            "n", "n_warn", "n_drift", "first_drift_i",
        )
    )


def DDM_SQL(error_expr: str = "event_type = 'error'", table: str = "events",
            key_col: str = "user_id", ts_col: str = "ts",
            id_col: str = "event_id", min_instances: int = 30) -> str:
    return f"""
WITH seq AS (
  SELECT {key_col},
         row_number() OVER w AS i,
         sum(CASE WHEN {error_expr} THEN 1 ELSE 0 END) OVER
           (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _errs
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col})
),
stats AS (
  SELECT {key_col}, i,
         CAST(_errs AS DOUBLE) / CAST(i AS DOUBLE) AS p,
         sqrt((CAST(_errs AS DOUBLE) / CAST(i AS DOUBLE))
              * (1.0 - CAST(_errs AS DOUBLE) / CAST(i AS DOUBLE))
              / CAST(i AS DOUBLE)) AS s
  FROM seq
),
flagged AS (
  SELECT {key_col}, i,
         (p + s) > min(CASE WHEN i >= {min_instances} THEN p END) OVER wm
                   + 2 * min(CASE WHEN i >= {min_instances} THEN s END)
                     OVER wm AS warn,
         (p + s) > min(CASE WHEN i >= {min_instances} THEN p END) OVER wm
                   + 3 * min(CASE WHEN i >= {min_instances} THEN s END)
                     OVER wm AS drift
  FROM stats
  WINDOW wm AS (PARTITION BY {key_col} ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST({key_col} AS BIGINT) AS {key_col},
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN warn THEN 1 ELSE 0 END) AS BIGINT) AS n_warn,
       CAST(sum(CASE WHEN drift THEN 1 ELSE 0 END) AS BIGINT) AS n_drift,
       CAST(min(CASE WHEN drift THEN i END) AS BIGINT) AS first_drift_i
FROM flagged
GROUP BY {key_col}
"""
