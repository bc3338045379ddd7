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


def page_hinkley_summary(events: DataFrame, value_col,
                         delta: float = 0.005, lam: float = 50.0,
                         key_col: str = "user_id", ts_col: str = "ts",
                         id_col: str = "event_id") -> DataFrame:
    """Page-Hinkley test per key over a NON-NEGATIVE numeric stream
    (mean-increase form): with running mean mean_i = (Σ x)/i,

        m_i  = Σ_{j<=i} (x_j - mean_j - delta)      cumulative deviation
        PH_i = m_i - min_{j<=i}(m_j)
        drift when PH_i > lam

    The numeric-drift companion to ddm_drift_summary (DDM watches a
    Bernoulli error rate; PH watches any metric — loss, latency, value).
    Single-pass replay: no post-drift reset, same rationale as DDM.

    Exactness design — ALL-INTEGER, deliberately: a cumulative float sum
    is NOT portable across engines (window sums may reassociate — DuckDB
    uses a segment tree — and float addition isn't associative), so every
    quantity here is a quantized integer: xq = round(x * 1e6), running
    sums are exact BIGINTs, the running mean is the integral division
    sxq div i (== floor for the non-negative inputs this requires — feed
    losses/latencies/values, not signed residuals), and the deviation,
    cumulative m, running min, and lam threshold stay in BIGINT µ-units
    end to end. The textbook deviation: the mean is quantized to 1e-6
    before subtracting — bounded by 1µ per step, and identical on both
    engines, which is the property that matters.

    Scale shape: same as DDM — chained constant-memory window aggregates
    over ONE (key)-partitioned (ts, id)-ordered exchange, then a per-key
    rollup on the same partitioning.

    Output: (key, n, n_drift, first_drift_i, max_ph_q) — max_ph_q in
    µ-units (divide by 1e6 for the PH value).
    """
    Q = 1_000_000
    dq = int(round(delta * Q))
    lamq = int(round(lam * Q))
    word = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    w = word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    xq = (
        F.round(F.col(value_col).cast("double") * Q, 0)
        if isinstance(value_col, str)
        else F.round(value_col.cast("double") * Q, 0)
    ).cast("long")
    seq = events.select(
        F.col(key_col), F.col(ts_col), F.col(id_col), xq.alias("_xq")
    ).select(
        key_col,
        F.row_number().over(word).alias("i"),
        F.col("_xq"),
        F.sum("_xq").over(w).alias("_sxq"),
    )
    dev = seq.select(
        key_col, "i",
        (F.col("_xq") - F.expr("_sxq div i") - F.lit(dq)).alias("_dq"),
    )
    wi = (
        Window.partitionBy(key_col).orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ph = dev.select(
        key_col, "i", F.sum("_dq").over(wi).alias("_m")
    ).select(
        key_col, "i",
        (F.col("_m") - F.min("_m").over(wi)).alias("_ph"),
    )
    return (
        ph.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("_ph") > lamq).cast("long")).cast("long")
             .alias("n_drift"),
            F.min(F.when(F.col("_ph") > lamq, F.col("i"))).cast("long")
             .alias("first_drift_i"),
            F.max("_ph").cast("long").alias("max_ph_q"),
        )
        .select(
            F.col(key_col).cast("long").alias(key_col),
            "n", "n_drift", "first_drift_i", "max_ph_q",
        )
    )


def PAGE_HINKLEY_SQL(value_expr: str = "value", delta: float = 0.005,
                     lam: float = 50.0, table: str = "events",
                     key_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id") -> str:
    Q = 1_000_000
    dq = int(round(delta * Q))
    lamq = int(round(lam * Q))
    return f"""
WITH seq AS (
  SELECT {key_col},
         row_number() OVER wo AS i,
         CAST(round(CAST({value_expr} AS DOUBLE) * {Q}, 0) AS BIGINT) AS xq,
         CAST(sum(CAST(round(CAST({value_expr} AS DOUBLE) * {Q}, 0)
                       AS BIGINT)) OVER
           (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS sxq
  FROM {table}
  WINDOW wo AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col})
),
dev AS (
  SELECT {key_col}, i, xq - (sxq // i) - {dq} AS dq FROM seq
),
m AS (
  SELECT {key_col}, i,
         CAST(sum(dq) OVER wi AS BIGINT) AS mi
  FROM dev
  WINDOW wi AS (PARTITION BY {key_col} ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
ph AS (
  SELECT {key_col}, i, mi - min(mi) OVER wi AS ph
  FROM m
  WINDOW wi AS (PARTITION BY {key_col} ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST({key_col} AS BIGINT) AS {key_col},
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN ph > {lamq} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_drift,
       CAST(min(CASE WHEN ph > {lamq} THEN i END) AS BIGINT)
         AS first_drift_i,
       CAST(max(ph) AS BIGINT) AS max_ph_q
FROM ph
GROUP BY {key_col}
"""
