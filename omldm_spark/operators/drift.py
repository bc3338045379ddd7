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


# epoch-day parity split: 0 = reference window, 1 = current window
_WIN_EXPR = "CAST(floor(epoch_s / 86400) AS BIGINT) % 2"


def _with_window(events: DataFrame) -> DataFrame:
    # unix_timestamp floors to seconds (ts is TIMESTAMP_NTZ here, which
    # unix_micros refuses); DuckDB mirror is floor(epoch(ts)) — epoch()
    # keeps the fractional second, CAST would round it (engine-gotchas)
    return events.withColumn(
        "epoch_s", F.unix_timestamp("ts").cast("long")
    ).withColumn("win", F.expr(_WIN_EXPR))


_WIN_SQL = ("CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400.0) "
            "AS BIGINT) % 2")


def freq_drift_report(events: DataFrame) -> DataFrame:
    """Categorical frequency drift of ``event_type`` between the
    reference and current windows.

    Output one row per event_type:
      (event_type, a_cnt, b_cnt, a_ppm, b_ppm, l1_ppm, chi2_ppm)
    where a_*/b_* are the reference/current counts and floor-ppm shares,
    l1_ppm = |a_ppm - b_ppm| (summing over types and halving gives the
    total-variation distance), and chi2_ppm is the type's two-sample
    chi-square contribution against the pooled expectation (half-up ppm,
    quantized before any cross-type reduction the caller might do).

    Scale: ONE groupBy(event_type) with conditional sums + a window over
    the per-type frame (|types| rows, not |events|) for the totals — a
    single shuffle keyed on a low-cardinality column; map-side combine
    collapses each partition to |types| partial rows first."""
    return freq_drift_from_counts(freq_drift_counts(events))


def freq_drift_counts(events: DataFrame) -> DataFrame:
    """(event_type, a_cnt, b_cnt): the drift report's ADDITIVE
    sufficient statistic — counts merge by plain sum, so this is the
    carried state of the streaming twin (arrival order irrelevant)."""
    ev = _with_window(events)
    return ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("win") == 0, 1).otherwise(0))
        .cast("long").alias("a_cnt"),
        F.sum(F.when(F.col("win") == 1, 1).otherwise(0))
        .cast("long").alias("b_cnt"),
    )


def freq_drift_from_counts(per: DataFrame) -> DataFrame:
    """Report columns from a (event_type, a_cnt, b_cnt) counts frame."""
    w = Window.partitionBy()
    tot = per.select(
        "event_type", "a_cnt", "b_cnt",
        F.sum("a_cnt").over(w).cast("long").alias("na"),
        F.sum("b_cnt").over(w).cast("long").alias("nb"),
    )
    # pooled expectation per window, identical IEEE operands both engines
    e_a = ("(CAST(a_cnt + b_cnt AS DOUBLE) * CAST(na AS DOUBLE)"
           " / CAST(na + nb AS DOUBLE))")
    e_b = ("(CAST(a_cnt + b_cnt AS DOUBLE) * CAST(nb AS DOUBLE)"
           " / CAST(na + nb AS DOUBLE))")
    return tot.select(
        "event_type", "a_cnt", "b_cnt",
        F.expr("CAST(a_cnt * 1000000 div na AS BIGINT)").alias("a_ppm"),
        F.expr("CAST(b_cnt * 1000000 div nb AS BIGINT)").alias("b_ppm"),
        F.expr(
            "abs(CAST(a_cnt * 1000000 div na AS BIGINT)"
            " - CAST(b_cnt * 1000000 div nb AS BIGINT))"
        ).cast("long").alias("l1_ppm"),
        F.expr(
            f"CAST(floor(((CAST(a_cnt AS DOUBLE) - {e_a})"
            f" * (CAST(a_cnt AS DOUBLE) - {e_a}) / {e_a}"
            f" + (CAST(b_cnt AS DOUBLE) - {e_b})"
            f" * (CAST(b_cnt AS DOUBLE) - {e_b}) / {e_b})"
            " * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("chi2_ppm"),
    )


def FREQ_DRIFT_SQL(table: str = "events") -> str:
    e_a = ("(CAST(a_cnt + b_cnt AS DOUBLE) * CAST(na AS DOUBLE)"
           " / CAST(na + nb AS DOUBLE))")
    e_b = ("(CAST(a_cnt + b_cnt AS DOUBLE) * CAST(nb AS DOUBLE)"
           " / CAST(na + nb AS DOUBLE))")
    return f"""
WITH base AS (
  SELECT event_type, {_WIN_SQL} AS win FROM {table}
),
per AS (
  SELECT event_type,
         CAST(sum(CASE WHEN win = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt,
         CAST(sum(CASE WHEN win = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt
  FROM base GROUP BY 1
),
tot AS (
  SELECT event_type, a_cnt, b_cnt,
         CAST(sum(a_cnt) OVER () AS BIGINT) AS na,
         CAST(sum(b_cnt) OVER () AS BIGINT) AS nb
  FROM per
)
SELECT event_type, a_cnt, b_cnt,
       CAST(a_cnt * 1000000 // na AS BIGINT) AS a_ppm,
       CAST(b_cnt * 1000000 // nb AS BIGINT) AS b_ppm,
       CAST(abs(CAST(a_cnt * 1000000 // na AS BIGINT)
                - CAST(b_cnt * 1000000 // nb AS BIGINT)) AS BIGINT)
         AS l1_ppm,
       CAST(floor(((CAST(a_cnt AS DOUBLE) - {e_a})
                   * (CAST(a_cnt AS DOUBLE) - {e_a}) / {e_a}
                   + (CAST(b_cnt AS DOUBLE) - {e_b})
                   * (CAST(b_cnt AS DOUBLE) - {e_b}) / {e_b})
                  * 1000000.0 + 0.5) AS BIGINT) AS chi2_ppm
FROM tot
"""


def ks_two_sample(events: DataFrame) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic over ``value`` between the
    reference and current windows: D = max over the value domain of
    |CDF_a(v) - CDF_b(v)|, reported as one row
    (d_ppm, at_value_cents, n_a, n_b) with the smallest argmax value as
    the tie-break.

    Exactness: values carry <= 2 decimals in the synthetic data, so
    half-up cents quantization is exact; cumulative counts are exact
    BIGINT window sums and each CDF is a floor-ppm integer division —
    D is bit-identical cross-engine.

    Scale: after the groupBy(v_cents) collapse, the ordered window runs
    over the DISTINCT quantized domain (bounded by the value range x
    100, NOT by the row count) — at 100 TB the cumulative window sees
    the same few-thousand-row frame it sees at sf0.001.  The top-1 is
    an O(domain) sort-limit."""
    return ks_from_counts(ks_counts(events))


def ks_counts(events: DataFrame) -> DataFrame:
    """(v_cents, a_cnt, b_cnt): the KS statistic's ADDITIVE sufficient
    statistic (window membership and quantization are row-local), the
    carried state of the streaming twin."""
    ev = _with_window(events)
    return ev.select(
        F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")
        .alias("v_cents"),
        "win",
    ).groupBy("v_cents").agg(
        F.sum(F.when(F.col("win") == 0, 1).otherwise(0))
        .cast("long").alias("a_cnt"),
        F.sum(F.when(F.col("win") == 1, 1).otherwise(0))
        .cast("long").alias("b_cnt"),
    )


def ks_from_counts(per: DataFrame) -> DataFrame:
    """KS report row from a (v_cents, a_cnt, b_cnt) counts frame."""
    w = Window.orderBy("v_cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy()
    cum = per.select(
        "v_cents",
        F.sum("a_cnt").over(w).cast("long").alias("cum_a"),
        F.sum("b_cnt").over(w).cast("long").alias("cum_b"),
        F.sum("a_cnt").over(wt).cast("long").alias("n_a"),
        F.sum("b_cnt").over(wt).cast("long").alias("n_b"),
    )
    d = cum.select(
        F.expr(
            "CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE"
            " abs(CAST(cum_a * 1000000 div n_a AS BIGINT)"
            " - CAST(cum_b * 1000000 div n_b AS BIGINT)) END"
        ).cast("long").alias("d_ppm"),
        F.col("v_cents").alias("at_value_cents"),
        "n_a", "n_b",
    )
    return d.orderBy(F.desc("d_ppm"), "at_value_cents").limit(1)


def wasserstein_value_periods(events: DataFrame) -> DataFrame:
    """Two-sample 1-Wasserstein (earth-mover) distance over ``value``
    between the same reference/current windows ks_two_sample compares:
    W1 = ∫ |CDF_a − CDF_b| dv — the magnitude-weighted drift number KS
    deliberately ignores (KS sees the largest gap; W1 sees how much
    mass moved how far, the metric retraining-trigger policies
    actually threshold).  Both derive from the SAME additive
    (v_cents, a_cnt, b_cnt) sufficient statistic, so a deployment
    carries one state frame for the whole drift panel.

    Exactness: the trapezoid-free discrete form Σ |cdf_a − cdf_b|·gap
    over the ordered DISTINCT cents domain, every term an exact BIGINT
    (floor-ppm CDFs x integer gaps) — quantize-then-sum.  Output one
    row: (w1_cents_ppm, n_values, n_a, n_b); divide by 100·1e6 for
    currency units.

    Scale: identical to ks_two_sample — the ordered window runs on the
    value-DOMAIN-bounded counts frame, never on rows."""
    return wasserstein_from_counts(ks_counts(events))


def wasserstein_from_counts(per: DataFrame) -> DataFrame:
    """W1 report row from a (v_cents, a_cnt, b_cnt) counts frame."""
    w = Window.orderBy("v_cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wo = Window.orderBy("v_cents")
    wt = Window.partitionBy()
    cum = per.select(
        "v_cents",
        F.sum("a_cnt").over(w).cast("long").alias("cum_a"),
        F.sum("b_cnt").over(w).cast("long").alias("cum_b"),
        F.sum("a_cnt").over(wt).cast("long").alias("n_a"),
        F.sum("b_cnt").over(wt).cast("long").alias("n_b"),
        (F.lead("v_cents").over(wo) - F.col("v_cents")).cast("long")
        .alias("gap"),
    )
    # an EMPTY window makes W1 undefined (NULL), not a division error
    # (Spark non-ANSI would NULL silently where DuckDB raises)
    return cum.agg(
        F.sum(F.expr(
            "CASE WHEN n_a = 0 OR n_b = 0 THEN NULL"
            " WHEN gap IS NULL THEN 0 ELSE"
            " abs(CAST(cum_a * 1000000 div n_a AS BIGINT)"
            " - CAST(cum_b * 1000000 div n_b AS BIGINT)) * gap END"
        )).cast("long").alias("w1_cents_ppm"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
    )


def WASSERSTEIN_SQL(table: str = "events") -> str:
    return f"""
WITH base AS (
  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_cents,
         {_WIN_SQL} AS win
  FROM {table}
),
per AS (
  SELECT v_cents,
         CAST(sum(CASE WHEN win = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt,
         CAST(sum(CASE WHEN win = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt
  FROM base GROUP BY 1
),
cum AS (
  SELECT v_cents,
         CAST(sum(a_cnt) OVER (ORDER BY v_cents
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
         CAST(sum(b_cnt) OVER (ORDER BY v_cents
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b,
         CAST(sum(a_cnt) OVER () AS BIGINT) AS n_a,
         CAST(sum(b_cnt) OVER () AS BIGINT) AS n_b,
         CAST(lead(v_cents) OVER (ORDER BY v_cents) - v_cents
              AS BIGINT) AS gap
  FROM per
)
SELECT CAST(sum(CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
            WHEN gap IS NULL THEN 0 ELSE
            abs(CAST(cum_a * 1000000 // n_a AS BIGINT)
                - CAST(cum_b * 1000000 // n_b AS BIGINT)) * gap END)
            AS BIGINT) AS w1_cents_ppm,
       CAST(count(*) AS BIGINT) AS n_values,
       CAST(max(n_a) AS BIGINT) AS n_a,
       CAST(max(n_b) AS BIGINT) AS n_b
FROM cum
"""


def KS_TWO_SAMPLE_SQL(table: str = "events") -> str:
    return f"""
WITH base AS (
  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_cents,
         {_WIN_SQL} AS win
  FROM {table}
),
per AS (
  SELECT v_cents,
         CAST(sum(CASE WHEN win = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt,
         CAST(sum(CASE WHEN win = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt
  FROM base GROUP BY 1
),
cum AS (
  SELECT v_cents,
         CAST(sum(a_cnt) OVER (ORDER BY v_cents
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
         CAST(sum(b_cnt) OVER (ORDER BY v_cents
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b,
         CAST(sum(a_cnt) OVER () AS BIGINT) AS n_a,
         CAST(sum(b_cnt) OVER () AS BIGINT) AS n_b
  FROM per
)
SELECT CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE
            abs(CAST(cum_a * 1000000 // n_a AS BIGINT)
                - CAST(cum_b * 1000000 // n_b AS BIGINT)) END AS BIGINT)
         AS d_ppm,
       v_cents AS at_value_cents, n_a, n_b
FROM cum
ORDER BY d_ppm DESC, at_value_cents
LIMIT 1
"""


import math as _math

# Wald SPRT constants for H0: p = 0.18 vs H1: p = 0.22 at α = β = 0.05,
# µ-quantized ONCE in Python (half-up) so both engines consume the same
# integer literals — no runtime transcendental anywhere.
SPRT_P0, SPRT_P1 = 0.18, 0.22
SPRT_ALPHA = SPRT_BETA = 0.05
_Q = 1_000_000
SPRT_INC_S = int(_math.floor(_math.log(SPRT_P1 / SPRT_P0) * _Q + 0.5))
SPRT_INC_F = int(_math.floor(
    _math.log((1 - SPRT_P1) / (1 - SPRT_P0)) * _Q + 0.5))
SPRT_LN_A = int(_math.floor(
    _math.log((1 - SPRT_BETA) / SPRT_ALPHA) * _Q + 0.5))
SPRT_LN_B = int(_math.floor(
    _math.log(SPRT_BETA / (1 - SPRT_ALPHA)) * _Q + 0.5))


def sprt_decision_replay(events: DataFrame) -> DataFrame:
    """Wald's sequential probability ratio test (Wald 1945) replayed
    over each experiment arm's event stream — the always-valid
    stopping rule behind "can we call this A/B test early": the
    purchase-indicator log-likelihood ratio accumulates per event and
    the test stops at the first boundary crossing.

    Exactness: because H0/H1 are FIXED hypotheses, each event adds one
    of exactly two constants — ln(p1/p0) or ln((1-p1)/(1-p0)) — so the
    whole trajectory is an integer combination of two µ-quantized
    Python literals; the cumulative LLR, both Wald boundaries, the
    first-crossing indices, and the final LLR (= the plain sum of
    increments) are exact BIGINTs on both engines.  (The DDM-family
    trick: quantize the CONSTANTS once, never the data-dependent
    path.)

    Per arm (user_id % 2): (arm, n, n_success, llr_final_micro,
    first_h1_i, first_h0_i, decision) with decision the FIRST boundary
    crossed ('h1' / 'h0' / 'continue').

    Scale note, explicit: the per-arm cumulative window serializes
    each ARM by construction — that IS the sequential test's
    semantics, not an implementation accident (a parallel rewrite
    changes the statistic).  Arms are the unit of parallelism; a real
    portfolio of experiments × segments supplies thousands of keys,
    and per-arm state is O(1)."""
    word = Window.partitionBy("arm").orderBy("ts", "event_id")
    w = word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = events.select(
        F.expr("user_id % 2").cast("long").alias("arm"),
        "ts", "event_id",
        F.expr(f"CASE WHEN event_type = 'purchase' THEN {SPRT_INC_S}"
               f" ELSE {SPRT_INC_F} END").cast("long").alias("inc"),
        F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
        .cast("long").alias("s"),
    ).select(
        "arm", "s", "inc",
        F.row_number().over(word).alias("i"),
        F.sum("inc").over(w).alias("llr"),
    )
    agg = seq.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").cast("long").alias("n_success"),
        F.sum("inc").cast("long").alias("llr_final_micro"),
        F.min(F.when(F.col("llr") >= SPRT_LN_A, F.col("i")))
        .cast("long").alias("first_h1_i"),
        F.min(F.when(F.col("llr") <= SPRT_LN_B, F.col("i")))
        .cast("long").alias("first_h0_i"),
    )
    return agg.select(
        "arm", "n", "n_success", "llr_final_micro",
        "first_h1_i", "first_h0_i",
        F.expr(
            "CASE"
            " WHEN first_h1_i IS NOT NULL AND (first_h0_i IS NULL"
            "      OR first_h1_i < first_h0_i) THEN 'h1'"
            " WHEN first_h0_i IS NOT NULL THEN 'h0'"
            " ELSE 'continue' END"
        ).alias("decision"),
    )


def SPRT_SQL(table: str = "events") -> str:
    return f"""
WITH seq AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS arm,
         row_number() OVER wo AS i,
         CASE WHEN event_type = 'purchase' THEN {SPRT_INC_S}
         ELSE {SPRT_INC_F} END AS inc,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN {SPRT_INC_S}
                  ELSE {SPRT_INC_F} END) OVER
           (PARTITION BY user_id % 2 ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS llr
  FROM {table}
  WINDOW wo AS (PARTITION BY user_id % 2 ORDER BY ts, event_id)
),
agg AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(s) AS BIGINT) AS n_success,
         CAST(sum(inc) AS BIGINT) AS llr_final_micro,
         CAST(min(CASE WHEN llr >= {SPRT_LN_A} THEN i END) AS BIGINT)
           AS first_h1_i,
         CAST(min(CASE WHEN llr <= {SPRT_LN_B} THEN i END) AS BIGINT)
           AS first_h0_i
  FROM seq GROUP BY 1
)
SELECT arm, n, n_success, llr_final_micro, first_h1_i, first_h0_i,
       CASE
       WHEN first_h1_i IS NOT NULL AND (first_h0_i IS NULL
            OR first_h1_i < first_h0_i) THEN 'h1'
       WHEN first_h0_i IS NOT NULL THEN 'h0'
       ELSE 'continue' END AS decision
FROM agg
"""
