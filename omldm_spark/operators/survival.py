"""Kaplan-Meier survival estimation over session durations.

Beyond-reference surface: the churn/retention estimator — S(t) = product
over death times t_i <= t of (1 - d_i/n_i) with right-censored
observations leaving the risk set silently.  The engine-side work is all
histogram-scale: one pass collapses the observations to per-duration
(deaths, at-risk) counts, and the KM product folds over the DISTINCT
death times only.

Exactness design: the survival curve is an inherently SEQUENTIAL product,
so it uses the integer-fold envelope (the ewma_user_value pattern): S in
integer ppm with S' = S * (n_i - d_i) div n_i — truncating division makes
every prefix bit-identical cross-engine.  Each output row's S folds its
own prefix of the (t, d, n) array (O(k^2) lambda work for k distinct
death times — k is duration-domain-sized, e.g. minutes, never
observation-sized).  The (n, d) pair is carried through the fold encoded
as one BIGINT n*K + d (K = 1e9) because DuckDB's list_reduce types its
accumulator as the element type; valid while n < 1e9 per cohort
(documented), and the decode arithmetic is shared text in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_K = 1_000_000_000

_FOLD_LAMBDA = (
    f"(acc, b) -> (acc * ((b div CAST({_K} AS BIGINT))"
    f" - (b % CAST({_K} AS BIGINT))))"
    f" div (b div CAST({_K} AS BIGINT))"
)


def _risk_steps(obs: DataFrame, dur_col: str, death_col: str) -> DataFrame:
    """(t, d, n) per distinct DEATH time: d deaths at t, n at risk
    (duration >= t), exact from one cumulative histogram — the shared
    core of the KM product and the Nelson-Aalen sum."""
    hist = obs.groupBy(F.col(dur_col).alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("c_all"),
        F.sum(death_col).cast("long").alias("d"),
    )
    total = hist.agg(F.sum("c_all").cast("long").alias("n_obs"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    return (
        hist.select(
            "t", "c_all", "d",
            F.sum("c_all").over(w).cast("long").alias("cum_le"),
        )
        .crossJoin(F.broadcast(total))
        .filter(F.col("d") > 0)
        .select(
            "t", "d",
            (F.col("n_obs") - F.col("cum_le") + F.col("c_all"))
            .cast("long").alias("n"),
        )
    )


def km_curve(obs: DataFrame, dur_col: str, death_col: str) -> DataFrame:
    """Kaplan-Meier curve from (duration, is-death) observations: one row
    per distinct death time with (t, n_risk, d, s_ppm).  ``death_col`` is
    0/1 (0 = right-censored).  Risk set n(t) = observations with
    duration >= t, exact from the cumulative histogram."""
    steps = _risk_steps(obs, dur_col, death_col)
    arr = steps.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "n"))).alias("arr")
    )
    rows = arr.select(
        F.col("arr"), F.posexplode("arr").alias("i0", "s")
    ).select("arr", (F.col("i0") + 1).alias("i"), "s.*")
    return rows.select(
        "t", F.col("n").alias("n_risk"), "d",
        F.expr(
            f"aggregate(transform(slice(arr, 1, i),"
            f" x -> CAST(x.n AS BIGINT) * CAST({_K} AS BIGINT) + x.d),"
            f" CAST(1000000 AS BIGINT), {_FOLD_LAMBDA})"
        ).cast("long").alias("s_ppm"),
    )


def KM_CURVE_SQL(obs_sql: str, dur_col: str, death_col: str) -> str:
    """DuckDB oracle: same histogram, risk-set and encoded prefix fold."""
    return f"""
WITH obs AS ({obs_sql}),
hist AS (
  SELECT {dur_col} AS t, CAST(count(*) AS BIGINT) AS c_all,
         CAST(sum({death_col}) AS BIGINT) AS d
  FROM obs GROUP BY 1
),
total AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_obs FROM hist),
steps AS (
  SELECT t, d,
         CAST(n_obs - sum(c_all) OVER (ORDER BY t
              ROWS UNBOUNDED PRECEDING) + c_all AS BIGINT) AS n
  FROM hist CROSS JOIN total
  WHERE d > 0
),
arr AS (
  SELECT list({{'t': t, 'd': d, 'n': n}} ORDER BY t) AS arr FROM steps
),
rows AS (
  SELECT a.arr, unnest(a.arr) AS s, generate_subscripts(a.arr, 1) AS i
  FROM arr a
)
SELECT s.t, s.n AS n_risk, s.d,
       CAST(list_reduce(
         list_prepend(CAST(1000000 AS BIGINT),
           list_transform(arr[1:i],
             x -> CAST(x.n AS BIGINT) * CAST({_K} AS BIGINT) + x.d)),
         (acc, b) -> (acc * ((b // CAST({_K} AS BIGINT))
                      - (b % CAST({_K} AS BIGINT))))
                     // (b // CAST({_K} AS BIGINT))) AS BIGINT) AS s_ppm
FROM rows
"""


def nelson_aalen_curve(obs: DataFrame, dur_col: str,
                       death_col: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard curve — the ADDITIVE estimator
    next to km_curve's product (Aalen 1978; the pair every survival
    report ships): H(t) = sum_{t_i <= t} d_i / n_i over the same
    (t, d, n) risk steps.

    Exactness: each hazard increment is the integer floor
    (d * 10^6) div n and the curve is a plain BIGINT window cumsum —
    no product fold needed, so unlike km_curve this stays a pure
    window over the aggregate-bounded step rows (one row per distinct
    death time), never collecting the step array.

    Output: (t, n_risk, d, h_ppm)."""
    steps = _risk_steps(obs, dur_col, death_col)
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    term = F.expr("(d * CAST(1000000 AS BIGINT)) div n")
    return steps.select(
        "t", F.col("n").alias("n_risk"), "d", term.alias("_term")
    ).select(
        "t", "n_risk", "d",
        F.sum("_term").over(w).cast("long").alias("h_ppm"),
    )


def NA_CURVE_SQL(obs_sql: str, dur_col: str, death_col: str) -> str:
    """DuckDB oracle: same histogram/risk steps, integer hazard cumsum."""
    return f"""
WITH obs AS ({obs_sql}),
hist AS (
  SELECT {dur_col} AS t, CAST(count(*) AS BIGINT) AS c_all,
         CAST(sum({death_col}) AS BIGINT) AS d
  FROM obs GROUP BY 1
),
total AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_obs FROM hist),
steps AS (
  SELECT t, d,
         CAST(n_obs - sum(c_all) OVER (ORDER BY t
              ROWS UNBOUNDED PRECEDING) + c_all AS BIGINT) AS n
  FROM hist CROSS JOIN total
  WHERE d > 0
)
SELECT t, n AS n_risk, d,
       CAST(sum((d * CAST(1000000 AS BIGINT)) // n) OVER (
         ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS h_ppm
FROM steps
"""


def cox_newton_step(obs: DataFrame, dur_col: str, death_col: str,
                    x_col: str) -> DataFrame:
    """One exact Newton-Raphson step of Cox proportional-hazards
    regression at beta = 0 with the Breslow tie convention — the
    standard first iteration of coxph, and at beta = 0 also the score
    (log-rank-style) test statistic for a numeric covariate:

      U(0) = Σ_t [ Sx_deaths(t) - d_t * SxR(t)/nR(t) ]
      I(0) = Σ_t d_t * [ SxxR(t)/nR(t) - (SxR(t)/nR(t))^2 ]
      beta_1 = U / I

    where R(t) is the risk set (duration >= t) and the sums run over
    distinct DEATH times only.

    Exactness: the covariate must be an INTEGER column (the caller
    quantizes); every risk-set sum (n, Sx, Sxx) is an exact BIGINT from
    ONE top-down cumulative histogram; each death time's U and I
    contributions ride identical IEEE divisions and are HALF-UP
    quantized to integer ppm BEFORE summing (the chi2 quantize-then-sum
    rule — engines may sum times in different orders); beta_1 is the
    shared signed floor division.

    Scale: one groupBy(duration) histogram + one ordered window over
    the DISTINCT duration domain (duration-domain-sized, not
    observation-sized) + one global agg.  Output one row:
    (n_obs, n_deaths, u_ppm, i_ppm, beta1_ppm)."""
    hist = obs.groupBy(F.col(dur_col).alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("c_all"),
        F.sum(death_col).cast("long").alias("d"),
        F.sum(x_col).cast("long").alias("sx_all"),
        F.sum(F.col(x_col) * F.col(x_col)).cast("long").alias("sxx_all"),
        F.sum(F.col(death_col) * F.col(x_col)).cast("long")
        .alias("sx_death"),
    )
    total = hist.agg(
        F.sum("c_all").cast("long").alias("n_obs"),
        F.sum("d").cast("long").alias("n_deaths"),
        F.sum("sx_all").cast("long").alias("sx_tot"),
        F.sum("sxx_all").cast("long").alias("sxx_tot"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    cum = hist.select(
        "t", "c_all", "d", "sx_all", "sxx_all", "sx_death",
        F.sum("c_all").over(w).cast("long").alias("cum_n"),
        F.sum("sx_all").over(w).cast("long").alias("cum_sx"),
        F.sum("sxx_all").over(w).cast("long").alias("cum_sxx"),
    ).crossJoin(F.broadcast(total)).filter(F.col("d") > 0).select(
        "d", "sx_death", "n_obs", "n_deaths",
        (F.col("n_obs") - F.col("cum_n") + F.col("c_all"))
        .cast("long").alias("n_r"),
        (F.col("sx_tot") - F.col("cum_sx") + F.col("sx_all"))
        .cast("long").alias("sx_r"),
        (F.col("sxx_tot") - F.col("cum_sxx") + F.col("sxx_all"))
        .cast("long").alias("sxx_r"),
    )
    mean = "(CAST(sx_r AS DOUBLE) / CAST(n_r AS DOUBLE))"
    u_t = (f"CAST(floor((CAST(sx_death AS DOUBLE)"
           f" - CAST(d AS DOUBLE) * {mean}) * 1000000.0 + 0.5) AS BIGINT)")
    i_t = (f"CAST(floor(CAST(d AS DOUBLE)"
           f" * (CAST(sxx_r AS DOUBLE) / CAST(n_r AS DOUBLE)"
           f" - {mean} * {mean}) * 1000000.0 + 0.5) AS BIGINT)")
    agg = cum.groupBy().agg(
        F.max("n_obs").cast("long").alias("n_obs"),
        F.max("n_deaths").cast("long").alias("n_deaths"),
        F.sum(F.expr(u_t)).cast("long").alias("u_ppm"),
        F.sum(F.expr(i_t)).cast("long").alias("i_ppm"),
    )
    return agg.select(
        "n_obs", "n_deaths", "u_ppm", "i_ppm",
        F.expr("CASE WHEN i_ppm = 0 THEN NULL ELSE"
               " CAST(floor(CAST(u_ppm * 1000000 AS DOUBLE)"
               " / CAST(i_ppm AS DOUBLE)) AS BIGINT) END")
        .alias("beta1_ppm"),
    )


def COX_NEWTON_SQL(obs_sql: str, dur_col: str, death_col: str,
                   x_col: str) -> str:
    mean = "(CAST(sx_r AS DOUBLE) / CAST(n_r AS DOUBLE))"
    u_t = (f"CAST(floor((CAST(sx_death AS DOUBLE)"
           f" - CAST(d AS DOUBLE) * {mean}) * 1000000.0 + 0.5) AS BIGINT)")
    i_t = (f"CAST(floor(CAST(d AS DOUBLE)"
           f" * (CAST(sxx_r AS DOUBLE) / CAST(n_r AS DOUBLE)"
           f" - {mean} * {mean}) * 1000000.0 + 0.5) AS BIGINT)")
    return f"""
WITH obs AS ({obs_sql}),
hist AS (
  SELECT {dur_col} AS t, CAST(count(*) AS BIGINT) AS c_all,
         CAST(sum({death_col}) AS BIGINT) AS d,
         CAST(sum({x_col}) AS BIGINT) AS sx_all,
         CAST(sum({x_col} * {x_col}) AS BIGINT) AS sxx_all,
         CAST(sum({death_col} * {x_col}) AS BIGINT) AS sx_death
  FROM obs GROUP BY 1
),
total AS (
  SELECT CAST(sum(c_all) AS BIGINT) AS n_obs,
         CAST(sum(d) AS BIGINT) AS n_deaths,
         CAST(sum(sx_all) AS BIGINT) AS sx_tot,
         CAST(sum(sxx_all) AS BIGINT) AS sxx_tot
  FROM hist
),
cum AS (
  SELECT d, sx_death, n_obs, n_deaths,
         CAST(n_obs - sum(c_all) OVER w + c_all AS BIGINT) AS n_r,
         CAST(sx_tot - sum(sx_all) OVER w + sx_all AS BIGINT) AS sx_r,
         CAST(sxx_tot - sum(sxx_all) OVER w + sxx_all AS BIGINT) AS sxx_r
  FROM hist CROSS JOIN total
  WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)
),
agg AS (
  SELECT CAST(max(n_obs) AS BIGINT) AS n_obs,
         CAST(max(n_deaths) AS BIGINT) AS n_deaths,
         CAST(sum({u_t}) AS BIGINT) AS u_ppm,
         CAST(sum({i_t}) AS BIGINT) AS i_ppm
  FROM cum WHERE d > 0
)
SELECT n_obs, n_deaths, u_ppm, i_ppm,
       CAST(CASE WHEN i_ppm = 0 THEN NULL ELSE
            floor(CAST(u_ppm * 1000000 AS DOUBLE)
                  / CAST(i_ppm AS DOUBLE)) END AS BIGINT) AS beta1_ppm
FROM agg
"""
