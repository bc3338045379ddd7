"""Skyline (Pareto-frontier) operator over per-user engagement.

The classic dominance query (Börzsönyi, Kossmann, Stocker — ICDE 2001
"The Skyline Operator"): return the tuples no other tuple dominates,
here over (maximize purchase value, minimize error count) per user —
the "best customers net of friction" frontier, and the 2-d shape every
multi-objective data-selection pass reduces to (quality vs toxicity,
coverage vs cost, ...).

Algorithm — the sort-free relational form of the 2-d sweep: after the
fact-scale per-user aggregate, collapse to the DISTINCT value domain
(value is cents-quantized, so this is the ks_two_sample domain-bounded
discipline), take per-value min error, one ordered window over that
domain frame computes min error among STRICTLY higher values, and a
keyed join back flags dominance:

    dominated(u)  ⟺  min_err(value' > value_u) <= err_u      (strict >)
                   ∨  min_err(value' = value_u) <  err_u      (tie rule)

— exactly the Börzsönyi dominance definition (greater-or-equal in all
dimensions, strictly greater in at least one) split by the value
coordinate.  Everything is BIGINT; no floats anywhere.

Scale: one fact scan -> user-keyed aggregate -> value-domain aggregate
(bounded by the distinct cents domain) -> window over the DOMAIN frame
-> one keyed join back.  The window never sees fact- or user-scale
rows, so the plan survives any user count; only the value domain's
cardinality prices the window, and it is range-bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_users(events: DataFrame) -> DataFrame:
    """(user_id, value_c, n_errors) for the Pareto-optimal users:
    maximize total purchase cents, minimize error-event count.  Users
    with no purchases carry value 0; ties on both axes keep ALL
    co-located optima (dominance is strict-in-one)."""
    return skyline_from_user_stats(skyline_user_stats(events))


def skyline_user_stats(events: DataFrame) -> DataFrame:
    """(user_id, value_c, n_errors): the skyline's ADDITIVE sufficient
    statistic — per-user sums merge by plain addition, so this frame is
    the carried state of the streaming twin (one row per user)."""
    return events.groupBy("user_id").agg(
        F.sum(F.expr(
            "CASE WHEN event_type = 'purchase'"
            " THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END"
        )).cast("long").alias("value_c"),
        F.sum(F.expr("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"))
        .cast("long").alias("n_errors"),
    )


def skyline_from_user_stats(per_user: DataFrame) -> DataFrame:
    """The dominance sweep from a (user_id, value_c, n_errors) frame."""
    dom = per_user.groupBy("value_c").agg(
        F.min("n_errors").cast("long").alias("vmin_err"))
    wh = (
        Window.orderBy(F.desc("value_c"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dom = dom.select(
        "value_c", "vmin_err",
        F.min("vmin_err").over(wh).alias("higher_min"),
    )
    return (
        per_user.join(dom, "value_c")
        .filter(
            (F.col("higher_min").isNull()
             | (F.col("higher_min") > F.col("n_errors")))
            & (F.col("vmin_err") >= F.col("n_errors"))
        )
        .select("user_id", "value_c", "n_errors")
    )


def SKYLINE_SQL(table: str = "events") -> str:
    return f"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100, 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS value_c,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM {table} GROUP BY 1
),
dom AS (
  SELECT value_c, CAST(min(n_errors) AS BIGINT) AS vmin_err
  FROM per_user GROUP BY 1
),
swept AS (
  SELECT value_c, vmin_err,
         min(vmin_err) OVER (ORDER BY value_c DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS higher_min
  FROM dom
)
SELECT p.user_id, p.value_c, p.n_errors
FROM per_user p JOIN swept s USING (value_c)
WHERE (s.higher_min IS NULL OR s.higher_min > p.n_errors)
  AND s.vmin_err >= p.n_errors
"""
