"""ORR — Online Ridge Regression, exactly computable (SURVEY.md §2.9).

The reference dispatches an ``ORR`` learner by name
(src/main/scala/omldm/utils/parsers/requestStream/PipelineMap.scala:68); the
implementation lives in the external OnlineMachineLearning library. Ridge has
a closed form, so the Spark-native plan is pure aggregation — no Python in
the hot path, no iteration:

    A = (1/n) Σ x̃ x̃ᵀ + λI      b = (1/n) Σ x̃ y        w = A⁻¹ b

with x̃ = [x, 1] (bias absorbed). The Σ terms are a single ``agg`` of
``avg(x_i * x_j)`` products — map-side combinable, one shuffle of one tiny
row, whole-stage codegen end to end. This is the textbook treeAggregate
shape; at 100 TB it is scan-bound, which is optimal.

Oracle parity: DuckDB and Spark sum floats in different orders, so raw
Gram entries differ at ~1e-12 relative. We therefore ROUND the Gram entries
(both sides, same digits) and then run the IDENTICAL Cramer-solve SQL text
in both engines — IEEE arithmetic on identical inputs with an identical
expression tree is bit-identical, so the final weights hash-match exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_aggregate(
    points: DataFrame, feature_cols: list[str], target_col: str, round_digits: int | None = None
) -> DataFrame:
    """One-row DataFrame of averaged Gram products over explicit columns.

    Output columns: n, m_{i}_{j} = avg(x_i*x_j) for i<=j (bias = last
    pseudo-feature, constant 1), v_{i} = avg(x_i*y), v_b = avg(y).
    """
    cols = [F.col(c) for c in feature_cols]
    d = len(cols)

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i in range(d):
        for j in range(i, d):
            aggs.append(rnd(F.avg(cols[i] * cols[j])).alias(f"m_{i}_{j}"))
        aggs.append(rnd(F.avg(cols[i])).alias(f"m_{i}_b"))  # x_i * bias
        aggs.append(rnd(F.avg(cols[i] * F.col(target_col))).alias(f"v_{i}"))
    aggs.append(rnd(F.avg(F.col(target_col))).alias("v_b"))
    return points.agg(*aggs)


def gram_sql(
    inner_sql: str, feature_exprs: list[str], target_expr: str, round_digits: int
) -> str:
    """DuckDB oracle equivalent of :func:`gram_aggregate`."""
    d = len(feature_exprs)
    parts = ["CAST(count(*) AS BIGINT) AS n"]
    for i in range(d):
        xi = feature_exprs[i]
        for j in range(i, d):
            parts.append(
                f"round(avg(({xi}) * ({feature_exprs[j]})), {round_digits}) AS m_{i}_{j}"
            )
        parts.append(f"round(avg({xi}), {round_digits}) AS m_{i}_b")
        parts.append(
            f"round(avg(({xi}) * ({target_expr})), {round_digits}) AS v_{i}"
        )
    parts.append(f"round(avg({target_expr}), {round_digits}) AS v_b")
    return f"SELECT {', '.join(parts)} FROM ({inner_sql})"


def solve_ridge_np(gram_row: dict, d: int, lam: float) -> np.ndarray:
    """General-d driver-side solve from a collected gram row (tiny)."""
    A = np.zeros((d + 1, d + 1))
    b = np.zeros(d + 1)
    for i in range(d):
        for j in range(i, d):
            A[i, j] = A[j, i] = gram_row[f"m_{i}_{j}"]
        A[i, d] = A[d, i] = gram_row[f"m_{i}_b"]
        b[i] = gram_row[f"v_{i}"]
    A[d, d] = 1.0
    b[d] = gram_row["v_b"]
    A += lam * np.eye(d + 1)
    return np.linalg.solve(A, b)


# Shared Cramer solve for d=2 (+ bias): identical text runs in Spark SQL and
# DuckDB so the arithmetic tree — hence the IEEE result — is identical.
# Expects a relation {g} with columns m_0_0, m_0_1, m_0_b, m_1_1, m_1_b,
# v_0, v_1, v_b, n; lam is substituted literally.
CRAMER_2D_SQL = """
SELECT
  n,
  round((v_0 * (dd * ff - ee * ee) - bb * (v_1 * ff - ee * v_b) + cc * (v_1 * ee - dd * v_b)) / det, 6) AS w0,
  round((aa * (v_1 * ff - v_b * ee) - v_0 * (bb * ff - cc * ee) + cc * (bb * v_b - v_1 * cc)) / det, 6) AS w1,
  round((aa * (dd * v_b - ee * v_1) - bb * (bb * v_b - cc * v_1) + v_0 * (bb * ee - cc * dd)) / det, 6) AS bias
FROM (
  SELECT n, v_0, v_1, v_b,
         m_0_0 + {lam} AS aa, m_0_1 AS bb, m_0_b AS cc,
         m_1_1 + {lam} AS dd, m_1_b AS ee, 1.0 + {lam} AS ff,
         (m_0_0 + {lam}) * ((m_1_1 + {lam}) * (1.0 + {lam}) - m_1_b * m_1_b)
         - m_0_1 * (m_0_1 * (1.0 + {lam}) - m_1_b * m_0_b)
         + m_0_b * (m_0_1 * m_1_b - (m_1_1 + {lam}) * m_0_b) AS det
  FROM {g}
)
"""


def predict_expr(w_cols: list[str], x_cols: list[str], bias_col: str) -> F.Column:
    """w·x + b as a Catalyst expression (JVM-side scoring)."""
    pred = F.col(bias_col)
    for w, x in zip(w_cols, x_cols):
        pred = pred + F.col(w) * F.col(x)
    return pred
