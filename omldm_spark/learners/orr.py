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


# ---------------------------------------------------------------------------
# The registered ORR learner (PipelineMap.scala:68 dispatches "ORR" by name)
# ---------------------------------------------------------------------------
#
# State = the sufficient statistics, as EXACT INTEGERS: sxx (upper triangle
# of Σ q̃q̃ᵀ with q = round(x*Q)), sxy (Σ q̃·qy), n — plus the solved weights
# w. Integer sums are order-independent and exactly mergeable across any
# partitioning/batching, so the streaming loop's ORR is deterministic and a
# DuckDB oracle reproduces it bit-for-bit (same envelope note as
# queries.py POINTS_SQL: Spark aggregates DECIMAL(38,0), DuckDB HUGEINT,
# driver accumulates Python ints — nothing overflows).
#
# The trainer dispatches on ``closed_form`` to fit_dataframe(): ONE Catalyst
# aggregation per batch (map-side combinable, whole-stage codegen — the
# treeAggregate normal-equations shape), a tiny driver solve, one more
# aggregation for the batch SSE. No Python in the per-row path.

GRAM_QUANT = 1_000_000
DEFAULT_LAMBDA = 0.1

from .base import Learner, register  # noqa: E402


def _tri(d: int) -> list[tuple[int, int]]:
    """Upper-triangle index pairs for the (d+1)-dim augmented [x, 1] vector;
    bias products reduce to plain sums so only x-x pairs are stored."""
    return [(i, j) for i in range(d) for j in range(i, d)]


@register
class ORRLearner(Learner):
    name = "ORR"
    is_classifier = False
    closed_form = True  # trainer.fit routes to fit_dataframe

    def init_state(self, dim: int, hyper: dict) -> dict:
        d = dim
        return {
            "n": 0,
            "cum_loss": 0.0,
            "sxx": [0] * len(_tri(d)),   # Σ q_i*q_j, exact ints
            "sx": [0] * d,               # Σ q_i        (bias cross terms)
            "sxy": [0] * d,              # Σ q_i*qy
            "sy": 0,                     # Σ qy
            "w": np.zeros(d + 1),        # solved [w_0..w_{d-1}, bias]
        }

    # -- numpy path (tests / non-DataFrame callers) -------------------------

    def partial_fit(self, X: np.ndarray, y: np.ndarray, state: dict, hyper: dict) -> dict:
        quant = int(float(hyper.get("quant", GRAM_QUANT)))
        qX = np.rint(np.asarray(X, dtype=float) * quant).astype(object)
        qy = np.rint(np.asarray(y, dtype=float) * quant).astype(object)
        d = qX.shape[1]
        sxx = [int(v) for v in np.asarray(state["sxx"]).ravel()]
        for t, (i, j) in enumerate(_tri(d)):
            sxx[t] += int((qX[:, i] * qX[:, j]).sum())
        state = dict(state)
        state["sxx"] = sxx
        state["sx"] = [int(a) + int(b) for a, b in zip(
            np.asarray(state["sx"]).ravel(), qX.sum(axis=0))]
        state["sxy"] = [int(a) + int((qX[:, i] * qy).sum())
                        for i, a in enumerate(np.asarray(state["sxy"]).ravel())]
        state["sy"] = int(state["sy"]) + int(qy.sum())
        state["n"] = int(state["n"]) + len(qX)
        state["w"] = self._solve(state, d, hyper)
        err = self.predict(X, state) - np.asarray(y, dtype=float)
        state["cum_loss"] = float(state["cum_loss"]) + float((err * err).sum())
        return state

    def merge(self, states: list[dict]) -> dict:
        """Sufficient statistics SUM exactly — no weighted averaging."""
        d = len(np.asarray(states[0]["sx"]).ravel())
        out = {
            "n": sum(int(s["n"]) for s in states),
            "cum_loss": sum(float(s["cum_loss"]) for s in states),
            "sxx": [sum(int(np.asarray(s["sxx"]).ravel()[t]) for s in states)
                    for t in range(len(_tri(d)))],
            "sx": [sum(int(np.asarray(s["sx"]).ravel()[i]) for s in states)
                   for i in range(d)],
            "sxy": [sum(int(np.asarray(s["sxy"]).ravel()[i]) for s in states)
                    for i in range(d)],
            "sy": sum(int(s["sy"]) for s in states),
        }
        out["w"] = self._solve(out, d, {})
        return out

    def _gram_doubles(self, state: dict, d: int, quant: int) -> dict:
        """Integer sums -> averaged double Gram entries. Operation sequence
        mirrors the oracle SQL: each int -> double FIRST, then one divide."""
        n = int(state["n"])
        nd = float(n)
        q = float(quant)
        g: dict = {"n": n}
        for t, (i, j) in enumerate(_tri(d)):
            g[f"m_{i}_{j}"] = float(int(np.asarray(state["sxx"]).ravel()[t])) / (nd * q * q)
        for i in range(d):
            g[f"m_{i}_b"] = float(int(np.asarray(state["sx"]).ravel()[i])) / (nd * q)
            g[f"v_{i}"] = float(int(np.asarray(state["sxy"]).ravel()[i])) / (nd * q * q)
        g["v_b"] = float(int(state["sy"])) / (nd * q)
        return g

    def _solve(self, state: dict, d: int, hyper: dict,
               spark=None) -> np.ndarray:
        if int(state["n"]) == 0:
            return np.zeros(d + 1)
        lam = float(hyper.get("lambda", DEFAULT_LAMBDA))
        quant = int(float(hyper.get("quant", GRAM_QUANT)))
        g = self._gram_doubles(state, d, quant)
        if d == 2 and spark is not None:
            # run the SHARED Cramer text so the weights are bit-identical
            # to the DuckDB oracle (round 6 happens inside the SQL)
            import uuid

            view = f"omldm_orr_gram_{uuid.uuid4().hex[:8]}"
            spark.createDataFrame([g]).createOrReplaceTempView(view)
            w = spark.sql(CRAMER_2D_SQL.format(g=view, lam=lam)).first()
            spark.catalog.dropTempView(view)
            return np.array([w["w0"], w["w1"], w["bias"]])
        return solve_ridge_np(g, d, lam)

    def predict(self, X: np.ndarray, state: dict) -> np.ndarray:
        w = np.asarray(state["w"], dtype=float)
        return np.asarray(X, dtype=float) @ w[:-1] + w[-1]

    def loss(self, X: np.ndarray, y: np.ndarray, state: dict) -> float:
        err = self.predict(X, state) - np.asarray(y, dtype=float)
        return float(np.mean(err * err))

    # -- Catalyst path (the trainer's closed_form dispatch) -----------------

    def fit_dataframe(
        self,
        points: DataFrame,
        dim: int,
        hyper: dict,
        *,
        features_col: str = "features",
        label_col: str = "label",
        init_state: dict | None = None,
    ) -> dict:
        """One exact-integer Gram aggregation over the batch + driver solve +
        one SSE aggregation (cum_loss, computed with the POST-solve weights —
        the closed-form analogue of prequential loss)."""
        quant = int(float(hyper.get("quant", GRAM_QUANT)))
        state = init_state or self.init_state(dim, hyper)
        d = dim

        def el(i):
            return F.element_at(F.col(features_col), i + 1)

        def q(c):
            return F.round(c * quant, 0).cast("decimal(38,0)")

        aggs = [F.count(F.lit(1)).cast("long").alias("n")]
        for t, (i, j) in enumerate(_tri(d)):
            aggs.append(F.sum(q(el(i)) * q(el(j))).alias(f"sxx_{t}"))
        for i in range(d):
            aggs.append(F.sum(q(el(i))).alias(f"sx_{i}"))
            aggs.append(F.sum(q(el(i)) * q(F.col(label_col))).alias(f"sxy_{i}"))
        aggs.append(F.sum(q(F.col(label_col))).alias("sy"))
        row = points.agg(*aggs).first()
        if int(row["n"]) == 0:
            return state

        state = dict(state)
        state["sxx"] = [int(np.asarray(state["sxx"]).ravel()[t]) + int(row[f"sxx_{t}"])
                        for t in range(len(_tri(d)))]
        state["sx"] = [int(np.asarray(state["sx"]).ravel()[i]) + int(row[f"sx_{i}"])
                       for i in range(d)]
        state["sxy"] = [int(np.asarray(state["sxy"]).ravel()[i]) + int(row[f"sxy_{i}"])
                        for i in range(d)]
        state["sy"] = int(state["sy"]) + int(row["sy"])
        state["n"] = int(state["n"]) + int(row["n"])
        state["w"] = self._solve(state, d, hyper, spark=points.sparkSession)

        w = state["w"]
        pred = F.lit(float(w[-1]))
        for i in range(d):
            pred = pred + F.lit(float(w[i])) * el(i)
        err = F.col(label_col) - pred
        sse = points.agg(F.sum(err * err).alias("sse")).first()["sse"]
        state["cum_loss"] = float(state["cum_loss"]) + float(sse or 0.0)
        return state


def cramer_sql(d: int) -> str:
    """Generate the shared Cramer solve text for general ``d`` (+ bias):
    one SELECT over a relation {g} (gram_aggregate column layout), solving
    (A + lam*I) w = b by Leibniz-expansion determinants. The SAME generated
    text runs in Spark SQL and DuckDB, so the floating-point operation tree
    — hence the IEEE result — is identical on both engines (the d=2 case
    is the hand-written CRAMER_2D_SQL above; this generalizes the recipe;
    reference ORR solves arbitrary d, mlAPI ORR.scala).

    (d+1)! terms per determinant — intended for the small-d closed-form
    regime (d <= 4); beyond that use solve_ridge_np driver-side.
    """
    from itertools import permutations

    m = d + 1

    def entry(i: int, j: int) -> str:
        # matrix text with ridge lam added on the diagonal; {lam} is a
        # substitution slot like in CRAMER_2D_SQL
        if i == d and j == d:
            return "(1.0 + {lam})"
        if i == d:
            return f"m_{j}_b"
        if j == d:
            return f"m_{i}_b"
        lo, hi = min(i, j), max(i, j)
        base = f"m_{lo}_{hi}"
        return f"({base} + {{lam}})" if i == j else base

    def rhs(i: int) -> str:
        return "v_b" if i == d else f"v_{i}"

    def det_text(col_replaced: int | None) -> str:
        terms = []
        for perm in permutations(range(m)):
            sign = 1
            p = list(perm)
            # permutation parity by counting inversions
            inv = sum(
                1 for a in range(m) for b in range(a + 1, m) if p[a] > p[b]
            )
            sign = -1 if inv % 2 else 1
            factors = [
                rhs(r) if perm[r] == col_replaced else entry(r, perm[r])
                for r in range(m)
            ]
            terms.append(("- " if sign < 0 else "+ ") + " * ".join(factors))
        return "(" + " ".join(terms).lstrip("+ ") + ")"

    det = det_text(None)
    outs = ["n"]
    for k in range(m):
        name = "bias" if k == d else f"w{k}"
        outs.append(f"round({det_text(k)} / {det}, 6) AS {name}")
    return "SELECT " + ", ".join(outs) + " FROM {g}"
