"""Vector ops over ARRAY<DOUBLE> columns — all Catalyst expressions.

The reference's Breeze vectors (src/main/scala/omldm/utils/CommonUtils.scala:
22-23) become plain array columns; dot products and norms stay JVM-side via
higher-order functions (zip_with/aggregate), so linear-model *scoring* never
leaves whole-stage codegen. Training kernels (numpy) live in learners/.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i * b_i (arrays of equal length)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_const(a: Column | str, weights: list[float]) -> Column:
    """Σ a_i * w_i against a broadcast Python weight list (model scoring)."""
    return F.aggregate(
        F.zip_with(_c(a), F.array(*[F.lit(float(w)) for w in weights]), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is 0."""
    num = dot(a, b)
    den = norm2(a) * norm2(b)
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def linear_predict(features: Column | str, weights: list[float], bias: float) -> Column:
    return dot_const(features, weights) + F.lit(float(bias))


def to_double_array(col: Column | str) -> Column:
    """Cast ARRAY<FLOAT> (e.g. embeddings) to ARRAY<DOUBLE> for stable math."""
    return F.transform(_c(col), lambda x: x.cast("double"))
