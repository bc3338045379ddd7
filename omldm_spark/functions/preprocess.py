"""Preprocessors: StandardScaler, MinMaxScaler, PolynomialFeatures.

Reference whitelist (src/main/scala/omldm/utils/parsers/requestStream/
PipelineMap.scala:67): pipelines may chain PolynomialFeatures,
StandardScaler, MinMaxScaler before the learner (external implementations in
the mlAPI library; semantics below follow the standard published
definitions, matching pyspark.ml.feature counterparts).

Spark-first shape: fit = ONE aggregation producing a one-row stats frame;
transform = broadcast that row and apply pure column arithmetic — zero
Python, zero extra shuffles, whole-stage codegen. In streaming these stats
become running moments in the training-loop state (SURVEY.md §7 step 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def standard_scaler_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column mean and population std — one pass, one tiny row.

    E[x] and E[x^2] are the sufficient statistics; std = sqrt(E[x^2]-E[x]^2)
    (population variant, matching pyspark.ml StandardScaler withStd default
    up to the n/(n-1) factor which callers can apply).
    """
    aggs = []
    for c in cols:
        aggs.append(F.avg(F.col(c)).alias(f"mean_{c}"))
        aggs.append(
            F.sqrt(F.avg(F.col(c) * F.col(c)) - F.avg(F.col(c)) * F.avg(F.col(c)))
            .alias(f"std_{c}")
        )
    return df.agg(*aggs)


def standard_scale(df: DataFrame, cols: list[str], stats: DataFrame) -> DataFrame:
    """z = (x - mean)/std via a broadcast one-row join."""
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        out = out.withColumn(
            f"{c}_scaled",
            (F.col(c) - F.col(f"mean_{c}")) / F.col(f"std_{c}"),
        )
    return out.drop(*[f"mean_{c}" for c in cols], *[f"std_{c}" for c in cols])


def minmax_scaler_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c)).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"max_{c}"))
    return df.agg(*aggs)


def minmax_scale(df: DataFrame, cols: list[str], stats: DataFrame) -> DataFrame:
    """x' = (x - min)/(max - min); constant columns map to 0.5 (the
    pyspark.ml MinMaxScaler convention for max == min)."""
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        rng = F.col(f"max_{c}") - F.col(f"min_{c}")
        out = out.withColumn(
            f"{c}_scaled",
            F.when(rng > 0, (F.col(c) - F.col(f"min_{c}")) / rng).otherwise(0.5),
        )
    return out.drop(*[f"min_{c}" for c in cols], *[f"max_{c}" for c in cols])


def polynomial_features(df: DataFrame, cols: list[str], degree: int = 2) -> DataFrame:
    """Degree-2 expansion: originals + squares + pairwise products, flat
    columns (x0, x1 -> x0, x1, x0_x0, x0_x1, x1_x1) — the column order of
    pyspark.ml PolynomialExpansion restricted to degree 2."""
    if degree != 2:
        raise NotImplementedError("degree 2 only (reference default)")
    out = df
    for i, a in enumerate(cols):
        for b in cols[i:]:
            out = out.withColumn(f"{a}_{b}", F.col(a) * F.col(b))
    return out
