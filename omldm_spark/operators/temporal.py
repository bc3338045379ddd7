"""Temporal joins: as-of (backward) join and bounded range join.

Beyond-reference surface: the reference engine joins data and control
streams by key (FlinkLearning.scala connect/keyBy) but has no temporal
join. These are the two classic time-series joins a training-data
pipeline needs (point-in-time feature lookup; windowed context
aggregation), built shuffle-minimal:

* asof_join            union + ONE shuffle on the key + a per-key window
                       scan. No range explosion, no broadcast of either
                       side, no skew beyond per-key cardinality: the
                       classic union-merge as-of plan (same shape the
                       published point-in-time-join implementations use).
* bucketed_range_join  equi-join on (key, coarse time bucket) with the
                       probe side exploded over the <=2 buckets its window
                       spans, then an exact range filter. Turns an O(n*m)
                       theta-join into a balanced hash join with 2x probe
                       amplification — the standard bucketed range-join
                       strategy. AQE covers residual bucket skew.

Cross-engine determinism: the right/build side is deduplicated to one row
per (key, timestamp) via max_by with an explicit tie column, so ASOF ties
cannot pick different rows in different engines; windowed sums use the
quantized-integer envelope (queries.py POINTS_SQL note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """Backward as-of LEFT join: each left row gains the payload of the
    right row with the greatest ``ts_col`` <= left's ``ts_col`` for the
    same key (DuckDB ``ASOF LEFT JOIN`` / pandas ``merge_asof`` semantics,
    allow_exact_matches=True). Left rows with no prior right row keep
    NULL payloads.

    ``right`` is first reduced to one row per (key, ts) — payloads chosen
    by ``max_by(payload, tie_col)`` — making the match deterministic under
    timestamp ties.

    Scale: one groupBy on the build side, one union, ONE shuffle on
    ``on`` for the window. State per key is O(1) during the scan (last
    non-null carry), so a 1000-executor run partitions cleanly by key.
    """
    r = right.groupBy(*on, ts_col).agg(
        *[F.expr(f"max_by({c}, {tie_col})").alias(c) for c in payload_cols]
    )
    left_only = [c for c in left.columns if c not in on and c != ts_col]
    l2 = left.select(
        *on,
        ts_col,
        F.lit(1).alias("_is_left"),
        *left_only,
        *[F.lit(None).cast(r.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r2 = r.select(
        *on,
        ts_col,
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        *payload_cols,
    )
    u = l2.unionByName(r2)
    # right rows sort BEFORE left rows at equal ts (_is_left 0 < 1) ->
    # "at-or-before" semantics; the carry is order-insensitive among
    # equal-ts left rows because they contribute only NULLs.
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_is_left") == 1).drop("_is_left")


def bucketed_range_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    probe_ts: str,
    build_ts: str,
    window: int,
    aggs: list,
) -> DataFrame:
    """For each probe row, aggregate build rows of the same key with
    ``build_ts`` in the half-open window [probe_ts - window, probe_ts).
    Probe rows with no build rows in range are KEPT (left semantics; count
    aggregates see zero rows).

    Plan shape: build rows get ONE bucket key floor(ts/window); each probe
    row explodes over the <=2 buckets its window can span; LEFT equi-join
    on (key, bucket) with the exact range predicate in the join condition;
    groupBy back to one row per probe. No theta-join, no broadcast
    requirement; shuffle keys are (key, bucket) — finer than the raw key,
    which also dilutes per-key skew.

    ``aggs`` are aggregate expressions evaluated over the matched build
    rows (pre-aliased; count(build col) yields 0 for unmatched probes).
    """
    b = build.withColumn(
        "_bkt", F.floor(F.col(build_ts) / F.lit(window)).cast("long")
    )
    p = probe.withColumn(
        "_bkt",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col(probe_ts) - F.lit(window)) / F.lit(window)).cast("long"),
                    F.floor(F.col(probe_ts) / F.lit(window)).cast("long"),
                )
            )
        ),
    )
    cond = (
        (F.col(f"b.{build_ts}") >= F.col(f"p.{probe_ts}") - F.lit(window))
        & (F.col(f"b.{build_ts}") < F.col(f"p.{probe_ts}"))
        & (F.col("p._bkt") == F.col("b._bkt"))
    )
    for k in on:
        cond = cond & (F.col(f"p.{k}") == F.col(f"b.{k}"))
    joined = p.alias("p").join(b.alias("b"), cond, "left")
    probe_out = [F.col(f"p.{c}").alias(c) for c in probe.columns]
    return joined.groupBy(*probe_out).agg(*aggs)
