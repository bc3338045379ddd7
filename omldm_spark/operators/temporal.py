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


# ---------------------------------------------------------------------------
# Ordered-funnel analysis
# ---------------------------------------------------------------------------

def funnel_counts(events: DataFrame, stages: list[str],
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Strictly-ordered funnel: a user converts at stage i when an event of
    ``stages[i]`` occurs STRICTLY AFTER their stage-(i-1) conversion time
    (first-touch semantics: conversion time = earliest qualifying event).
    The classic product-analytics shape, and the same sequential-pattern
    primitive curriculum/replay pipelines use to find "A then B then C"
    documents in event logs.

    Output: (stage, stage_idx, users) — users still converting at each
    stage; monotonically non-increasing by construction.

    Scale shape: conversion times chain through per-user WINDOW aggregates
    (no orderBy in the spec -> no sort, just partition-local min), so all
    len(stages) passes reuse ONE user-keyed exchange; the funnel rollup is
    a tiny unpivot + count. No joins, no correlated subquery, no per-stage
    re-shuffle — the decorrelated plan a 100 TB event log needs.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    w = Window.partitionBy(user_col)
    cur = events.select(user_col, type_col, ts_col)
    for i, s in enumerate(stages):
        prev_ok = F.lit(True) if i == 0 else F.col(f"_t{i - 1}").isNotNull()
        cond = (F.col(type_col) == s) & prev_ok
        if i > 0:
            cond = cond & (F.col(ts_col) > F.col(f"_t{i - 1}"))
        cur = cur.withColumn(
            f"_t{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
    per_user = cur.groupBy(user_col).agg(
        *[F.max(f"_t{i}").alias(f"_t{i}") for i in range(len(stages))]
    )
    stage_flags = F.array(*[
        F.struct(
            F.lit(s).alias("stage"),
            F.lit(i).cast("long").alias("stage_idx"),
            F.col(f"_t{i}").isNotNull().alias("hit"),
        )
        for i, s in enumerate(stages)
    ])
    return (
        per_user.select(F.explode(stage_flags).alias("f"))
        .select("f.stage", "f.stage_idx", "f.hit")
        .groupBy("stage", "stage_idx")
        .agg(F.sum(F.col("hit").cast("long")).cast("long").alias("users"))
    )


def FUNNEL_SQL(stages: list[str], table: str = "events",
               user_col: str = "user_id", type_col: str = "event_type",
               ts_col: str = "ts") -> str:
    ctes = [
        f"w0 AS (SELECT {user_col}, {type_col}, {ts_col}, "
        f"min(CASE WHEN {type_col} = '{stages[0]}' THEN {ts_col} END) "
        f"OVER (PARTITION BY {user_col}) AS _t0 FROM {table})"
    ]
    for i in range(1, len(stages)):
        ctes.append(
            f"w{i} AS (SELECT *, "
            f"min(CASE WHEN {type_col} = '{stages[i]}' AND _t{i - 1} IS NOT "
            f"NULL AND {ts_col} > _t{i - 1} THEN {ts_col} END) "
            f"OVER (PARTITION BY {user_col}) AS _t{i} FROM w{i - 1})"
        )
    last = f"w{len(stages) - 1}"
    per_user = (
        f"per_user AS (SELECT {user_col}, "
        + ", ".join(f"max(_t{i}) AS _t{i}" for i in range(len(stages)))
        + f" FROM {last} GROUP BY {user_col})"
    )
    selects = "\nUNION ALL ".join(
        f"SELECT '{s}' AS stage, CAST({i} AS BIGINT) AS stage_idx, "
        f"CAST(count(CASE WHEN _t{i} IS NOT NULL THEN 1 END) AS BIGINT) "
        f"AS users FROM per_user"
        for i, s in enumerate(stages)
    )
    return "WITH " + ",\n".join(ctes + [per_user]) + "\n" + selects


def scd2_intervals(events: DataFrame, key: str = "user_id",
                   state: str = "event_type", ts_s: str = "ts_s",
                   tiebreak: str = "event_id") -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change log: collapse
    each key's event stream to the runs of distinct consecutive ``state``
    values and emit one versioned validity interval per run —
    (key, state, valid_from_s, valid_to_s NULL-while-current, version,
    is_current).

    The warehouse upsert pattern a 100 TB pipeline runs nightly: the
    change log is the only fact-scale input and it shuffles ONCE on the
    key — the change filter (lag), version numbers (row_number) and
    interval close (lead) are three frames over the SAME
    (key x order) window spec, so Catalyst plans a single Exchange +
    Sort and runs all of them in it (audited in tools/plan_audit.py).

    Exactness: interval bounds are integer epoch seconds; ordering ties
    break on the unique ``tiebreak`` column (synthetic events can share a
    timestamp; see tests). A run's valid_to equals the NEXT run's
    valid_from — adjacency is pinned by tests/test_temporal.py."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts_s, tiebreak)
    changes = (
        events.withColumn("_prev", F.lag(state).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(state)))
    )
    wc = Window.partitionBy(key).orderBy(ts_s, tiebreak)
    return (
        changes.withColumn("version", F.row_number().over(wc))
        .withColumn("valid_to_s", F.lead(ts_s).over(wc))
        .select(
            F.col(key),
            F.col(state).alias("state"),
            F.col(ts_s).cast("long").alias("valid_from_s"),
            F.col("valid_to_s").cast("long").alias("valid_to_s"),
            F.col("version").cast("int").alias("version"),
            F.col("valid_to_s").isNull().alias("is_current"),
        )
    )


def SCD2_SQL(table: str = "events", key: str = "user_id",
             state: str = "event_type") -> str:
    return f"""
WITH ev AS (
  SELECT {key}, {state}, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id
  FROM {table}
),
changes AS (
  SELECT * FROM (
    SELECT {key}, {state}, ts_s, event_id,
           lag({state}) OVER (PARTITION BY {key} ORDER BY ts_s, event_id)
             AS prev_state
    FROM ev
  ) WHERE prev_state IS NULL OR prev_state <> {state}
)
SELECT {key}, {state} AS state,
       CAST(ts_s AS BIGINT) AS valid_from_s,
       CAST(lead(ts_s) OVER w AS BIGINT) AS valid_to_s,
       CAST(row_number() OVER w AS INT) AS version,
       (lead(ts_s) OVER w IS NULL) AS is_current
FROM changes
WINDOW w AS (PARTITION BY {key} ORDER BY ts_s, event_id)
"""


def cdc_apply(snapshot: DataFrame, changes: DataFrame, key: str,
              val_cols: list[str], op_col: str = "op",
              seq_col: str = "seq") -> DataFrame:
    """MERGE-style CDC apply: fold a change log (upsert/delete ops with a
    monotone sequence) into a keyed snapshot — the nightly Delta/Iceberg
    MERGE INTO, as pure DataFrame ops.  Last-writer-wins per key by
    (seq, op) with upserts replacing the row and deletes removing it;
    keys untouched by the log pass through.

    Scale: ONE window over the change log keyed by ``key`` picks each
    key's final op (the log is the small side at 100 TB — a day of
    changes vs the full snapshot), then one keyed outer join applies it;
    the snapshot is never shuffled twice.  Deterministic: ties on seq
    break on op ('delete' < 'upsert' lexically, pinned by test)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc(),
                                        F.col(op_col).desc())
    last = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key, op_col, *val_cols)
    )
    return cdc_apply_compacted(snapshot, last, key, val_cols, op_col)


def cdc_apply_compacted(snapshot: DataFrame, last: DataFrame, key: str,
                        val_cols: list[str],
                        op_col: str = "op") -> DataFrame:
    """Apply an already-compacted change set (exactly one final op per
    key — e.g. the state of a streaming last-writer aggregation, or a
    compacted Kafka topic) to a keyed snapshot.  This is the second half
    of :func:`cdc_apply`; splitting it out lets the compaction run in a
    different engine pass (streaming keyed state) while the MERGE-shaped
    outer join stays a single batch shuffle of the snapshot."""
    joined = snapshot.alias("s").join(
        last.alias("c"), on=key, how="full_outer"
    )
    keep = joined.filter(
        F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") == "upsert")
    )
    return keep.select(
        F.col(key),
        *[
            F.when(F.col(f"c.{op_col}") == "upsert", F.col(f"c.{v}"))
             .otherwise(F.col(f"s.{v}")).alias(v)
            for v in val_cols
        ],
    )


def CDC_APPLY_SQL(snapshot_sql: str, changes_sql: str, key: str,
                  val_cols: list[str]) -> str:
    vals = ", ".join(val_cols)
    sel = ", ".join(
        f"CASE WHEN c.op = 'upsert' THEN c.{v} ELSE s.{v} END AS {v}"
        for v in val_cols
    )
    return f"""
WITH snap AS ({snapshot_sql}),
chg AS ({changes_sql}),
last AS (
  SELECT {key}, op, {vals} FROM (
    SELECT *, row_number() OVER (PARTITION BY {key}
                                 ORDER BY seq DESC, op DESC) AS rn
    FROM chg
  ) WHERE rn = 1
)
SELECT coalesce(s.{key}, c.{key}) AS {key}, {sel}
FROM snap s FULL OUTER JOIN last c ON s.{key} = c.{key}
WHERE c.op IS NULL OR c.op = 'upsert'
"""


# ---------------------------------------------------------------------------
# Latest-per-key compaction (CDC/log-compaction primitive)
# ---------------------------------------------------------------------------

def latest_per_key(df: DataFrame, key_cols: list, order_cols: list):
    """Keep the most recent row per key — Kafka log compaction / CDC
    snapshot semantics as a batch operator.  ``order_cols`` must be a
    TOTAL order within each key (pass a unique id last) or the winner is
    partition-dependent.

    ONE keyed exchange: the row_number window is the only shuffle, and at
    scale it is the same plan Spark picks for max_by when every column is
    needed.  Filter-to-rank-1 prunes before anything downstream.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() if isinstance(c, str) else c for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def LATEST_PER_KEY_SQL(select_sql: str, key_cols: list,
                       order_desc_cols: list) -> str:
    keys = ", ".join(key_cols)
    order = ", ".join(f"{c} DESC" for c in order_desc_cols)
    return f"""
SELECT * EXCLUDE (_rn) FROM (
  SELECT *, row_number() OVER (PARTITION BY {keys} ORDER BY {order}) AS _rn
  FROM ({select_sql})
) WHERE _rn = 1
"""


# ---------------------------------------------------------------------------
# Incremental aggregate-view maintenance (algebraic partial-merge)
# ---------------------------------------------------------------------------

def incremental_agg_merge(state: DataFrame, delta: DataFrame,
                          key_cols: list) -> DataFrame:
    """Fold a new batch of PARTIAL aggregates into a materialized
    aggregate view: union + one keyed groupBy summing every non-key
    column — valid for any algebraic aggregate stored as mergeable
    partials (sum, count; min/max via the same shape with max()).

    This is the maintenance loop of a 100 TB rollup table: the daily job
    aggregates ONLY the new partition (|delta| rows) and merges it with
    the |keys|-sized state — never re-reading the history.  The merge
    shuffle is keyed by the view key and both sides are already
    aggregate-sized.  Correctness is the algebraic-merge identity:
    merge(agg(old), agg(new)) == agg(old UNION new), which the contract
    oracle asserts by recomputing from scratch.
    """
    val_cols = [c for c in state.columns if c not in key_cols]
    assert val_cols == [c for c in delta.columns if c not in key_cols]
    return (
        state.unionByName(delta)
        .groupBy(*key_cols)
        .agg(*[F.sum(c).cast("long").alias(c) for c in val_cols])
    )


# ---------------------------------------------------------------------------
# Point-in-time (feature-store) join
# ---------------------------------------------------------------------------

def pit_features(spine: DataFrame, updates: DataFrame, key: str,
                 ts_col: str, seq_col: str, ftype_col: str, val_col: str,
                 types: list[str]) -> DataFrame:
    """Feature-store point-in-time join: for every spine row, the latest
    value of EACH feature type with update time <= spine time — training-
    set assembly without label leakage (a feature written after the
    prediction moment must be invisible).

    Not k as-of joins: spine and updates UNION into one relation and a
    single per-key window carries one running ``last(..., ignorenulls)``
    per feature type; spine rows read the running values at their
    position.  ONE key-hash exchange + ONE in-partition sort TOTAL,
    independent of the number of features — the k-join formulation costs
    k shuffles of the spine.  Ties (update ts == spine ts) include the
    update: updates sort before spine rows at equal ts via the kind flag.
    Output: spine columns + one BIGINT feature column per type (null =
    no update yet)."""
    other = [c for c in spine.columns if c not in (key, ts_col)]
    u = updates.select(
        F.col(key), F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_kind"), F.col(seq_col).alias("_seq"),
        F.col(ftype_col).alias("_ftype"), F.col(val_col).alias("_val"),
        *[F.lit(None).cast(spine.schema[c].dataType).alias(c)
          for c in other],
    )
    s = spine.select(
        F.col(key), F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_kind"), F.lit(0).cast("long").alias("_seq"),
        F.lit(None).cast("string").alias("_ftype"),
        F.lit(None).cast("long").alias("_val"),
        *[F.col(c) for c in other],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_kind", "_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    feats = [
        F.last(F.when(F.col("_ftype") == t, F.col("_val")), ignorenulls=True)
        .over(w).alias(f"f_{t}")
        for t in types
    ]
    return (
        u.unionByName(s)
        .select(key, F.col("_ts").alias(ts_col), "_kind", *other, *feats)
        .filter(F.col("_kind") == 1)
        .drop("_kind")
    )


def PIT_FEATURES_SQL(spine_sql: str, updates_sql: str, key: str,
                     ts_alias: str, other_cols: list[str],
                     types: list[str]) -> str:
    """DuckDB oracle: same union + running last_value(... IGNORE NULLS)
    window; identical (ts, kind, seq) total order.  ``spine_sql`` must
    yield ({key}, _ts, *other_cols); ``updates_sql`` must yield
    ({key}, _ts, _seq, _ftype, _val)."""
    feats = ",\n       ".join(
        f"last_value(CASE WHEN _ftype = '{t}' THEN _val END IGNORE NULLS)"
        f" OVER w AS f_{t}"
        for t in types
    )
    null_spine = ", ".join(f"NULL AS {c}" for c in other_cols)
    sel_spine = ", ".join(other_cols)
    return f"""
WITH sp AS ({spine_sql}),
up AS ({updates_sql}),
unioned AS (
  SELECT {key}, _ts, 0 AS _kind, _seq, _ftype, _val, {null_spine} FROM up
  UNION ALL
  SELECT {key}, _ts, 1 AS _kind, CAST(0 AS BIGINT) AS _seq,
         NULL AS _ftype, CAST(NULL AS BIGINT) AS _val, {sel_spine} FROM sp
),
ranked AS (
  SELECT {key}, _ts, _kind, {sel_spine},
       {feats}
  FROM unioned
  WINDOW w AS (PARTITION BY {key} ORDER BY _ts, _kind, _seq
               ROWS UNBOUNDED PRECEDING)
)
SELECT {key}, _ts AS {ts_alias}, {sel_spine},
       {", ".join(f"f_{t}" for t in types)}
FROM ranked WHERE _kind = 1
"""


def scd2_incremental_merge(dim: DataFrame, delta: DataFrame,
                           key: str = "user_id", state: str = "event_type",
                           ts_s: str = "ts_s",
                           tiebreak: str = "event_id") -> DataFrame:
    """Nightly SCD2 maintenance: fold ONE new partition of the change log
    into an existing SCD2 dimension without re-reading history.

    ``dim`` is a prior :func:`scd2_intervals` output; ``delta`` rows must
    all be later than every ``dim`` valid_from for their key (the daily-
    partition property).  The merge (a) drops delta rows that do not
    change the state (seeding the first row's comparison with the key's
    CURRENT dim state), (b) numbers new versions from the current
    version, (c) closes the open interval at the key's first kept change
    and (d) passes closed history through untouched.

    Incremental-apply identity (the contract oracle): merging the
    delta into scd2(log < T) equals scd2(full log) exactly — the
    correctness statement of every warehouse MERGE pipeline.

    Scale: history is touched only via its |keys|-sized current slice;
    the delta (one day vs years of history) shuffles once on the key for
    the change window; closing is a keyed join against the first-change
    row per key.  The full-rebuild alternative re-shuffles the entire
    log every night."""
    cur = dim.filter(F.col("is_current")).select(
        F.col(key),
        F.col("state").alias("_cur_state"),
        F.col("version").alias("_cur_version"),
    )
    w = Window.partitionBy(key).orderBy(ts_s, tiebreak)
    d = delta.select(key, state, ts_s, tiebreak).withColumn(
        "_prev", F.lag(state).over(w)
    ).join(cur, on=key, how="left")
    kept = d.filter(
        F.when(F.col("_prev").isNotNull(), F.col("_prev") != F.col(state))
        .otherwise(
            F.col("_cur_state").isNull()
            | (F.col("_cur_state") != F.col(state))
        )
    )
    new_rows = (
        kept.withColumn("_rn", F.row_number().over(w))
        .withColumn("_to", F.lead(ts_s).over(w))
        .select(
            F.col(key),
            F.col(state).alias("state"),
            F.col(ts_s).cast("long").alias("valid_from_s"),
            F.col("_to").cast("long").alias("valid_to_s"),
            (F.coalesce(F.col("_cur_version"), F.lit(0)) + F.col("_rn"))
            .cast("int").alias("version"),
            F.col("_to").isNull().alias("is_current"),
        )
    )
    first_kept = kept.groupBy(key).agg(
        F.min(F.col(ts_s)).cast("long").alias("_close_ts")
    )
    closed = dim.join(first_kept, on=key, how="left").select(
        F.col(key),
        F.col("state"),
        F.col("valid_from_s"),
        F.when(
            F.col("is_current") & F.col("_close_ts").isNotNull(),
            F.col("_close_ts"),
        ).otherwise(F.col("valid_to_s")).cast("long").alias("valid_to_s"),
        F.col("version"),
        (F.col("is_current") & F.col("_close_ts").isNull())
        .alias("is_current"),
    )
    return closed.unionByName(new_rows)


# ---------------------------------------------------------------------------
# Z-set incremental view maintenance (retractions) + sweep-line concurrency
# ---------------------------------------------------------------------------

def zset_agg_apply(mv: DataFrame, delta: DataFrame, key_cols: list,
                   sum_cols: list, sign_col: str = "sign") -> DataFrame:
    """Incremental maintenance of a materialized GROUP BY under INSERTS AND
    DELETES — the Z-set / DBSP signed-multiplicity fold that
    ``incremental_agg_merge`` (insert-only) cannot express.

    ``mv`` holds the current aggregate state ``(key_cols..., cnt,
    sum_cols...)``; ``delta`` is the change log at the BASE-TABLE grain with
    ``sign_col`` = +1 (insert) / -1 (delete / retraction; an update is a
    -1/+1 pair).  The delta collapses to per-key signed partials in one
    map-side-combined aggregate, merges with the |keys|-sized state in one
    keyed shuffle, and groups whose multiplicity reaches zero VANISH — the
    invariant the cnt>0 filter enforces and the contract oracle checks by
    recomputing from scratch (merge(agg(base), Δ) == agg(base ⊎ Δ)).

    Scale shape: the nightly job touches |delta| + |keys| rows, never the
    100 TB history; count/sum (and anything derivable from them: avg, and
    min/max under insert-only) are the self-maintainable aggregates this
    covers — holistic aggregates (exact quantiles) need the base table and
    are out of scope by design."""
    val_aggs = [
        F.sum(F.col(sign_col) * F.col(c)).cast("long").alias(c)
        for c in sum_cols
    ]
    delta_agg = delta.groupBy(*key_cols).agg(
        F.sum(sign_col).cast("long").alias("cnt"), *val_aggs
    )
    return (
        mv.unionByName(delta_agg)
        .groupBy(*key_cols)
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            *[F.sum(c).cast("long").alias(c) for c in sum_cols],
        )
        .filter(F.col("cnt") > 0)
    )


def sweep_concurrency(intervals: DataFrame, start_col: str, end_col: str,
                      id_col: str, num_ranges: int = 32) -> DataFrame:
    """Sweep-line concurrency over CLOSED integer intervals: every interval
    emits +1 at its start and -1 at its end, and the exact global running
    sum over the boundary stream IS the number of concurrently-open
    intervals at each boundary instant (peak load, max connections,
    room-booking overlap — the classic interval-analytics primitive).

    Ordering at equal timestamps is starts-before-ends (``ord`` 0/1) so
    touching intervals count as overlapping, with ``id_col`` (unique per
    interval) as the final tie-break — (ts, ord, id) is a total order, which
    the prefix sum requires for cross-engine determinism.

    The running sum is the two-phase distributed prefix sum
    (corpus.distributed_running_sum): no global single-partition window at
    any corpus size.  Returns one row per boundary: (ts, ord, iid, delta,
    conc)."""
    from .corpus import distributed_running_sum

    starts = intervals.select(
        F.col(start_col).cast("long").alias("ts"),
        F.lit(0).alias("ord"),
        F.col(id_col).cast("long").alias("iid"),
        F.lit(1).cast("long").alias("delta"),
    )
    ends = intervals.select(
        F.col(end_col).cast("long").alias("ts"),
        F.lit(1).alias("ord"),
        F.col(id_col).cast("long").alias("iid"),
        F.lit(-1).cast("long").alias("delta"),
    )
    out = distributed_running_sum(
        starts.unionByName(ends), ["ts", "ord", "iid"], "delta", num_ranges
    )
    return out.withColumnRenamed("running", "conc")


# ---------------------------------------------------------------------------
# Interval-overlap join (canonical-bucket blocking)
# ---------------------------------------------------------------------------

def interval_overlap_pairs(a: DataFrame, b: DataFrame | None = None,
                           bucket_s: int = 86400) -> DataFrame:
    """Pairs of overlapping closed intervals — the interval join Spark
    has no native operator for (IEJoin territory, Khayyat et al. SIGMOD
    2015), as an EQUI-join: each interval explodes to the ``bucket_s``
    buckets it covers; a pair survives ONLY in the canonical bucket of
    its overlap start, so every overlapping pair appears exactly once
    with no dedup pass.  Inputs carry (k, start_s, end_s).

    ``b is None``: self-join (pairs with a.k < b.k).  Otherwise a CROSS
    overlap join of two disjoint interval sets (used by the incremental
    streaming twin: new x old), with output keys oriented (least,
    greatest) so the pair identity matches the batch self-join's.
    Per-bucket cost is quadratic in CONCURRENCY, never corpus size."""
    def bucketed(df, side):
        return df.select(
            F.col("k").alias(f"k_{side}"),
            F.col("start_s").alias(f"start_{side}"),
            F.col("end_s").alias(f"end_{side}"),
            F.explode(F.sequence(
                F.expr(f"start_s div {bucket_s}"),
                F.expr(f"end_s div {bucket_s}"))).alias(f"bkt_{side}"),
        )

    self_join = b is None
    left = bucketed(a, "a")
    right = bucketed(a if self_join else b, "b")
    key_cond = (F.col("k_a") < F.col("k_b")) if self_join \
        else (F.col("k_a") != F.col("k_b"))
    ov_start = F.greatest(F.col("start_a"), F.col("start_b"))
    pairs = (
        left.join(right, [
            F.col("bkt_a") == F.col("bkt_b"),
            key_cond,
            F.col("start_a") <= F.col("end_b"),
            F.col("start_b") <= F.col("end_a"),
        ])
        .filter(F.col("bkt_a") == F.expr(
            f"greatest(start_a, start_b) div {bucket_s}"))
    )
    return pairs.select(
        F.least("k_a", "k_b").alias("k_a"),
        F.greatest("k_a", "k_b").alias("k_b"),
        ov_start.cast("long").alias("overlap_start_s"),
        (F.least(F.col("end_a"), F.col("end_b")) - ov_start)
        .cast("long").alias("overlap_s"),
    )
