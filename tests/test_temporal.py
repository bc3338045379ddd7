"""As-of join and bucketed range join semantics (operators/temporal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omldm_spark.operators.temporal import asof_join, bucketed_range_join


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_asof_basic_and_left_semantics(spark):
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 205), (3, 1, 50), (4, 2, 100)],
        "event_id long, user_id long, ts_s long",
    )
    right = spark.createDataFrame(
        [(10, 1, 100, 1.0), (11, 1, 200, 2.0), (12, 3, 90, 9.0)],
        "purchase_id long, user_id long, ts_s long, purchase_value double",
    )
    out = asof_join(
        left, right, on=["user_id"], ts_col="ts_s",
        payload_cols=["purchase_id", "purchase_value"], tie_col="purchase_id",
    )
    got = _rows(out, "event_id", "purchase_id", "purchase_value")
    assert got == [
        (1, 10, 1.0),   # exact-ts match counts (at-or-before)
        (2, 11, 2.0),   # latest preceding, not first
        (3, None, None),  # before any purchase -> kept with NULLs
        (4, None, None),  # user with no purchases -> kept
    ]


def test_asof_tie_on_right_ts_is_deterministic(spark):
    left = spark.createDataFrame([(1, 1, 100)], "event_id long, user_id long, ts_s long")
    right = spark.createDataFrame(
        [(10, 1, 100, 1.0), (11, 1, 100, 2.0)],
        "purchase_id long, user_id long, ts_s long, purchase_value double",
    )
    out = asof_join(
        left, right, on=["user_id"], ts_col="ts_s",
        payload_cols=["purchase_id", "purchase_value"], tie_col="purchase_id",
    )
    # max_by(payload, tie) -> the purchase with the larger id wins, always
    assert _rows(out, "purchase_id", "purchase_value") == [(11, 2.0)]


def test_asof_matches_pandas_merge_asof(spark):
    import pandas as pd

    rng_l = [(i, i % 3, 17 * i % 101) for i in range(60)]
    rng_r = [(1000 + i, i % 3, 23 * i % 97, float(i)) for i in range(40)]
    left = spark.createDataFrame(rng_l, "event_id long, user_id long, ts_s long")
    right = spark.createDataFrame(
        rng_r, "purchase_id long, user_id long, ts_s long, purchase_value double"
    )
    out = asof_join(
        left, right, on=["user_id"], ts_col="ts_s",
        payload_cols=["purchase_id", "purchase_value"], tie_col="purchase_id",
    ).toPandas().sort_values("event_id").reset_index(drop=True)

    lp = pd.DataFrame(rng_l, columns=["event_id", "user_id", "ts_s"]).sort_values("ts_s")
    rp = (
        pd.DataFrame(rng_r, columns=["purchase_id", "user_id", "ts_s", "purchase_value"])
        .sort_values(["ts_s", "purchase_id"])
        # mirror the deterministic dedupe: keep max purchase_id per (key, ts)
        .groupby(["user_id", "ts_s"], as_index=False).last()
        .sort_values("ts_s")
    )
    exp = pd.merge_asof(
        lp, rp, on="ts_s", by="user_id", direction="backward"
    ).sort_values("event_id").reset_index(drop=True)
    assert list(out["purchase_id"].fillna(-1)) == list(exp["purchase_id"].fillna(-1))
    assert list(out["purchase_value"].fillna(-1)) == list(exp["purchase_value"].fillna(-1))


def test_range_join_window_bounds_and_zero_rows(spark):
    purch = spark.createDataFrame(
        [(1, 1, 1000), (2, 1, 100), (3, 2, 1000)],
        "purchase_id long, user_id long, purchase_ts_s long",
    )
    clicks = spark.createDataFrame(
        [
            (10, 1, 400, 1),   # exactly ts-600 -> included (>= lower bound)
            (11, 1, 999, 2),   # in window
            (12, 1, 1000, 4),  # exactly probe ts -> EXCLUDED (half-open)
            (13, 1, 399, 8),   # below window
            (14, 2, 500, 16),  # other user, in their window? p3 window [400,1000) yes
        ],
        "click_id long, user_id long, ts_s long, qv long",
    )
    out = bucketed_range_join(
        purch, clicks, on=["user_id"],
        probe_ts="purchase_ts_s", build_ts="ts_s", window=600,
        aggs=[
            F.count(F.col("b.click_id")).cast("long").alias("n_clicks"),
            F.coalesce(F.sum(F.col("b.qv")), F.lit(0)).cast("long").alias("qv_sum"),
        ],
    )
    got = _rows(out, "purchase_id", "n_clicks", "qv_sum")
    assert got == [
        (1, 2, 3),   # clicks 10 (boundary) + 11; 12 and 13 excluded
        (2, 0, 0),   # nothing in [-500, 100) -> kept with zero counts
        (3, 1, 16),
    ]


def test_range_join_no_duplicate_matches_across_buckets(spark):
    # window == bucket width: every (probe, build) pair must match exactly
    # once even when the probe's window straddles the bucket boundary
    purch = spark.createDataFrame(
        [(i, 1, 600 + i) for i in range(50)],
        "purchase_id long, user_id long, purchase_ts_s long",
    )
    clicks = spark.createDataFrame(
        [(100 + j, 1, 300 + 7 * j, 1) for j in range(100)],
        "click_id long, user_id long, ts_s long, qv long",
    )
    out = bucketed_range_join(
        purch, clicks, on=["user_id"],
        probe_ts="purchase_ts_s", build_ts="ts_s", window=600,
        aggs=[F.count(F.col("b.click_id")).cast("long").alias("n_clicks")],
    ).toPandas().set_index("purchase_id")
    import pandas as pd  # noqa: F401

    for i in range(50):
        p_ts = 600 + i
        exp = sum(1 for j in range(100) if p_ts - 600 <= 300 + 7 * j < p_ts)
        assert out.loc[i, "n_clicks"] == exp


def test_funnel_strict_ordering(spark):
    """Conversion requires strictly-later timestamps stage by stage:
    a user with purchase BEFORE click does not convert at purchase;
    same-timestamp events do not chain (strict >)."""
    from datetime import datetime

    from omldm_spark.operators.temporal import funnel_counts

    T = datetime
    rows = [
        # u1: clean v(1) -> c(2) -> p(3): converts everywhere
        (1, "view", T(2024, 1, 1, 0, 0, 1)),
        (1, "click", T(2024, 1, 1, 0, 0, 2)),
        (1, "purchase", T(2024, 1, 1, 0, 0, 3)),
        # u2: purchase precedes click -> stops at click
        (2, "view", T(2024, 1, 1, 0, 0, 1)),
        (2, "purchase", T(2024, 1, 1, 0, 0, 2)),
        (2, "click", T(2024, 1, 1, 0, 0, 3)),
        # u3: click at the SAME instant as view -> strict > blocks it
        (3, "view", T(2024, 1, 1, 0, 0, 5)),
        (3, "click", T(2024, 1, 1, 0, 0, 5)),
        # u4: never views; later stages can't fire
        (4, "click", T(2024, 1, 1, 0, 0, 1)),
        (4, "purchase", T(2024, 1, 1, 0, 0, 2)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["stage"]: r["users"]
           for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_first_touch_semantics(spark):
    """Conversion time is the EARLIEST qualifying event: a user whose first
    click lands before the first view still converts if a second click
    follows the view."""
    from datetime import datetime

    from omldm_spark.operators.temporal import funnel_counts

    T = datetime
    rows = [
        (1, "click", T(2024, 1, 1, 0, 0, 1)),   # too early, ignored
        (1, "view", T(2024, 1, 1, 0, 0, 2)),
        (1, "click", T(2024, 1, 1, 0, 0, 3)),   # qualifies
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["stage"]: r["users"]
           for r in funnel_counts(ev, ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 1}


def test_scd2_intervals_runs_versions_adjacency(spark):
    """Consecutive duplicate states collapse into one version; intervals
    are adjacent (valid_to == next valid_from); only the last run is
    current; reopening a previous state starts a NEW version."""
    from omldm_spark.operators.temporal import scd2_intervals

    rows = [
        (1, "free", 100, 1), (1, "free", 150, 2),   # same run
        (1, "pro", 200, 3),
        (1, "free", 300, 4),                          # reopened state
        (2, "pro", 50, 5),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s long, event_id long")
    out = sorted(
        scd2_intervals(ev).collect(),
        key=lambda r: (r["user_id"], r["version"]),
    )
    got = [(r["user_id"], r["state"], r["valid_from_s"], r["valid_to_s"],
            r["version"], r["is_current"]) for r in out]
    assert got == [
        (1, "free", 100, 200, 1, False),
        (1, "pro", 200, 300, 2, False),
        (1, "free", 300, None, 3, True),
        (2, "pro", 50, None, 1, True),
    ]


def test_scd2_tie_breaks_on_event_id(spark):
    """Two changes at the SAME timestamp order by the unique event_id, so
    the interval chain is deterministic."""
    from omldm_spark.operators.temporal import scd2_intervals

    rows = [(1, "a", 100, 7), (1, "b", 100, 8), (1, "c", 200, 9)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s long, event_id long")
    out = sorted(scd2_intervals(ev).collect(), key=lambda r: r["version"])
    assert [(r["state"], r["valid_from_s"], r["valid_to_s"]) for r in out] == [
        ("a", 100, 100), ("b", 100, 200), ("c", 200, None)]


def test_cdc_apply_semantics(spark):
    """Upsert replaces, delete removes, unknown key inserts, untouched
    passes through; last-writer-wins by seq; seq tie breaks op desc
    ('upsert' > 'delete')."""
    from omldm_spark.operators.temporal import cdc_apply

    snap = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
        "k long, bal long, seg string")
    chg = spark.createDataFrame(
        [
            (1, "upsert", 5, 11, "a2"),   # replace
            (1, "upsert", 4, 99, "zz"),   # superseded by seq 5
            (2, "delete", 6, 0, ""),      # remove
            (4, "upsert", 7, 40, "d"),    # insert
            (5, "delete", 8, 0, ""),      # delete of unknown key: no row
            (6, "delete", 9, 0, ""),      # tie on seq 9 ...
            (6, "upsert", 9, 60, "f"),    # ... upsert wins (op desc)
        ],
        "k long, op string, seq long, bal long, seg string")
    out = {r["k"]: (r["bal"], r["seg"])
           for r in cdc_apply(snap, chg, "k", ["bal", "seg"]).collect()}
    assert out == {1: (11, "a2"), 3: (30, "c"), 4: (40, "d"), 6: (60, "f")}


def test_scd2_incremental_merge_edge_cases(spark):
    """The MERGE identity on a hand-built log covering every case: key
    untouched by the delta, key with a no-op delta row, key changing
    state, and a brand-new key first seen in the delta."""
    from omldm_spark.operators.temporal import (scd2_incremental_merge,
                                                scd2_intervals)

    hist = spark.createDataFrame(
        [(1, "a", 10, 100), (1, "b", 20, 101),   # key 1: a then b
         (2, "x", 10, 102),                      # key 2: untouched later
         (3, "p", 10, 103)],                     # key 3: no-op delta
        "user_id long, event_type string, ts_s long, event_id long",
    )
    delta = spark.createDataFrame(
        [(1, "b", 30, 200),                      # no-op (still b)
         (1, "c", 40, 201),                      # real change
         (3, "p", 35, 202),                      # no-op
         (9, "z", 50, 203)],                     # new key
        "user_id long, event_type string, ts_s long, event_id long",
    )
    dim = scd2_intervals(hist)
    merged = scd2_incremental_merge(dim, delta)
    full = scd2_intervals(
        hist.unionByName(delta).select(
            "user_id", "event_type", "ts_s", "event_id")
    )
    key = ["user_id", "version"]
    got = sorted(map(tuple, merged.select(
        *key, "state", "valid_from_s", "valid_to_s", "is_current").collect()))
    want = sorted(map(tuple, full.select(
        *key, "state", "valid_from_s", "valid_to_s", "is_current").collect()))
    assert got == want
