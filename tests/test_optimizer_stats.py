"""Optimizer-statistics diagnostics (queries.py round-7 section) vs
pure-python referees on the real sf0.001 tables: predicate-correlation
audit, equi-depth-histogram selectivity estimation, and (as they land)
NDV accuracy and the Selinger join-order enumeration.
"""

from __future__ import annotations

import duckdb

from tests.conftest import SF_DIR


def _fetch(table: str, cols: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {cols} FROM '{SF_DIR}/{table}.parquet'").fetchall()
    con.close()
    return rows


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_correlated_selectivity_matches_python_referee(spark):
    from omldm_spark.queries import QUERIES

    got = {
        r["pair_id"]: r
        for r in QUERIES["correlated_selectivity_audit"](spark, SF_DIR)
        .collect()
    }
    ev = _fetch("events", "event_type, round(value*100,0), user_id")
    li = _fetch("lineitem", "l_returnflag, round(l_discount*100,0), l_quantity")
    orders = _fetch("orders", "o_orderstatus, round(o_totalprice*100,0)")

    cases = {
        "events:click_x_value_ge_50": (
            ev, lambda r: r[0] == "click", lambda r: r[1] >= 5000),
        "events:purchase_x_even_user": (
            ev, lambda r: r[0] == "purchase", lambda r: r[2] % 2 == 0),
        "lineitem:returned_x_qty_ge_25": (
            li, lambda r: r[0] == "R", lambda r: r[2] >= 25),
        "lineitem:disc_ge_5_x_qty_ge_25": (
            li, lambda r: r[1] >= 5, lambda r: r[2] >= 25),
        "orders:final_x_price_ge_250k": (
            orders, lambda r: r[0] == "F", lambda r: r[1] >= 25000000),
    }
    assert set(got) == set(cases)
    for pid, (rows, pa, pb) in cases.items():
        n = len(rows)
        ca = sum(1 for r in rows if pa(r))
        cb = sum(1 for r in rows if pb(r))
        cj = sum(1 for r in rows if pa(r) and pb(r))
        # mirror the overflow-bounded operation order (_SEL_EST/_SEL_LIFT):
        # every intermediate <= 1e6 * n, so the report stays int64-exact
        # at table sizes where cj*n*1e6 would overflow
        est = _tdiv(_tdiv(ca * 1000000, n) * cb, 1000000)
        r = got[pid]
        assert (r["n_rows"], r["c_a"], r["c_b"], r["c_joint"]) == (
            n, ca, cb, cj), pid
        assert r["est_joint"] == est, pid
        assert r["lift_ppm"] == (_tdiv(_tdiv(cj * 1000000, ca) * n, cb)
                                 if ca * cb else None), pid
        assert r["err_ppm"] == (_tdiv((est - cj) * 1000000, cj)
                                if cj else None), pid


def _equi_depth_hist(vals: list[int], bins: int):
    n = len(vals)
    uniq = sorted(set(vals))
    from collections import Counter

    cnt = Counter(vals)
    cum, cdf = 0, {}
    for v in uniq:
        cum += cnt[v]
        cdf[v] = cum
    edges = []
    for b in range(1, bins):
        need = (b * n + bins - 1) // bins
        edges.append(min(v for v in uniq if cdf[v] >= need))
    edges = sorted(edges)
    hist = {}
    for v in vals:
        bi = 1 + sum(1 for e in edges if e < v)
        lo, hi, c = hist.get(bi, (v, v, 0))
        hist[bi] = (min(lo, v), max(hi, v), c + 1)
    return hist


def test_histogram_selectivity_matches_python_referee(spark):
    from omldm_spark.queries import (_HIST_BINS, _HIST_THRESHOLDS, QUERIES)

    got = {
        r["threshold_c"]: r
        for r in QUERIES["histogram_selectivity_report"](spark, SF_DIR)
        .collect()
    }
    vals = [int(r[0]) for r in _fetch("orders", "round(o_totalprice*100,0)")]
    hist = _equi_depth_hist(vals, _HIST_BINS)
    for t in _HIST_THRESHOLDS:
        est = 0
        for lo, hi, c in hist.values():
            if hi <= t:
                est += c
            elif lo > t:
                pass
            else:
                est += _tdiv(c * (t - lo + 1), hi - lo + 1)
        actual = sum(1 for v in vals if v <= t)
        r = got[t]
        assert r["est_rows"] == est, t
        assert r["actual_rows"] == actual, t
        assert r["err_ppm"] == (_tdiv((est - actual) * 1000000, actual)
                                if actual else None), t


def test_histogram_estimates_bounded_by_bin_mass(spark):
    """The interpolation estimate can never be off by more than one
    bucket's mass — the classic equi-depth error bound: only the bucket
    CONTAINING the threshold is interpolated, every other bucket
    contributes its exact count.  n is the exact table row count (not
    the largest threshold's cumulative count), and the asserted bound
    is the stated one-bucket mass ceil(n / bins) plus 1 for integer
    edge rounding."""
    from omldm_spark.queries import _HIST_BINS, QUERIES

    rows = QUERIES["histogram_selectivity_report"](spark, SF_DIR).collect()
    n = len(_fetch("orders", "1"))
    bound = -(-n // _HIST_BINS) + 1
    for r in rows:
        assert abs(r["est_rows"] - r["actual_rows"]) <= bound
