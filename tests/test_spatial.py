"""Grid epsilon join + DBSCAN semantics (operators/spatial.py) against
brute-force python referees — boundary cells, negative coordinates,
exactly-once, and the deterministic core/border/noise contract."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from omldm_spark.operators.spatial import (
    dbscan_labels,
    epsilon_degrees,
    grid_epsilon_pairs,
)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, x long, y long")


def _brute_pairs(rows, eps):
    out = set()
    for (ia, xa, ya), (ib, xb, yb) in itertools.combinations(rows, 2):
        d2 = (xa - xb) ** 2 + (ya - yb) ** 2
        if d2 <= eps * eps:
            out.add((min(ia, ib), max(ia, ib), d2))
    return out


def _got_pairs(df):
    return {(r.id_a, r.id_b, r.d2) for r in df.collect()}


def test_grid_pairs_boundary_and_negative_coords(spark):
    eps = 40
    rows = [
        (1, 0, 0),
        (2, 40, 0),      # exactly eps away from 1: inclusive boundary
        (3, 41, 0),      # just beyond eps from 1; 1 away from 2
        (4, -1, 0),      # negative coord straddling the cell-0 boundary
        (5, -41, 0),     # eps from 4, beyond eps from 1
        (6, 28, 28),     # d2 = 1568 <= 1600 from 1 (diagonal corner case)
        (7, 29, 29),     # d2 = 1682 > 1600 from 1
        (8, 1000, 1000),  # isolated
        (9, 0, 0),       # duplicate coordinates of 1
    ]
    got = _got_pairs(grid_epsilon_pairs(_pts(spark, rows), eps))
    assert got == _brute_pairs(rows, eps)
    assert (1, 2, 1600) in got          # inclusive at exactly eps
    assert (1, 9, 0) in got             # coincident points pair once
    assert not any(p[0] == 8 or p[1] == 8 for p in got)


def test_grid_pairs_random_referee_and_exactly_once(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(-300, 300), rng.randrange(-300, 300))
            for i in range(120)]
    eps = 55  # not a divisor-friendly width: exercises off-grid cells
    df = grid_epsilon_pairs(_pts(spark, rows), eps)
    collected = [(r.id_a, r.id_b, r.d2) for r in df.collect()]
    # exactly-once is structural: no dedup pass ran, so assert no dupes
    assert len(collected) == len(set(collected))
    assert set(collected) == _brute_pairs(rows, eps)


def test_grid_pairs_cross_mode_disjoint_sets(spark):
    rng = random.Random(11)
    old = [(i, rng.randrange(-200, 200), rng.randrange(-200, 200))
           for i in range(60)]
    new = [(i + 1000, rng.randrange(-200, 200), rng.randrange(-200, 200))
           for i in range(40)]
    eps = 40
    got = _got_pairs(grid_epsilon_pairs(
        _pts(spark, new), eps, _pts(spark, old)))
    want = set()
    for (ia, xa, ya) in new:
        for (ib, xb, yb) in old:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= eps * eps:
                want.add((min(ia, ib), max(ia, ib), d2))
    assert got == want
    # self-pairs of either set never leak into cross mode
    new_ids = {r[0] for r in new}
    assert all((a in new_ids) != (b in new_ids) for a, b, _ in got)


def test_epsilon_degrees_counts_isolated_as_zero(spark):
    rows = [(1, 0, 0), (2, 10, 0), (3, 20, 0), (4, 500, 500)]
    got = {r.id: r.n_neighbors
           for r in epsilon_degrees(_pts(spark, rows), 40).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 0}


def test_dbscan_planted_blobs_border_and_noise(spark):
    # blob A: 6 points packed within eps of each other around (0, 0);
    # blob B: same around (1000, 0); a border point within eps of ONE
    # core point of each blob would be ambiguous — here border 50 sits
    # near blob A only; 60 is isolated noise.
    eps, min_pts = 40, 4
    blob_a = [(i, dx, dy) for i, (dx, dy) in enumerate(
        [(0, 0), (10, 0), (0, 10), (10, 10), (5, 5), (15, 5)])]
    blob_b = [(i + 20, 1000 + dx, dy) for i, (dx, dy) in enumerate(
        [(0, 0), (10, 0), (0, 10), (10, 10), (5, 5), (15, 5)])]
    border = [(50, 46, 5)]   # within eps of (10,0),(10,10),(15,5): 3 < min_pts
    noise = [(60, 500, 500)]
    rows = blob_a + blob_b + border + noise
    out = {r.id: (r.cluster_id, r.role)
           for r in dbscan_labels(_pts(spark, rows), eps, min_pts).collect()}
    for i, _, _ in blob_a:
        assert out[i] == (0, "core")       # component min id = 0
    for i, _, _ in blob_b:
        assert out[i] == (20, "core")
    assert out[50] == (0, "border")        # attached to its core neighbors
    assert out[60] == (-1, "noise")


def test_dbscan_border_tie_attaches_to_min_cluster(spark):
    # two 5-point cores with a single point within eps of both: the
    # deterministic contract is min cluster id, not arrival order.
    eps, min_pts = 40, 4
    left = [(i, dx, 0) for i, dx in enumerate([0, 5, 10, 15, 20])]
    right = [(i + 10, 100 + dx, 0) for i, dx in enumerate([0, 5, 10, 15, 20])]
    bridge = [(99, 60, 0)]  # within 40 of left's {20} and right's {100}
    out = {r.id: (r.cluster_id, r.role)
           for r in dbscan_labels(
               _pts(spark, left + right + bridge), eps, min_pts).collect()}
    assert out[99] == (0, "border")
    # the bridge is NOT core, so the two blobs stay separate components
    assert out[0][0] == 0 and out[10][0] == 10


def test_dbscan_chain_merges_through_core_points(spark):
    # core-core connectivity is transitive: a chain of dense knots each
    # within eps of the next collapses to ONE cluster (the CC closure),
    # exactly what single-linkage border logic must NOT do on its own.
    eps, min_pts = 40, 3
    knots = []
    for k in range(4):
        cx = k * 35  # knot centers within eps of neighbors
        knots += [(k * 10 + j, cx + dx, dy) for j, (dx, dy) in enumerate(
            [(0, 0), (3, 0), (0, 3), (3, 3)])]
    out = dbscan_labels(_pts(spark, knots), eps, min_pts)
    assert out.select("cluster_id").distinct().count() == 1
    assert out.filter(F.col("role") != "core").count() == 0


def test_incremental_identity_any_cadence(spark):
    # the IVM identity behind streaming_grid_epsilon: at ANY batch
    # cadence, sum over batches of (new x new) + (new x accumulated)
    # equals the one-shot self-join — each pair counted in the batch
    # where its later point arrives, never twice.
    rng = random.Random(3)
    rows = [(i, rng.randrange(-250, 250), rng.randrange(-250, 250))
            for i in range(90)]
    eps = 40
    want = _brute_pairs(rows, eps)
    for n_batches in (1, 2, 3, 5):
        got = set()
        seen = []
        for b in range(n_batches):
            new = rows[b::n_batches]
            got |= _got_pairs(grid_epsilon_pairs(_pts(spark, new), eps))
            if seen:
                got |= _got_pairs(grid_epsilon_pairs(
                    _pts(spark, new), eps, _pts(spark, seen)))
            seen += new
        assert got == want, n_batches


def test_grid_hotspot_planted_dense_cell(spark):
    # 12 points in one cell, 1 point in each of 8 far-apart cells:
    # global mean = 20/9 per cell; the dense cell's neighborhood (only
    # itself occupied) has local mean 12 -> ratio 5.4x, hot; the
    # singletons sit at 0.45x, cold.  Two singletons are placed in
    # ADJACENT cells to pin the neighbor-join direction (their local
    # mean stays 1 -> still cold, but nbhd_cells becomes 2).
    eps = 40
    rows = [(i, 5 + (i % 4), 5 + (i // 4)) for i in range(12)]       # cell (0,0)
    far = [(100 + k, 1000 * (k + 1), -1000 * (k + 1)) for k in range(6)]
    adj = [(200, 2000, 2000), (201, 2041, 2000)]  # cells (50,50),(51,50)
    pts = _pts(spark, rows + far + adj)
    from omldm_spark.operators.spatial import grid_hotspot_cells
    out = {(r.cx, r.cy): r for r in grid_hotspot_cells(pts, eps).collect()}
    assert len(out) == 9
    off = (1 << 22) // eps  # cell index of coordinate 0
    dense = out[(off, off)]
    assert dense.n == 12 and dense.nbhd_cells == 1 and dense.hot
    assert dense.density_ratio_ppm == 12 * 9 * 1_000_000 // 20
    a = out[(off + 50, off + 50)]
    b = out[(off + 51, off + 50)]
    assert a.nbhd_cells == 2 and b.nbhd_cells == 2 and a.nbhd_n == 2
    assert not a.hot and not b.hot
