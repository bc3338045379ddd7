"""Spatial / density operators: grid-blocked epsilon-neighborhood join and
DBSCAN labeling over 2-D integer point sets.

The reference engine has no spatial surface; this family extends the
similarity-join discipline (operators/dedup.py prefix filter, simhash
pigeonhole, operators/temporal.py interval buckets) to metric space: a
candidate-generation blocking whose LOSSLESSNESS is the oracle gate — the
DuckDB oracle is the unfiltered quadratic join, so a single pair missed by
the grid fails the round.

Scale shape (the 100 TB story): cell width == eps means a qualifying pair
is never more than one cell apart on either axis, so ONE side replicates to
its 3x3 cell neighborhood (constant 9x) and the join is a pure EQUI-join on
(cx, cy) — shuffle-partitionable, AQE-skewable, per-cell cost quadratic in
LOCAL density, never corpus size.  DBSCAN rides the same pairs: degrees are
one keyed agg, core-core connectivity reuses the O(log n) alternating-stars
CC (operators/dedup.py cc_alternating_stars, Kiveris SoCC 2014) rather than
a diameter-many label propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Shifts any plausible quantized coordinate positive so `div` (truncation
# toward zero, identical in Spark and DuckDB) behaves as floor — the
# sign-safety discipline of the floor-div oracles (NOTES r6: both engines
# TRUNCATE; on non-negative operands truncation IS floor).
_OFF = 1 << 22


def _cells(df: DataFrame, eps: int, side: str) -> DataFrame:
    return df.select(
        F.col("id").alias(f"id_{side}"),
        F.col("x").alias(f"x_{side}"),
        F.col("y").alias(f"y_{side}"),
        F.expr(f"(x + {_OFF}) div {eps}").alias("cx"),
        F.expr(f"(y + {_OFF}) div {eps}").alias("cy"),
    )


def grid_epsilon_pairs(a: DataFrame, eps: int,
                       b: DataFrame | None = None) -> DataFrame:
    """All point pairs within Euclidean distance ``eps``, as a grid
    equi-join.  Inputs carry (id, x, y) integer columns.

    One side sits in its HOME cell; the other replicates to its 3x3 cell
    neighborhood.  d2 <= eps^2 implies |dx| <= eps and |dy| <= eps, so the
    home cell of one endpoint is always among the other's 9 replicas —
    and because the 9 replica cells are distinct, each qualifying pair
    matches EXACTLY once: no dedup pass (the canonical-bucket discipline
    of interval_overlap_pairs).

    ``b is None``: self-join, pairs oriented id_a < id_b.  Otherwise a
    cross join of two disjoint point sets (the incremental streaming
    twin's new x old), output keys oriented (least, greatest) so pair
    identity matches the batch self-join's.  Output: (id_a, id_b, d2),
    all BIGINT and exact — coordinates are integers, so d2 is too.
    """
    self_join = b is None
    home = _cells(a, eps, "a")
    repl = (
        _cells(a if self_join else b, eps, "b")
        .withColumn("_ox", F.explode(F.expr("array(-1, 0, 1)")))
        .withColumn("_oy", F.explode(F.expr("array(-1, 0, 1)")))
        .select(
            "id_b", "x_b", "y_b",
            (F.col("cx") + F.col("_ox")).alias("cx"),
            (F.col("cy") + F.col("_oy")).alias("cy"),
        )
    )
    key_cond = (F.col("id_a") < F.col("id_b")) if self_join \
        else (F.col("id_a") != F.col("id_b"))
    d2 = F.expr("(x_a - x_b) * (x_a - x_b) + (y_a - y_b) * (y_a - y_b)")
    pairs = home.join(repl, ["cx", "cy"]).filter(
        key_cond & (d2 <= F.lit(eps * eps)))
    return pairs.select(
        F.least("id_a", "id_b").cast("long").alias("id_a"),
        F.greatest("id_a", "id_b").cast("long").alias("id_b"),
        d2.cast("long").alias("d2"),
    )


def epsilon_degrees(pts: DataFrame, eps: int,
                    pairs: DataFrame | None = None) -> DataFrame:
    """Per-point epsilon-neighborhood size (self excluded): symmetrize the
    pair set, one keyed count, LEFT join back so isolated points carry 0.
    ``pairs`` lets callers reuse an already-persisted pair frame."""
    if pairs is None:
        pairs = grid_epsilon_pairs(pts, eps)
    sym = pairs.select(F.col("id_a").alias("id")).unionByName(
        pairs.select(F.col("id_b").alias("id")))
    deg = sym.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return pts.join(deg, "id", "left").select(
        F.col("id").cast("long").alias("id"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_neighbors"),
    )


def dbscan_labels(pts: DataFrame, eps: int, min_pts: int) -> DataFrame:
    """Deterministic DBSCAN (Ester et al., KDD 1996) over integer 2-D
    points: core = >= min_pts neighbors within eps (self excluded);
    clusters = connected components of the core-core epsilon graph,
    labeled by component-minimum id; border = non-core with >= 1 core
    neighbor, attached to the MINIMUM core-neighbor cluster id (the
    deterministic resolution of DBSCAN's order-dependent border
    assignment); noise = everything else, cluster_id -1.

    Plan: ONE grid epsilon join (persisted — degrees, core filtering and
    border attach all fan out of it), one keyed degree agg, O(log n)
    alternating-stars CC over the core-core edges only, two broadcast-free
    keyed joins to attach labels.  Output: (id, cluster_id, role).
    """
    from .dedup import cc_alternating_stars

    pairs = grid_epsilon_pairs(pts, eps).persist()
    sym = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")) \
        .unionByName(
            pairs.select(F.col("id_b").alias("src"),
                         F.col("id_a").alias("dst")))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    core = deg.filter(F.col("n") >= min_pts).select(
        F.col("src").alias("id")).persist()
    core_edges = (
        sym.join(core.select(F.col("id").alias("src")), "src")
        .join(core.select(F.col("id").alias("dst")), "dst")
        .select("src", "dst")
    )
    labels, _ = cc_alternating_stars(core, core_edges)
    lab = labels.select(F.col("id"), F.col("lbl").alias("cluster_id"))
    border = (
        sym.join(core.select(F.col("id").alias("src")), "src", "left_anti")
        .join(lab.select(F.col("id").alias("dst"),
                         F.col("cluster_id").alias("_c")), "dst")
        .groupBy("src").agg(F.min("_c").alias("cluster_id"))
        .select(F.col("src").alias("id"), "cluster_id")
    )
    out = (
        pts.select("id")
        .join(lab.select("id", F.col("cluster_id").alias("_core_c")),
              "id", "left")
        .join(border.select("id", F.col("cluster_id").alias("_bord_c")),
              "id", "left")
        .select(
            F.col("id").cast("long").alias("id"),
            F.coalesce("_core_c", "_bord_c", F.lit(-1))
            .cast("long").alias("cluster_id"),
            F.when(F.col("_core_c").isNotNull(), F.lit("core"))
            .when(F.col("_bord_c").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise")).alias("role"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB) — quadratic ground truth, flat-CTE composable
# ---------------------------------------------------------------------------

def EPSILON_PAIRS_CTES(points_sql: str, eps: int) -> list[str]:
    """Flat `name AS (body)` parts (the DEDUP_CLUSTERS_SQL splice
    discipline — DuckDB rejects nested WITH inside recursive members):
    pts -> prs (UNFILTERED quadratic join: the grid blocking's
    losslessness is the gate) -> sym."""
    return [
        f"pts AS MATERIALIZED ({points_sql})",
        f"""prs AS MATERIALIZED (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST((a.x - b.x) * (a.x - b.x)
              + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS d2
  FROM pts a JOIN pts b
    ON a.id < b.id
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       <= {eps * eps}
)""",
        """sym AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM prs
  UNION ALL
  SELECT id_b, id_a FROM prs
)""",
    ]


def DBSCAN_SQL(points_sql: str, eps: int, min_pts: int) -> str:
    pre = ",\n".join(EPSILON_PAIRS_CTES(points_sql, eps))
    return f"""
WITH RECURSIVE {pre},
deg AS (SELECT src AS id, count(*) AS n FROM sym GROUP BY src),
core AS (SELECT id FROM deg WHERE n >= {min_pts}),
ce AS (
  SELECT s.src, s.dst FROM sym s
  JOIN core c1 ON s.src = c1.id JOIN core c2 ON s.dst = c2.id
),
closure(src, lbl) AS (
  SELECT id, id FROM core
  UNION
  SELECT e.dst, c.lbl FROM closure c JOIN ce e ON e.src = c.src
),
lab AS (SELECT src AS id, min(lbl) AS cluster_id FROM closure GROUP BY src),
bor AS (
  SELECT s.src AS id, min(l.cluster_id) AS cluster_id
  FROM sym s JOIN lab l ON s.dst = l.id
  WHERE s.src NOT IN (SELECT id FROM core)
  GROUP BY s.src
)
SELECT p.id,
       CAST(COALESCE(la.cluster_id, bo.cluster_id, -1) AS BIGINT)
         AS cluster_id,
       CASE WHEN la.id IS NOT NULL THEN 'core'
            WHEN bo.id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role
FROM pts p
LEFT JOIN lab la ON p.id = la.id
LEFT JOIN bor bo ON p.id = bo.id
"""


def grid_hotspot_cells(pts: DataFrame, eps: int) -> DataFrame:
    """Spatial hotspot audit over the occupied eps-grid (the practical
    sparse-grid variant of Getis-Ord Gi*, Getis & Ord GeogrAnal 1992:
    each occupied cell's 3x3 neighborhood density against the global
    mean; empty cells carry no mass and are skipped identically on both
    engines).  All integer: local mean over OCCUPIED neighbor cells
    (incl. self) vs global mean N/C as the exact floor-div ratio
    (nbhd_n * C * 1e6) div (nbhd_cells * N); hot = ratio >= 2x.

    Scale shape: ONE cell rollup (map-side combined: points collapse to
    occupied cells before any join), then the 9x offset replication of
    the CELL table (not the points) and an equi-join on neighbor cell —
    cost is O(occupied cells), corpus-scale work ends at the first agg.
    """
    cells = cell_counts(pts, eps)
    return hotspot_from_cells(cells)


def cell_counts(pts: DataFrame, eps: int) -> DataFrame:
    """Occupied-cell point counts — the ADDITIVE sufficient statistic of
    the hotspot report (cell counts merge by sum, so the streaming twin
    carries exactly this frame as state)."""
    return pts.select(
        F.expr(f"(x + {_OFF}) div {eps}").alias("cx"),
        F.expr(f"(y + {_OFF}) div {eps}").alias("cy"),
    ).groupBy("cx", "cy").agg(F.count(F.lit(1)).cast("long").alias("n"))


def hotspot_from_cells(cells: DataFrame) -> DataFrame:
    """The cell-scale tail of grid_hotspot_cells: totals, 3x3 offset
    replication, neighbor equi-join, integer ppm ratio."""
    cells = cells.persist()
    tot = cells.agg(
        F.sum("n").cast("long").alias("_N"),
        F.count(F.lit(1)).cast("long").alias("_C"))
    repl = (
        cells.withColumn("_ox", F.explode(F.expr("array(-1, 0, 1)")))
        .withColumn("_oy", F.explode(F.expr("array(-1, 0, 1)")))
        .select((F.col("cx") + F.col("_ox")).alias("cx"),
                (F.col("cy") + F.col("_oy")).alias("cy"),
                F.col("n").alias("_nn"))
    )
    nbhd = (
        cells.join(repl, ["cx", "cy"])
        .groupBy("cx", "cy", "n")
        .agg(F.sum("_nn").cast("long").alias("nbhd_n"),
             F.count(F.lit(1)).cast("long").alias("nbhd_cells"))
    )
    ratio = F.expr(
        "CAST((nbhd_n * _C * 1000000) div (nbhd_cells * _N) AS BIGINT)")
    return (
        nbhd.join(F.broadcast(tot))
        .select("cx", "cy", "n", "nbhd_n", "nbhd_cells",
                ratio.alias("density_ratio_ppm"),
                (ratio >= 2_000_000).alias("hot"))
    )


def GRID_HOTSPOT_SQL(points_sql: str, eps: int) -> str:
    return f"""
WITH pts AS ({points_sql}),
cells AS (
  SELECT (x + {_OFF}) // {eps} AS cx, (y + {_OFF}) // {eps} AS cy,
         CAST(count(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS N, CAST(count(*) AS BIGINT) AS C
  FROM cells
),
nbhd AS (
  SELECT c.cx, c.cy, c.n,
         CAST(sum(d.n) AS BIGINT) AS nbhd_n,
         CAST(count(*) AS BIGINT) AS nbhd_cells
  FROM cells c JOIN cells d
    ON d.cx BETWEEN c.cx - 1 AND c.cx + 1
   AND d.cy BETWEEN c.cy - 1 AND c.cy + 1
  GROUP BY 1, 2, 3
)
SELECT b.cx, b.cy, b.n, b.nbhd_n, b.nbhd_cells,
       CAST((b.nbhd_n * t.C * 1000000) // (b.nbhd_cells * t.N) AS BIGINT)
         AS density_ratio_ppm,
       (b.nbhd_n * t.C * 1000000) // (b.nbhd_cells * t.N) >= 2000000 AS hot
FROM nbhd b CROSS JOIN tot t
"""
