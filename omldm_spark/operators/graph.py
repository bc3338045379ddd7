"""Iterative graph analytics as DataFrame rounds (beyond-reference §2.11).

PageRank here is the all-integer, fixed-round variant: rank state lives in
BIGINT micro-units and every per-round contribution is an integer division,
so R rounds produce BIT-IDENTICAL state on any engine and any partitioning
(float PageRank re-associates sums across partitions and drifts in the last
ulps — unacceptable for a cross-engine oracle).  The reference has no graph
surface; this extends the engine the same way the dedup/ANN families do,
with the recurrence declared once and the DuckDB oracle generated as R
chained CTEs from the same constants.

Scale shape (100 TB): edges are the corpus-scale relation and are shuffled
ONCE by src into the per-round join; rank state is vertex-scale and
re-shuffles by vertex id each round (unavoidable for power iteration —
GraphX/Pregel does the same vertex-state exchange).  At billions of vertices
neither side is broadcastable and the joins degrade gracefully to
co-partitioned shuffle joins on the same key, which AQE picks without hints;
each round's state should be checkpointed in production to cut lineage
(documented, not forced, here — R is small in the contract query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Damping 0.85 as the integer ratio 850/1000; rank unit = 1e6 micro-rank.
INIT_PR = 1_000_000
BASE_PR = 150_000
DAMP_NUM = 850
DAMP_DEN = 1000


def pagerank_rounds(edges: DataFrame, rounds: int) -> DataFrame:
    """Run ``rounds`` integer power-iteration steps over a directed edge
    list (columns ``src``, ``dst``; every vertex must appear as a src —
    feed symmetric edges or pre-handle danglers).

    Recurrence (all BIGINT, div = truncating integer division):

        pr_{t+1}(v) = BASE_PR + sum_{(u,v) in E} (pr_t(u) * 850) div (1000 * outdeg(u))

    Per round: ranks+deg join edges on src (map-side under AQE when the
    vertex state is small; co-partitioned shuffle join at scale), then ONE
    groupBy(dst) with map-side partial sums.  Mass lost to floor division
    is deliberate — determinism buys the exact oracle."""
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    ranks = deg.select(
        F.col("src").alias("v"), F.lit(INIT_PR).cast("long").alias("pr")
    )
    for _ in range(rounds):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["v"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("v"),
                F.expr(
                    f"(pr * CAST({DAMP_NUM} AS BIGINT))"
                    f" div (CAST({DAMP_DEN} AS BIGINT) * outdeg)"
                ).alias("c"),
            )
        )
        ranks = contrib.groupBy("v").agg(
            (F.lit(BASE_PR).cast("long") + F.sum("c").cast("long"))
            .cast("long").alias("pr")
        )
    return ranks


# Shared derivation: the bipartite user <-> props.k interaction graph from
# the event log.  Vertex ids are disjoint by parity (user*2, k*2+1); every
# edge is emitted in both directions so no vertex dangles.  regexp_extract /
# CAST text is identical in Spark and DuckDB.
PAIRS_SQL = """
SELECT DISTINCT user_id AS u,
       CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS k
FROM events
"""

EDGES_SQL = """
SELECT u * 2 AS src, k * 2 + 1 AS dst FROM pairs
UNION ALL
SELECT k * 2 + 1 AS src, u * 2 AS dst FROM pairs
"""


def PAGERANK_EVENTS_SQL(rounds: int, idiv: str = "//") -> str:
    """The chained-CTE DuckDB oracle: same constants, same truncating
    integer division (``//`` in DuckDB, ``div`` in Spark — all operands
    positive, so both truncate to the same floor)."""
    ctes = [
        f"pairs AS ({PAIRS_SQL})",
        f"edges AS ({EDGES_SQL})",
        "deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS outdeg"
        " FROM edges GROUP BY src)",
        f"r0 AS (SELECT v, CAST({INIT_PR} AS BIGINT) AS pr FROM deg)",
    ]
    for t in range(rounds):
        ctes.append(
            f"""r{t + 1} AS (
  SELECT e.dst AS v,
         CAST({BASE_PR} + sum((r.pr * CAST({DAMP_NUM} AS BIGINT))
              {idiv} (CAST({DAMP_DEN} AS BIGINT) * d.outdeg)) AS BIGINT) AS pr
  FROM edges e
  JOIN r{t} r ON e.src = r.v
  JOIN deg d ON e.src = d.v
  GROUP BY e.dst
)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT v, pr FROM r{rounds}"
    )


# ---------------------------------------------------------------------------
# Multi-source BFS (shortest unweighted hop distance)
# ---------------------------------------------------------------------------

def bfs_rounds(edges: DataFrame, seeds: DataFrame, rounds: int) -> DataFrame:
    """``rounds`` synchronous BFS expansions from a seed vertex set over a
    directed edge list (``src``, ``dst``): after round R, every vertex
    whose hop distance from the nearest seed is <= R carries that EXACT
    distance (min-plus semiring power iteration — the label-correcting
    twin of pagerank_rounds' sum-times iteration).

    State after each round is the REACHED set only (frontier + interior),
    so early rounds are tiny however large the graph; each round is one
    join of edges with the reached set keyed by src + one min-groupBy on
    dst with map-side combine. All-BIGINT distances — bit-identical on any
    engine/partitioning, so the oracle is the same recurrence as chained
    CTEs. At diameter-many rounds this IS single-source/multi-source
    shortest paths for unweighted graphs; weighted min-plus drops in by
    replacing d + 1 with d + w."""
    reached = seeds.select(
        F.col("v").cast("long").alias("v"),
        F.lit(0).cast("long").alias("d"),
    ).distinct()
    for _ in range(rounds):
        expanded = edges.join(reached, edges["src"] == reached["v"]).select(
            F.col("dst").alias("v"), (F.col("d") + 1).cast("long").alias("d")
        )
        reached = (
            reached.unionByName(expanded)
            .groupBy("v")
            .agg(F.min("d").cast("long").alias("d"))
        )
    return reached


def BFS_EVENTS_SQL(rounds: int, seed_pred: str = "user_id < 3") -> str:
    """Chained-CTE DuckDB oracle for bfs_rounds over the bipartite
    user <-> props.k event graph (PAIRS_SQL/EDGES_SQL), seeded from the
    user vertices matching ``seed_pred``."""
    ctes = [
        f"pairs AS ({PAIRS_SQL})",
        f"edges AS ({EDGES_SQL})",
        "r0 AS (SELECT DISTINCT user_id * 2 AS v, CAST(0 AS BIGINT) AS d"
        f" FROM events WHERE {seed_pred})",
    ]
    for t in range(rounds):
        ctes.append(
            f"""r{t + 1} AS (
  SELECT v, CAST(min(d) AS BIGINT) AS d FROM (
    SELECT v, d FROM r{t}
    UNION ALL
    SELECT e.dst AS v, r.d + 1 AS d FROM edges e JOIN r{t} r ON e.src = r.v
  ) GROUP BY v
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT v, CAST(v % 2 AS BIGINT) AS is_item,
       CAST(v // 2 AS BIGINT) AS orig_id, d
FROM r{rounds}"""
    )
