"""Robust distributed-model-merge operators (the parameter-server view).

The reference's hub merges spoke models by plain averaging
(FlinkHub / the protocol suite, ParameterServerModel merge — SURVEY
§2.9); production parameter servers additionally defend the merge
against stragglers-gone-wrong and Byzantine workers with coordinate-wise
robust aggregators (trimmed mean, median — Yin et al., ICML 2018) and
cut update bytes with top-k gradient sparsification (Aji & Heafield,
EMNLP 2017).  Both are pure keyed aggregations — exactly the shapes the
BSP inversion already uses for the plain merge — so they slot into the
engine as first-class operators.

Spoke gradients are PLANTED deterministically from lineitem (the
operators/pii.py discipline — the synthetic tables carry no model
updates): spoke s = l_orderkey % n_spokes, and coordinate j of spoke
s's update is

    g(s, j) = Σ_rows qy * (((l_partkey + 3*j) % 7) - 3),
    qy = round(l_extendedprice * 100)    (exact cents BIGINT)

— a real fact-table aggregation whose cost model matches a genuine
per-spoke gradient reduce (one scan, one keyed shuffle with map-side
combine; the coordinate explode multiplies ROWS INTO THE COMBINER, not
into the shuffle: at most n_spokes x dim partial rows leave each
partition whatever the scan size).  Byzantine spokes then corrupt their
vector POST-aggregation with a deterministic additive blow-up — the
attack the robust merge must survive.

Exactness: everything is BIGINT until the final mean/median divisions,
which ride the shared possibly-negative floor-division text
(CAST(floor(x / k) AS BIGINT) — Spark ``div`` truncates toward zero
where DuckDB ``//`` floors, so neither operator appears on a signed
value anywhere in this module).  Envelope: |per-row term| <= 3 * qy
<= ~3e7; int64 sums stay exact past 3e11 rows per (spoke, coord) —
far beyond 100 TB of lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_SPOKES = 8
DIM = 16
BYZANTINE = (2, 5)          # corrupted spoke ids
_BLOWUP = 1000000007        # per-coord additive corruption scale

# shared per-row gradient term (identical text both engines; all mod
# operands non-negative, where Spark % and DuckDB % agree)
_G_TERM = ("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
           " * (((l_partkey + 3 * coord) % 7) - 3)")

# possibly-negative exact integer division by a positive constant —
# the engine-gotchas floor text
def _fdiv(num: str, den: int) -> str:
    return (f"CAST(floor(CAST({num} AS DOUBLE) / {den}.0) AS BIGINT)")


def spoke_gradients(lineitem: DataFrame,
                    corrupt: bool = False) -> DataFrame:
    """(spoke, coord, g): per-spoke planted gradient vectors.  One scan,
    one (spoke, coord)-keyed aggregation; ``corrupt=True`` applies the
    additive Byzantine blow-up to spokes 2 and 5 post-aggregation."""
    g = (
        lineitem
        .select(
            F.expr(f"l_orderkey % {N_SPOKES}").cast("long").alias("spoke"),
            "l_partkey", "l_extendedprice",
        )
        .select(
            "spoke", "l_partkey", "l_extendedprice",
            F.explode(F.sequence(F.lit(0), F.lit(DIM - 1))).alias("coord"),
        )
        .groupBy("spoke", "coord")
        .agg(F.sum(F.expr(_G_TERM)).cast("long").alias("g"))
    )
    if corrupt:
        byz = ", ".join(str(s) for s in BYZANTINE)
        # CAST the blow-up scale: coord is 32-bit (sequence of int
        # literals) and ANSI Spark errors on int32 overflow
        g = g.withColumn(
            "g",
            F.expr(f"CASE WHEN spoke IN ({byz})"
                   f" THEN g + CAST({_BLOWUP} AS BIGINT) * (coord + 1)"
                   " ELSE g END").cast("long"),
        )
    return g


def SPOKE_GRADIENTS_SQL(corrupt: bool = False,
                        table: str = "lineitem") -> str:
    byz = ", ".join(str(s) for s in BYZANTINE)
    gexpr = (f"CASE WHEN spoke IN ({byz})"
             f" THEN g + CAST({_BLOWUP} AS BIGINT) * (coord + 1)"
             " ELSE g END"
             if corrupt else "g")
    # DuckDB can't reference the same-SELECT alias inside the aggregate,
    # so the shared gradient term binds r.range directly
    g_term = _G_TERM.replace("coord", "r.range")
    return f"""
SELECT spoke, coord, CAST({gexpr} AS BIGINT) AS g
FROM (
  SELECT CAST(l_orderkey % {N_SPOKES} AS BIGINT) AS spoke,
         CAST(r.range AS BIGINT) AS coord,
         CAST(sum({g_term}) AS BIGINT) AS g
  FROM {table} CROSS JOIN range({DIM}) AS r
  GROUP BY 1, 2
)
"""


def robust_federated_merge(lineitem: DataFrame,
                           trim: int = 2) -> DataFrame:
    """Coordinate-wise robust merge of the 8 spoke vectors with spokes
    2 and 5 Byzantine-corrupted: per coordinate, the plain mean (what
    the reference's averaging hub would compute — wrecked by the
    corruption), the ``trim``-each-side trimmed mean, and the median
    (robust, |BYZANTINE| < trim+1 and < n/2).

    Output (coord, mean_q, trimmed_mean_q, median_q) — 16 rows.  The
    order-statistics window partitions by coord over n_spokes rows, so
    its cost is dim x n_spokes regardless of corpus size; the scan-side
    cost lives in spoke_gradients."""
    return robust_merge_from_gradients(
        _corrupt(spoke_gradients(lineitem, corrupt=False)), trim)


def _corrupt(g: DataFrame) -> DataFrame:
    """The deterministic Byzantine blow-up, applied POST-aggregation —
    shared by the batch path and the streaming twin (whose carried
    state is the HONEST additive partial sums; corruption is a report-
    time transform, so folding stays a plain keyed sum)."""
    byz = ", ".join(str(s) for s in BYZANTINE)
    return g.withColumn(
        "g",
        F.expr(f"CASE WHEN spoke IN ({byz})"
               f" THEN g + CAST({_BLOWUP} AS BIGINT) * (coord + 1)"
               " ELSE g END").cast("long"),
    )


def robust_merge_from_gradients(g: DataFrame,
                                trim: int = 2) -> DataFrame:
    """The robust-merge report from a (spoke, coord, g) gradient frame."""
    w = Window.partitionBy("coord").orderBy("g", "spoke")
    ranked = g.select(
        "coord", "g", F.row_number().over(w).alias("rk"))
    n, lo, hi = N_SPOKES, trim + 1, N_SPOKES - trim
    m1, m2 = n // 2, n // 2 + 1
    return (
        ranked.groupBy("coord")
        .agg(
            F.sum("g").alias("_sum"),
            F.sum(F.when((F.col("rk") >= lo) & (F.col("rk") <= hi),
                         F.col("g"))).alias("_tsum"),
            F.sum(F.when(F.col("rk").isin(m1, m2), F.col("g")))
            .alias("_msum"),
        )
        .select(
            F.col("coord").cast("long").alias("coord"),
            F.expr(_fdiv("_sum", n)).alias("mean_q"),
            F.expr(_fdiv("_tsum", hi - lo + 1)).alias("trimmed_mean_q"),
            F.expr(_fdiv("_msum", 2)).alias("median_q"),
        )
        .orderBy("coord")
    )


def ROBUST_MERGE_SQL(trim: int = 2, table: str = "lineitem") -> str:
    n, lo, hi = N_SPOKES, trim + 1, N_SPOKES - trim
    m1, m2 = n // 2, n // 2 + 1
    return f"""
WITH g AS ({SPOKE_GRADIENTS_SQL(corrupt=True, table=table)}),
ranked AS (
  SELECT coord, g,
         row_number() OVER (PARTITION BY coord ORDER BY g, spoke) AS rk
  FROM g
),
agg AS (
  SELECT coord,
         sum(g) AS _sum,
         sum(CASE WHEN rk BETWEEN {lo} AND {hi} THEN g END) AS _tsum,
         sum(CASE WHEN rk IN ({m1}, {m2}) THEN g END) AS _msum
  FROM ranked GROUP BY 1
)
SELECT CAST(coord AS BIGINT) AS coord,
       {_fdiv('_sum', n)} AS mean_q,
       {_fdiv('_tsum', hi - lo + 1)} AS trimmed_mean_q,
       {_fdiv('_msum', 2)} AS median_q
FROM agg
"""


def topk_sparse_merge(lineitem: DataFrame, k: int = 4) -> DataFrame:
    """Top-k gradient sparsification at the merge: each spoke ships only
    its ``k`` largest-|g| coordinates (rank ties broken by coord); the
    hub sums what arrives.  Per coordinate: the dense merge, the sparse
    merge, how many spokes shipped it, and the L1 mass the sparsifier
    dropped — the exact accounting an error-feedback residual would
    carry to the next round.

    Output (coord, dense_sum_q, sparse_sum_q, n_kept_spokes,
    l1_dropped_q) — 16 rows; same cost shape as the robust merge."""
    g = spoke_gradients(lineitem, corrupt=False)
    w = Window.partitionBy("spoke").orderBy(
        F.abs(F.col("g")).desc(), "coord")
    ranked = g.select(
        "coord", "g", (F.row_number().over(w) <= k).alias("kept"))
    return (
        ranked.groupBy("coord")
        .agg(
            F.sum("g").cast("long").alias("dense_sum_q"),
            F.sum(F.when(F.col("kept"), F.col("g")).otherwise(0))
            .cast("long").alias("sparse_sum_q"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("long").alias("n_kept_spokes"),
            F.sum(F.when(~F.col("kept"), F.abs(F.col("g"))).otherwise(0))
            .cast("long").alias("l1_dropped_q"),
        )
        .select(F.col("coord").cast("long").alias("coord"),
                "dense_sum_q", "sparse_sum_q", "n_kept_spokes",
                "l1_dropped_q")
        .orderBy("coord")
    )


def TOPK_SPARSE_SQL(k: int = 4, table: str = "lineitem") -> str:
    return f"""
WITH g AS ({SPOKE_GRADIENTS_SQL(corrupt=False, table=table)}),
ranked AS (
  SELECT coord, g,
         row_number() OVER (PARTITION BY spoke
                            ORDER BY abs(g) DESC, coord) <= {k} AS kept
  FROM g
)
SELECT CAST(coord AS BIGINT) AS coord,
       CAST(sum(g) AS BIGINT) AS dense_sum_q,
       CAST(sum(CASE WHEN kept THEN g ELSE 0 END) AS BIGINT)
         AS sparse_sum_q,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept_spokes,
       CAST(sum(CASE WHEN NOT kept THEN abs(g) ELSE 0 END) AS BIGINT)
         AS l1_dropped_q
FROM ranked
GROUP BY 1
"""


# Adam hyperparameters as exact rationals (Kingma & Ba 2015 defaults):
# β1 = 9/10, β2 = 999/1000, lr = 1e-3, eps = 1e-8
ADAM_T2_M_DEN = 19           # 1 - β1² = 19/100  (bias correction, t=2)
ADAM_T2_V_DEN = 1999         # 1 - β2² = 1999/1e6


def adam_hub_rounds(lineitem: DataFrame) -> DataFrame:
    """TWO Adam optimizer steps applied at the hub to consecutive
    merged gradients — the optimizer-state half the reference's
    averaging hub leaves on the table (FlinkHub merges models;
    production parameter servers keep (m, v) moments server-side and
    apply Adam to each merged update, Kingma & Ba 2015).

    Batch gradients are planted from the SAME fact scan that feeds
    robust_merge (spoke plants, module header): step 1 merges the
    even-orderkey rows' gradient, step 2 the odd rows' — both arrive
    from ONE scan as conditional sums, then everything downstream is
    row-local arithmetic on the 16 coordinate rows.

    Exactness: gradients downscale to unit grid (g' = floor(g/1e6) —
    the µ-cents sums are ~1e10 at sf0.1, so g'² stays int64-exact to
    ~3e9 per coord); the moment recurrences are exact integer
    divisions by the rational (1-β) constants —
        m_t = floor((9·m_{t-1} + g_t) / 10)
        v_t = floor((999·v_{t-1} + g_t²) / 1000)
    — and the ONE float expression per step is the Adam ratio
    lr·m̂/(√v̂+ε) on identical integer operands: multiply, sqrt, add,
    divide, floor — every op IEEE correctly-rounded, so the µ-update
    is bit-identical cross-engine.  Bias correction uses the exact
    rationals 1-β^t (10/1, 1000/1 at t=1; 100/19, 1e6/1999 at t=2).

    Output: (coord, g1_u, g2_u, m2_u, v2_u, upd1_micro, upd2_micro).

    Scale: one fact scan -> 16-row coordinate aggregate (map-side
    combined conditional sums); the optimizer math is free."""
    return adam_from_gradients(adam_gradient_counts(lineitem))


def adam_gradient_counts(lineitem: DataFrame) -> DataFrame:
    """(coord, g1_q, g2_q): the two batch gradients as conditional sums
    — the Adam report's ADDITIVE sufficient statistic (plain keyed sums
    merge by addition), the carried state of the streaming twin."""
    return (
        lineitem
        .select(
            F.expr("l_orderkey % 2").cast("long").alias("par"),
            "l_partkey", "l_extendedprice",
        )
        .select(
            "par", "l_partkey", "l_extendedprice",
            F.explode(F.sequence(F.lit(0), F.lit(DIM - 1))).alias("coord"),
        )
        .groupBy("coord")
        .agg(
            F.sum(F.expr(f"CASE WHEN par = 0 THEN {_G_TERM} ELSE 0 END"))
            .cast("long").alias("g1_q"),
            F.sum(F.expr(f"CASE WHEN par = 1 THEN {_G_TERM} ELSE 0 END"))
            .cast("long").alias("g2_q"),
        )
    )


def adam_from_gradients(g: DataFrame) -> DataFrame:
    """The two-step Adam report from a (coord, g1_q, g2_q) frame."""
    steps = g.select(
        F.col("coord").cast("long").alias("coord"),
        F.expr(_fdiv("g1_q", 1_000_000)).alias("g1_u"),
        F.expr(_fdiv("g2_q", 1_000_000)).alias("g2_u"),
    ).select(
        "coord", "g1_u", "g2_u",
        F.expr(_fdiv("g1_u", 10)).alias("m1"),
        F.expr(_fdiv("g1_u * g1_u", 1000)).alias("v1"),
    ).select(
        "coord", "g1_u", "g2_u", "m1", "v1",
        F.expr(_fdiv("9 * m1 + g2_u", 10)).alias("m2"),
        F.expr(_fdiv("999 * v1 + g2_u * g2_u", 1000)).alias("v2"),
    )
    upd = (
        "CAST(floor(1000.0 * CAST({mh} AS DOUBLE)"
        " / (sqrt(CAST({vh} AS DOUBLE)) + 1e-8)) AS BIGINT)"
    )
    return steps.select(
        "coord", "g1_u", "g2_u",
        F.col("m2").cast("long").alias("m2_u"),
        F.col("v2").cast("long").alias("v2_u"),
        F.expr(upd.format(mh="10 * m1", vh="1000 * v1"))
        .alias("upd1_micro"),
        F.expr(upd.format(
            mh=_fdiv("100 * m2", ADAM_T2_M_DEN),
            vh=f"(1000000 * v2) div {ADAM_T2_V_DEN}",
        )).alias("upd2_micro"),
    )


def ADAM_HUB_SQL(table: str = "lineitem") -> str:
    g_term = _G_TERM.replace("coord", "r.range")
    upd = ("CAST(floor(1000.0 * CAST({mh} AS DOUBLE)"
           " / (sqrt(CAST({vh} AS DOUBLE)) + 1e-8)) AS BIGINT)")
    return f"""
WITH g AS (
  SELECT CAST(r.range AS BIGINT) AS coord,
         CAST(sum(CASE WHEN l_orderkey % 2 = 0 THEN {g_term} ELSE 0 END)
              AS BIGINT) AS g1_q,
         CAST(sum(CASE WHEN l_orderkey % 2 = 1 THEN {g_term} ELSE 0 END)
              AS BIGINT) AS g2_q
  FROM {table} CROSS JOIN range({DIM}) AS r
  GROUP BY 1
),
u AS (
  SELECT coord, {_fdiv('g1_q', 1_000_000)} AS g1_u,
         {_fdiv('g2_q', 1_000_000)} AS g2_u
  FROM g
),
s1 AS (
  SELECT coord, g1_u, g2_u,
         {_fdiv('g1_u', 10)} AS m1,
         {_fdiv('g1_u * g1_u', 1000)} AS v1
  FROM u
),
s2 AS (
  SELECT coord, g1_u, g2_u, m1, v1,
         {_fdiv('9 * m1 + g2_u', 10)} AS m2,
         {_fdiv('999 * v1 + g2_u * g2_u', 1000)} AS v2
  FROM s1
)
SELECT coord, g1_u, g2_u,
       CAST(m2 AS BIGINT) AS m2_u,
       CAST(v2 AS BIGINT) AS v2_u,
       {upd.format(mh='10 * m1', vh='1000 * v1')} AS upd1_micro,
       {upd.format(mh=_fdiv('100 * m2', ADAM_T2_M_DEN),
                   vh=f'(1000000 * v2) // {ADAM_T2_V_DEN}')}
         AS upd2_micro
FROM s2
"""


CLIP_NORM_Q = 50_000_000_000   # clip bound C in the µ-cents gradient grid


def clipped_merge_report(lineitem: DataFrame,
                         clip_q: int = CLIP_NORM_Q) -> DataFrame:
    """Per-example-style gradient clipping at the hub (the deterministic
    half of DP-SGD, Abadi et al. CCS 2016 — the Gaussian noise is the
    caller's business; what the ENGINE owes is the exact clipped
    aggregate and the clipping diagnostics): every spoke's update is
    rescaled to L2 norm <= C before merging, and the report carries the
    numbers a privacy accountant and a tuning loop both need — how many
    spokes clipped and what the clipped merge looks like next to the
    raw one.

    Exactness: ||g||² is an exact BIGINT; the clip factor min(1, C/||g||)
    exists only inside the per-coordinate expression
    floor(g_j · C / sqrt(||g||²)) — multiply, sqrt, divide, floor on
    identical integer operands (all IEEE correctly-rounded) — and each
    clipped coordinate is quantized BEFORE the cross-spoke sum
    (quantize-then-sum, the repo's exactness envelope).  Envelope:
    g_j · C <= ~1e13 · 5e10 needs the double's 53-bit mantissa only for
    the ROUNDED product (exact to 2^53 ≈ 9e15; g_j at sf0.1 is ~1e10,
    product ~5e20 — so g_j is pre-scaled to the unit grid first, g_j/1e6,
    keeping every float operand under 2^53 through sf ~ 100).

    Output (coord, raw_sum_u, clipped_sum_u, n_clipped_spokes,
    max_norm_u): 16 rows; the scan cost is spoke_gradients', everything
    after is |spokes|x|coords| arithmetic.  The C² comparison constant
    is a PYTHON-computed numeric literal (Spark reads big literals as
    DECIMAL, DuckDB as HUGEINT), so no runtime int64 product can
    overflow whatever clip the caller picks."""
    g = spoke_gradients(lineitem, corrupt=False).select(
        "spoke", "coord", F.expr(_fdiv("g", 1_000_000)).alias("gu"))
    clip_u = clip_q // 1_000_000
    norms = g.groupBy("spoke").agg(
        F.sum(F.expr("gu * gu")).cast("long").alias("n2"))
    j = g.join(F.broadcast(norms), "spoke")
    clipped = j.select(
        "spoke", "coord", "gu", "n2",
        F.expr(
            f"CASE WHEN n2 <= {clip_u * clip_u} THEN gu"
            f" ELSE CAST(floor(CAST(gu AS DOUBLE) * {clip_u}.0"
            f" / sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) END").alias("gc"),
    )
    return (
        clipped.groupBy("coord")
        .agg(
            F.sum("gu").cast("long").alias("raw_sum_u"),
            F.sum("gc").cast("long").alias("clipped_sum_u"),
            F.sum(F.expr(
                f"CASE WHEN n2 > {clip_u * clip_u}"
                " THEN 1 ELSE 0 END")).cast("long")
            .alias("n_clipped_spokes"),
            F.max(F.expr("CAST(floor(sqrt(CAST(n2 AS DOUBLE))) AS BIGINT)"))
            .cast("long").alias("max_norm_u"),
        )
        .select(F.col("coord").cast("long").alias("coord"),
                "raw_sum_u", "clipped_sum_u", "n_clipped_spokes",
                "max_norm_u")
    )


def CLIPPED_MERGE_SQL(clip_q: int = CLIP_NORM_Q,
                      table: str = "lineitem") -> str:
    clip_u = clip_q // 1_000_000
    return f"""
WITH g0 AS ({SPOKE_GRADIENTS_SQL(corrupt=False, table=table)}),
g AS (
  SELECT spoke, coord, {_fdiv('g', 1_000_000)} AS gu FROM g0
),
norms AS (
  SELECT spoke, CAST(sum(gu * gu) AS BIGINT) AS n2 FROM g GROUP BY 1
),
clipped AS (
  SELECT g.spoke, g.coord, g.gu, n.n2,
         CASE WHEN n.n2 <= {clip_u * clip_u} THEN g.gu
         ELSE CAST(floor(CAST(g.gu AS DOUBLE) * {clip_u}.0
                         / sqrt(CAST(n.n2 AS DOUBLE))) AS BIGINT) END AS gc
  FROM g JOIN norms n USING (spoke)
)
SELECT CAST(coord AS BIGINT) AS coord,
       CAST(sum(gu) AS BIGINT) AS raw_sum_u,
       CAST(sum(gc) AS BIGINT) AS clipped_sum_u,
       CAST(sum(CASE WHEN n2 > {clip_u * clip_u}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_spokes,
       CAST(max(CAST(floor(sqrt(CAST(n2 AS DOUBLE))) AS BIGINT))
            AS BIGINT) AS max_norm_u
FROM clipped
GROUP BY 1
"""
