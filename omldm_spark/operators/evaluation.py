"""Model-evaluation metrics at corpus scale: exact AUC.

Beyond-reference surface in the reference's own domain (OMLDM reports
score/loss per QueryResponse, FlinkSpoke query path, but has no ranking
metric): AUC-ROC for a binary label against a real-valued score — the
metric every scoring-model pipeline reports.

The scale problem with textbook AUC is the GLOBAL RANK: a window over all
scores funnels the corpus through one task. This operator never ranks:

    AUC = P(s_pos > s_neg) + P(s_pos = s_neg)/2
        = [ Σ_s np_s * (2 * nn_<s + nn_s) ] / (2 * np * nn)

computed over the QUANTIZED-SCORE HISTOGRAM — one hash-groupBy collapses
the corpus to at most |quant levels| rows (bounded by the quantization
range, NOT the corpus), and the cumulative negative count runs over that
tiny histogram. The only ordered pass is histogram-sized; the corpus
pass is one map-side-combinable aggregation.

Exactness: scores quantize to integers (ties become exact integer
equality — deterministic on both engines, unlike float ties), every
count/cumsum/pair-product is BIGINT, and the final AUC is emitted as the
integral division (num * 500000) div (np * nn) — microunit-exact,
engine-identical. Overflow envelope: num <= 2 * np * nn <= 2 * (n/2)^2;
with DECIMAL(38,0)/HUGEINT intermediates this holds to n ~ 1e18.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc_exact(df: DataFrame, label_col, score_col,
              quant: int = 100) -> DataFrame:
    """One-row (n_pos, n_neg, auc_q) with auc_q = floor(1e6 * AUC).
    ``label_col`` boolean Column; ``score_col`` numeric column/name."""
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    sq = F.round(score.cast("double") * quant, 0).cast("long")
    hist = (
        df.select(
            sq.alias("sq"),
            label_col.cast("int").alias("_pos"),
        )
        .groupBy("sq")
        .agg(
            F.sum("_pos").cast("long").alias("np_s"),
            F.sum(1 - F.col("_pos")).cast("long").alias("nn_s"),
        )
    )
    w = (
        Window.orderBy("sq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # cum_nn includes the current bucket; nn_<s = cum_nn - nn_s
    contrib = hist.select(
        "np_s", "nn_s",
        (F.sum("nn_s").over(w) - F.col("nn_s")).alias("nn_lt"),
    ).select(
        "np_s", "nn_s",
        (
            F.col("np_s").cast("decimal(38,0)")
            * (2 * F.col("nn_lt") + F.col("nn_s"))
        ).alias("_num_s"),
        F.col("np_s").alias("_np"),
        F.col("nn_s").alias("_nn"),
    )
    return contrib.agg(
        F.sum("_np").cast("long").alias("n_pos"),
        F.sum("_nn").cast("long").alias("n_neg"),
        F.expr(
            "CAST((sum(_num_s) * 500000) div "
            "(sum(CAST(_np AS DECIMAL(38,0))) * sum(_nn)) AS BIGINT)"
        ).alias("auc_q"),
    )


def AUC_SQL(label_expr: str, score_expr: str, table: str,
            quant: int = 100) -> str:
    return f"""
WITH hist AS (
  SELECT CAST(round(CAST({score_expr} AS DOUBLE) * {quant}, 0) AS BIGINT)
           AS sq,
         CAST(sum(CASE WHEN {label_expr} THEN 1 ELSE 0 END) AS BIGINT)
           AS np_s,
         CAST(sum(CASE WHEN {label_expr} THEN 0 ELSE 1 END) AS BIGINT)
           AS nn_s
  FROM {table}
  GROUP BY 1
),
contrib AS (
  SELECT np_s, nn_s,
         CAST(sum(nn_s) OVER (ORDER BY sq
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nn_s
           AS BIGINT) AS nn_lt
  FROM hist
)
SELECT CAST(sum(np_s) AS BIGINT) AS n_pos,
       CAST(sum(nn_s) AS BIGINT) AS n_neg,
       CAST((sum(CAST(np_s AS HUGEINT) * (2 * nn_lt + nn_s)) * 500000)
            // (sum(CAST(np_s AS HUGEINT)) * sum(nn_s)) AS BIGINT) AS auc_q
FROM contrib
"""


def calibration_bins(df: DataFrame, label_col, score_col,
                     n_bins: int = 10, lo: float = 0.0,
                     hi: float = 1.0) -> DataFrame:
    """Reliability diagram data: equal-width score bins on [lo, hi) ->
    (bin_idx, n, n_pos, rate_ppm) with rate_ppm = floor(1e6 * n_pos / n).
    The companion diagnostic to auc_exact (AUC ranks; calibration checks
    the scores MEAN what they say).

    Scale/exactness: bin assignment is row-local integer arithmetic on the
    quantized score (floor of a scaled difference — no float binning, so a
    score on a bin edge lands identically on both engines); one map-side
    combinable groupBy over at most n_bins keys; the rate is an integral
    division. Scores outside [lo, hi) clamp into the edge bins (standard
    reliability-plot behavior)."""
    Q = 1_000_000
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    sq = F.round(score.cast("double") * Q, 0).cast("long")
    loq, hiq = int(round(lo * Q)), int(round(hi * Q))
    width = (hiq - loq) // n_bins
    if width <= 0:
        raise ValueError("empty bin range")
    raw = F.expr(f"(sq - {loq}) div {width}")
    bin_idx = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (
        df.select(sq.alias("sq"), label_col.cast("long").alias("_pos"))
        .select(bin_idx.cast("long").alias("bin_idx"), "_pos")
        .groupBy("bin_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_pos").cast("long").alias("n_pos"),
        )
        .select(
            "bin_idx", "n", "n_pos",
            F.expr("CAST((n_pos * 1000000) div n AS BIGINT)")
             .alias("rate_ppm"),
        )
    )


def CALIBRATION_SQL(label_expr: str, score_expr: str, table: str,
                    n_bins: int = 10, lo: float = 0.0,
                    hi: float = 1.0) -> str:
    Q = 1_000_000
    loq, hiq = int(round(lo * Q)), int(round(hi * Q))
    width = (hiq - loq) // n_bins
    return f"""
WITH b AS (
  SELECT least(greatest(
           (CAST(round(CAST({score_expr} AS DOUBLE) * {Q}, 0) AS BIGINT)
            - {loq}) // {width}, 0), {n_bins - 1}) AS bin_idx,
         CASE WHEN {label_expr} THEN 1 ELSE 0 END AS pos
  FROM {table}
)
SELECT CAST(bin_idx AS BIGINT) AS bin_idx,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST((sum(pos) * 1000000) // count(*) AS BIGINT) AS rate_ppm
FROM b
GROUP BY bin_idx
"""


# ---------------------------------------------------------------------------
# Multiclass confusion matrix + per-class precision/recall/F1
# ---------------------------------------------------------------------------

def classification_report(df: DataFrame, label_col, pred_col) -> DataFrame:
    """Per-class evaluation of a multiclass classifier at corpus scale:
    (label, n_true, n_pred, tp, precision_ppm, recall_ppm, f1_ppm).

    Scale shape: ONE corpus-scale groupBy collapses to the confusion
    cells — at most |classes|^2 rows, bounded by the label space, not the
    corpus — and every per-class sum runs over that tiny frame.  The
    corpus pass is map-side combinable; nothing downstream touches a row
    again.

    Exactness: counts are BIGINT; each ratio is ONE integral division
    floor(1e6 * num / den) (ppm), so the report is engine-identical.
    f1_ppm = floor(2e6 * tp / (n_true + n_pred)) — the harmonic mean
    computed from raw counts, not from the two rounded ratios.
    """
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    pred = F.col(pred_col) if isinstance(pred_col, str) else pred_col
    cells = (
        df.select(label.alias("label"), pred.alias("pred"))
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    by_true = cells.groupBy("label").agg(
        F.sum("n").cast("long").alias("n_true"),
        F.sum(F.when(F.col("pred") == F.col("label"), F.col("n"))
              .otherwise(F.lit(0))).cast("long").alias("tp"),
    )
    by_pred = cells.groupBy(F.col("pred").alias("label")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    rep = by_true.join(by_pred, "label", "full_outer").select(
        "label",
        F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
        F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
        F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
    )
    return rep.select(
        "label", "n_true", "n_pred", "tp",
        F.when(F.col("n_pred") > 0,
               F.expr("CAST((tp * 1000000) div n_pred AS BIGINT)"))
        .otherwise(F.lit(0)).alias("precision_ppm"),
        F.when(F.col("n_true") > 0,
               F.expr("CAST((tp * 1000000) div n_true AS BIGINT)"))
        .otherwise(F.lit(0)).alias("recall_ppm"),
        F.when(F.col("n_true") + F.col("n_pred") > 0,
               F.expr("CAST((tp * 2000000) div (n_true + n_pred) AS BIGINT)"))
        .otherwise(F.lit(0)).alias("f1_ppm"),
    )


def CLASSIFICATION_REPORT_SQL(label_expr: str, pred_expr: str,
                              table: str) -> str:
    return f"""
WITH cells AS (
  SELECT {label_expr} AS label, {pred_expr} AS pred,
         CAST(count(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1, 2
),
by_true AS (
  SELECT label, CAST(sum(n) AS BIGINT) AS n_true,
         CAST(sum(CASE WHEN pred = label THEN n ELSE 0 END) AS BIGINT) AS tp
  FROM cells GROUP BY label
),
by_pred AS (
  SELECT pred AS label, CAST(sum(n) AS BIGINT) AS n_pred FROM cells GROUP BY pred
),
rep AS (
  SELECT COALESCE(t.label, p.label) AS label,
         CAST(COALESCE(t.n_true, 0) AS BIGINT) AS n_true,
         CAST(COALESCE(p.n_pred, 0) AS BIGINT) AS n_pred,
         CAST(COALESCE(t.tp, 0) AS BIGINT) AS tp
  FROM by_true t FULL OUTER JOIN by_pred p ON t.label = p.label
)
SELECT label, n_true, n_pred, tp,
       CAST(CASE WHEN n_pred > 0 THEN (tp * 1000000) // n_pred ELSE 0 END
            AS BIGINT) AS precision_ppm,
       CAST(CASE WHEN n_true > 0 THEN (tp * 1000000) // n_true ELSE 0 END
            AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN n_true + n_pred > 0
                 THEN (tp * 2000000) // (n_true + n_pred) ELSE 0 END
            AS BIGINT) AS f1_ppm
FROM rep
"""


# ---------------------------------------------------------------------------
# Isotonic regression (synchronous pool-adjacent-violators rounds)
# ---------------------------------------------------------------------------

def isotonic_pava_rounds(blocks: DataFrame, rounds: int) -> DataFrame:
    """``rounds`` synchronous pool-adjacent-violators merges toward the
    isotonic (non-decreasing) fit of weighted rates (Ayer et al. 1955;
    PAVA's merge order is irrelevant to the fixpoint, which makes the
    BSP formulation exact): state is ordered blocks (bx, xmax, sy, w);
    each round flags every adjacent pair whose pooled means violate
    monotonicity — compared as the INTEGER cross product
    prev.sy * w > sy * prev.w, no float rates anywhere — then merges
    each maximal violating run in one gaps-and-islands pass (one
    ordered window + one grouped sum).

    The isotonic fit is THE calibration map for ML scores (the
    non-parametric alternative to Platt scaling) and the monotone-
    binning step in credit scoring.  At fixpoint the blocks are the
    unique isotonic solution; callers pin fixpoint by comparing rounds
    R and R+1 (tests do).  Scale: blocks live on the BUCKET key space
    (bounded by the upstream binning, not row count), so the global
    ordered windows ride aggregate-sized frames; the input aggregation
    is the only row-scale pass.  Integer envelope: sy * w < 2^63 —
    safe below ~3e9 weighted rows per side."""
    from pyspark.sql import Window

    cur = blocks.select(
        F.col("bx").cast("long").alias("bx"),
        F.col("xmax").cast("long").alias("xmax"),
        F.col("sy").cast("long").alias("sy"),
        F.col("w").cast("long").alias("w"),
    )
    wo = Window.orderBy("bx")
    run = Window.orderBy("bx").rowsBetween(Window.unboundedPreceding, 0)
    for _ in range(rounds):
        flagged = cur.select(
            "bx", "xmax", "sy", "w",
            F.when(
                F.lag("sy").over(wo).isNull()
                | ~(F.lag("sy").over(wo) * F.col("w")
                    > F.col("sy") * F.lag("w").over(wo)),
                1,
            ).otherwise(0).alias("flag"),
        ).select(
            "bx", "xmax", "sy", "w",
            F.sum("flag").over(run).cast("long").alias("grp"),
        )
        cur = flagged.groupBy("grp").agg(
            F.min("bx").cast("long").alias("bx"),
            F.max("xmax").cast("long").alias("xmax"),
            F.sum("sy").cast("long").alias("sy"),
            F.sum("w").cast("long").alias("w"),
        ).select("bx", "xmax", "sy", "w")
    return cur.select(
        "bx", "xmax", "sy", "w",
        F.expr("CAST((sy * 1000000) div w AS BIGINT)").alias("fit_ppm"),
    )


def ISOTONIC_ROUND_CTES(rounds: int, base: str = "b0") -> list[str]:
    """Chained-CTE unroll of the same synchronous PAVA recurrence:
    b0 must provide (bx, xmax, sy, w); yields b1..b{rounds}."""
    parts = []
    for t in range(rounds):
        src = base if t == 0 else f"b{t}"
        parts.append(f"""b{t + 1} AS (
  SELECT CAST(min(bx) AS BIGINT) AS bx, CAST(max(xmax) AS BIGINT) AS xmax,
         CAST(sum(sy) AS BIGINT) AS sy, CAST(sum(w) AS BIGINT) AS w
  FROM (
    SELECT bx, xmax, sy, w,
           CAST(sum(flag) OVER (ORDER BY bx ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS grp
    FROM (
      SELECT bx, xmax, sy, w,
             CASE WHEN lag(sy) OVER (ORDER BY bx) IS NULL
                       OR NOT (lag(sy) OVER (ORDER BY bx) * w
                               > sy * lag(w) OVER (ORDER BY bx))
                  THEN 1 ELSE 0 END AS flag
      FROM {src}
    )
  ) GROUP BY grp
)""")
    return parts


def roc_points(df: DataFrame, label_col, score_col,
               quant: int = 100) -> DataFrame:
    """Exact ROC curve points at every distinct quantized score
    threshold (predict positive when score_q >= t): per threshold
    (threshold_q, tp, fp, tpr_ppm, fpr_ppm).  The curve AUC_exact
    integrates is made inspectable — operating-point selection
    (max-F1, cost-weighted cutoffs) reads this frame directly.

    Same scale shape as auc_exact: ONE corpus-scale groupBy collapses
    to the quantized-score histogram (bounded by the quant domain, not
    rows); the cumulative window runs over that tiny frame."""
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    sq = F.round(score.cast("double") * quant, 0).cast("long")
    hist = (
        df.select(sq.alias("sq"), label_col.cast("int").alias("_pos"))
        .groupBy("sq")
        .agg(F.sum("_pos").cast("long").alias("np_s"),
             F.sum(1 - F.col("_pos")).cast("long").alias("nn_s"))
    )
    tot = hist.agg(F.sum("np_s").cast("long").alias("pos_tot"),
                   F.sum("nn_s").cast("long").alias("neg_tot"))
    w = Window.orderBy("sq").rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)
    cum = hist.select(
        "sq", "np_s", "nn_s",
        F.sum("np_s").over(w).cast("long").alias("cum_np"),
        F.sum("nn_s").over(w).cast("long").alias("cum_nn"),
    ).crossJoin(F.broadcast(tot))
    return cum.select(
        F.col("sq").alias("threshold_q"),
        (F.col("pos_tot") - F.col("cum_np") + F.col("np_s"))
        .cast("long").alias("tp"),
        (F.col("neg_tot") - F.col("cum_nn") + F.col("nn_s"))
        .cast("long").alias("fp"),
        F.expr("CAST((pos_tot - cum_np + np_s) * 1000000"
               " div pos_tot AS BIGINT)").alias("tpr_ppm"),
        F.expr("CAST((neg_tot - cum_nn + nn_s) * 1000000"
               " div neg_tot AS BIGINT)").alias("fpr_ppm"),
    )


def ROC_SQL(label_expr: str, score_expr: str, table: str,
            quant: int = 100) -> str:
    return f"""
WITH hist AS (
  SELECT CAST(round(CAST({score_expr} AS DOUBLE) * {quant}, 0) AS BIGINT)
           AS sq,
         CAST(sum(CASE WHEN {label_expr} THEN 1 ELSE 0 END) AS BIGINT)
           AS np_s,
         CAST(sum(CASE WHEN {label_expr} THEN 0 ELSE 1 END) AS BIGINT)
           AS nn_s
  FROM {table} GROUP BY 1
),
tot AS (
  SELECT CAST(sum(np_s) AS BIGINT) AS pos_tot,
         CAST(sum(nn_s) AS BIGINT) AS neg_tot
  FROM hist
),
cum AS (
  SELECT sq, np_s, nn_s,
         CAST(sum(np_s) OVER w AS BIGINT) AS cum_np,
         CAST(sum(nn_s) OVER w AS BIGINT) AS cum_nn
  FROM hist
  WINDOW w AS (ORDER BY sq ROWS UNBOUNDED PRECEDING)
)
SELECT sq AS threshold_q,
       CAST(pos_tot - cum_np + np_s AS BIGINT) AS tp,
       CAST(neg_tot - cum_nn + nn_s AS BIGINT) AS fp,
       CAST((pos_tot - cum_np + np_s) * 1000000 // pos_tot AS BIGINT)
         AS tpr_ppm,
       CAST((neg_tot - cum_nn + nn_s) * 1000000 // neg_tot AS BIGINT)
         AS fpr_ppm
FROM cum CROSS JOIN tot
"""


def pr_points(df: DataFrame, label_col, score_col,
              quant: int = 100) -> DataFrame:
    """Exact precision-recall curve points at every distinct quantized
    threshold — the class-imbalance companion of roc_points (PR is the
    curve that moves when positives are rare): per threshold
    (threshold_q, tp, fp, precision_ppm, recall_ppm).  Same
    histogram-collapse shape."""
    base = roc_points(df, label_col, score_col, quant)
    return base.select(
        "threshold_q", "tp", "fp",
        F.expr("CASE WHEN tp + fp = 0 THEN NULL ELSE"
               " CAST(tp * 1000000 div (tp + fp) AS BIGINT) END")
        .alias("precision_ppm"),
        F.col("tpr_ppm").alias("recall_ppm"),
    )


def PR_SQL(label_expr: str, score_expr: str, table: str,
           quant: int = 100) -> str:
    return f"""
WITH roc AS ({ROC_SQL(label_expr, score_expr, table, quant)})
SELECT threshold_q, tp, fp,
       CAST(CASE WHEN tp + fp = 0 THEN NULL
            ELSE tp * 1000000 // (tp + fp) END AS BIGINT)
         AS precision_ppm,
       tpr_ppm AS recall_ppm
FROM roc
"""


CHIMERGE_TAU_X1000 = 2706    # chi2(1 df, alpha=0.1) = 2.706, x1000


def chimerge_rounds(blocks: DataFrame, rounds: int) -> DataFrame:
    """``rounds`` synchronous ChiMerge passes (Kerber, AAAI 1992):
    supervised discretization that merges adjacent bins whose 2x2
    chi-square against the label falls below τ = 2.706 (90%, 1 df) —
    the credit-scoring / WoE-binning preprocessor, as the same
    gaps-and-islands BSP round as isotonic_pava_rounds (each pass
    merges every maximal run of adjacent below-threshold pairs; the
    classic algorithm merges one pair at a time, and the synchronous
    variant is the deterministic distributed formulation, exactly the
    Luby/JP/PAVA precedent).

    Input blocks: (bx, xmax, pos, neg) ordered by bx.  The comparison
    never divides: with pair counts (a1,b1),(a2,b2), r_i = a_i+b_i,
    c1 = a1+a2, c2 = b1+b2, N = r1+r2,

        chi2 < τ  iff  1000·N·(a1·b2 − a2·b1)² < 2706·r1·r2·c1·c2,

    in DECIMAL(38,0)/HUGEINT on both engines; a pair with a zero label
    marginal (c1 = 0 or c2 = 0) has chi2 = 0 and always merges.
    Envelope, enforced: with both bins at m rows and full label
    separation the LHS reaches 1000·N·det² = 1000·2m·(m²)² = 2000·m⁵,
    which passes DECIMAL(38,0) (~1e38) — and HUGEINT (~1.7e38) — once
    m ≳ 8.7e6 (2000·m⁵ = 1e38 at m ≈ 8.7e6), where Spark's non-ANSI
    decimal overflow would silently stop merging while DuckDB raises.
    The guard therefore caps bins at 8·10^6 rows AND lives on the N
    operand INSIDE the chi² product itself, so it is evaluated exactly
    when the overflow-prone expression is — structurally consumed, not
    dependent on OR-disjunct evaluation order (a zero-marginal pair
    never evaluates the product, never overflows, and merges exactly
    without raising).  At that scale, chi-square significance against
    τ = 2.706 is meaningless anyway (everything is "significant");
    subsample or rescale upstream.

    Output: merged blocks + rate_ppm.  Scale: blocks live on the
    BOUNDED bucket domain; each round is one ordered window + one
    grouped sum over that bounded frame (the PAVA shape)."""
    cur = blocks.select(
        F.col("bx").cast("long").alias("bx"),
        F.col("xmax").cast("long").alias("xmax"),
        F.col("pos").cast("long").alias("pos"),
        F.col("neg").cast("long").alias("neg"),
    )
    wo = Window.orderBy("bx")
    run = Window.orderBy("bx").rowsBetween(Window.unboundedPreceding, 0)
    guarded_n = (
        "CASE WHEN greatest(p_pos + p_neg, pos + neg) <= 8000000"
        " THEN CAST(p_pos + p_neg + pos + neg AS DECIMAL(38,0))"
        " ELSE CAST(raise_error('chimerge: bins over 8e6"
        " rows — the exact chi2 compare would overflow DECIMAL(38);"
        " subsample upstream') AS DECIMAL(38,0)) END"
    )
    merge_pred = (
        "(p_pos + p_neg) IS NOT NULL AND ("
        " (p_pos + pos) = 0 OR (p_neg + neg) = 0 OR"
        f" 1000 * ({guarded_n})"
        "   * (CAST(p_pos AS DECIMAL(38,0)) * neg"
        "      - CAST(pos AS DECIMAL(38,0)) * p_neg)"
        "   * (CAST(p_pos AS DECIMAL(38,0)) * neg"
        "      - CAST(pos AS DECIMAL(38,0)) * p_neg)"
        f" < {CHIMERGE_TAU_X1000}"
        "   * CAST(p_pos + p_neg AS DECIMAL(38,0)) * (pos + neg)"
        "   * (p_pos + pos) * (p_neg + neg))"
    )
    for _ in range(rounds):
        flagged = cur.select(
            "bx", "xmax", "pos", "neg",
            F.lag("pos").over(wo).alias("p_pos"),
            F.lag("neg").over(wo).alias("p_neg"),
        ).select(
            "bx", "xmax", "pos", "neg",
            F.when(F.expr(merge_pred), 0).otherwise(1).alias("flag"),
        ).select(
            "bx", "xmax", "pos", "neg",
            F.sum("flag").over(run).cast("long").alias("grp"),
        )
        cur = flagged.groupBy("grp").agg(
            F.min("bx").cast("long").alias("bx"),
            F.max("xmax").cast("long").alias("xmax"),
            F.sum("pos").cast("long").alias("pos"),
            F.sum("neg").cast("long").alias("neg"),
        ).select("bx", "xmax", "pos", "neg")
    return cur.select(
        "bx", "xmax", "pos", "neg",
        F.expr("CAST((pos * 1000000) div (pos + neg) AS BIGINT)")
        .alias("rate_ppm"),
    )


def CHIMERGE_ROUND_CTES(rounds: int, base: str = "c0") -> list[str]:
    """Chained-CTE unroll of the same synchronous recurrence: c0 must
    provide (bx, xmax, pos, neg); yields c1..c{rounds}."""
    guarded_n = (
        "CASE WHEN greatest(p_pos + p_neg, pos + neg) <= 8000000"
        " THEN CAST(p_pos + p_neg + pos + neg AS HUGEINT)"
        " ELSE CAST(error('chimerge: bins over 8e6 rows')"
        " AS HUGEINT) END"
    )
    merge_pred = (
        "p_pos IS NOT NULL AND ("
        " (p_pos + pos) = 0 OR (p_neg + neg) = 0 OR"
        f" 1000 * ({guarded_n})"
        "   * (CAST(p_pos AS HUGEINT) * neg"
        "      - CAST(pos AS HUGEINT) * p_neg)"
        "   * (CAST(p_pos AS HUGEINT) * neg"
        "      - CAST(pos AS HUGEINT) * p_neg)"
        f" < {CHIMERGE_TAU_X1000}"
        "   * CAST(p_pos + p_neg AS HUGEINT) * (pos + neg)"
        "   * (p_pos + pos) * (p_neg + neg))"
    )
    parts = []
    for t in range(rounds):
        src = base if t == 0 else f"c{t}"
        parts.append(f"""c{t + 1} AS (
  SELECT CAST(min(bx) AS BIGINT) AS bx, CAST(max(xmax) AS BIGINT) AS xmax,
         CAST(sum(pos) AS BIGINT) AS pos, CAST(sum(neg) AS BIGINT) AS neg
  FROM (
    SELECT bx, xmax, pos, neg,
           CAST(sum(flag) OVER (ORDER BY bx ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS grp
    FROM (
      SELECT bx, xmax, pos, neg,
             CASE WHEN {merge_pred} THEN 0 ELSE 1 END AS flag
      FROM (
        SELECT bx, xmax, pos, neg,
               lag(pos) OVER (ORDER BY bx) AS p_pos,
               lag(neg) OVER (ORDER BY bx) AS p_neg
        FROM {src}
      )
    )
  )
  GROUP BY grp
)""")
    return parts
