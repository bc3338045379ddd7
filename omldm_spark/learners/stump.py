"""Exact distributed greedy split: the histogram tree-node primitive.

Beyond-reference surface complementing HT (learners/ht.py): the Hoeffding
tree grows from STREAMED per-leaf observer sketches with a statistical
bound; this module is the BATCH exact counterpart — the histogram-based
best-split search that XGBoost/LightGBM run per tree node, expressed as
plain DataFrame aggregation.  One corpus pass melts every row into its
(feature, value) pairs and ONE map-side-combined groupBy produces the
per-feature value histograms with class counts; everything downstream
(cumulative left/right counts, split scores, argmax) runs on the
value-domain-scale histogram, never on rows.

Split criterion: maximize sum_children n_c * (1 - Gini_c) rewritten as
S(t) = (posL^2 + negL^2)/nL + (posR^2 + negR^2)/nR — monotone-equivalent
to minimizing weighted Gini.  Exactness: the squares and sums are exact
BIGINTs (n^2-scale: int64-safe to ~3e9 rows per node; past that lift the
numerators to DECIMAL(38,0)), and each candidate's score is ONE IEEE
division of identical integers per term — identical doubles cross-engine,
so ORDER BY score is deterministic (ties break on the threshold value).
Thresholds are left-inclusive: x <= t goes left.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCORE_TXT = (
    "(CAST(pos_l * pos_l + neg_l * neg_l AS DOUBLE) / CAST(n_l AS DOUBLE)"
    " + CAST(pos_r * pos_r + neg_r * neg_r AS DOUBLE)"
    " / CAST(n_r AS DOUBLE))"
)


def best_splits(df: DataFrame, feature_cols: list[str],
                label_col: str, group_cols: list[str] | None = None
                ) -> DataFrame:
    """Per-feature best binary split of the 0/1 ``label_col`` over the
    integer ``feature_cols``, plus a rank.  Returns one row per
    (group..., feature): (group..., feat, thr, n_l, n_r, pos_l, pos_r,
    score, rn) with rn = 1 marking the split the tree takes.

    ``group_cols`` turns this into the per-NODE search of a deeper tree:
    every window and the final rank partition by the group, so ALL nodes
    of a tree level train in the same single corpus pass (the
    level-synchronous histogram strategy XGBoost uses)."""
    g = list(group_cols or [])
    # ONE scan: each row explodes to its |features| (feat, value) pairs
    # (a union of per-feature selects would re-scan the corpus per feature)
    melted = df.select(
        *g,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("feat"),
                    F.col(c).cast("long").alias("v"),
                )
                for c in feature_cols
            ])
        ).alias("fv"),
        F.col(label_col).cast("long").alias("y"),
    ).select(*g, F.col("fv.feat").alias("feat"), F.col("fv.v").alias("v"),
             "y")
    hist = melted.groupBy(*g, "feat", "v").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = Window.partitionBy(*g, "feat").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(*g, "feat")
    cum = hist.select(
        *g, "feat", "v",
        F.sum("n").over(w).cast("long").alias("n_l"),
        F.sum("pos").over(w).cast("long").alias("pos_l"),
        F.sum("n").over(tot).cast("long").alias("n_tot"),
        F.sum("pos").over(tot).cast("long").alias("pos_tot"),
    )
    cand = cum.filter(F.col("n_l") < F.col("n_tot")).select(
        *g, "feat", F.col("v").alias("thr"), "n_l", "pos_l",
        (F.col("n_tot") - F.col("n_l")).alias("n_r"),
        (F.col("pos_tot") - F.col("pos_l")).alias("pos_r"),
        (F.col("n_l") - F.col("pos_l")).alias("neg_l"),
        (F.col("n_tot") - F.col("n_l") - F.col("pos_tot")
         + F.col("pos_l")).alias("neg_r"),
    ).withColumn("score", F.expr(_SCORE_TXT))
    wb = Window.partitionBy(*g, "feat").orderBy(
        F.col("score").desc(), F.col("thr").asc()
    )
    per_feat = cand.withColumn("brn", F.row_number().over(wb)).filter(
        F.col("brn") == 1
    )
    wg = Window.partitionBy(*g).orderBy(
        F.col("score").desc(), F.col("feat").asc()
    ) if g else Window.orderBy(F.col("score").desc(), F.col("feat").asc())
    return per_feat.select(
        *g, "feat", "thr", "n_l", "n_r", "pos_l", "pos_r",
        F.round("score", 6).alias("score"),
        F.row_number().over(wg).cast("long").alias("rn"),
    )


def BEST_SPLITS_SQL(select_sql: str, feature_cols: list[str],
                    label_col: str, group_col: str | None = None) -> str:
    """DuckDB oracle: identical histogram, cumulative counts, score text
    and tie rules.  ``group_col`` mirrors best_splits' group_cols (the
    per-node search of a deeper tree level)."""
    gs = f"{group_col}, " if group_col else ""
    gp = f"PARTITION BY {group_col}, feat" if group_col else "PARTITION BY feat"
    gt = (f"PARTITION BY {group_col} " if group_col else "")
    melt = " UNION ALL ".join(
        f"SELECT {gs}'{c}' AS feat, CAST({c} AS BIGINT) AS v,"
        f" CAST({label_col} AS BIGINT) AS y FROM base"
        for c in feature_cols
    )
    return f"""
WITH base AS ({select_sql}),
melted AS ({melt}),
hist AS (
  SELECT {gs}feat, v, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS pos
  FROM melted GROUP BY ALL
),
cum AS (
  SELECT {gs}feat, v,
         CAST(sum(n) OVER ({gp} ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_l,
         CAST(sum(pos) OVER ({gp} ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pos_l,
         CAST(sum(n) OVER ({gp}) AS BIGINT) AS n_tot,
         CAST(sum(pos) OVER ({gp}) AS BIGINT) AS pos_tot
  FROM hist
),
cand AS (
  SELECT {gs}feat, v AS thr, n_l, pos_l,
         n_tot - n_l AS n_r,
         pos_tot - pos_l AS pos_r,
         n_l - pos_l AS neg_l,
         n_tot - n_l - pos_tot + pos_l AS neg_r
  FROM cum WHERE n_l < n_tot
),
scored AS (
  SELECT {gs}feat, thr, n_l, n_r, pos_l, pos_r,
         {_SCORE_TXT} AS score
  FROM cand
),
per_feat AS (
  SELECT *, row_number() OVER ({gp}
              ORDER BY score DESC, thr ASC) AS brn
  FROM scored
)
SELECT {gs}feat, thr, n_l, n_r, pos_l, pos_r,
       round(score, 6) AS score,
       CAST(row_number() OVER ({gt}ORDER BY score DESC, feat ASC) AS BIGINT)
         AS rn
FROM per_feat WHERE brn = 1
"""


def tree_depth2(df: DataFrame, feature_cols: list[str],
                label_col: str) -> DataFrame:
    """A depth-2 exact greedy tree, fully declarative (no driver collect):
    the root split comes from best_splits, the 1-row (root_feat,
    root_thr) frame broadcasts into a CASE that assigns each row its
    branch, and BOTH child nodes train in ONE further grouped pass
    (best_splits with group_cols=['branch'] — the level-synchronous
    strategy).  Returns the root (branch = -1) plus the chosen split per
    branch; deeper trees iterate the same two steps per level with the
    node id accumulating into the group key."""
    splits = best_splits(df, feature_cols, label_col)
    root = splits.filter(F.col("rn") == 1).select(
        F.col("feat").alias("root_feat"), F.col("thr").alias("root_thr")
    )
    val = None
    for c in feature_cols:
        cond = F.col("root_feat") == c
        val = F.when(cond, F.col(c)) if val is None else val.when(
            cond, F.col(c)
        )
    branched = df.crossJoin(F.broadcast(root)).withColumn(
        "branch",
        F.when(val <= F.col("root_thr"), 0).otherwise(1).cast("long"),
    )
    children = best_splits(branched, feature_cols, label_col, ["branch"])
    root_row = splits.filter(F.col("rn") == 1).select(
        F.lit(-1).cast("long").alias("branch"),
        "feat", "thr", "n_l", "n_r", "pos_l", "pos_r", "score", "rn",
    )
    return root_row.unionByName(children.filter(F.col("rn") == 1))


def TREE_DEPTH2_SQL(select_sql: str, feature_cols: list[str],
                    label_col: str) -> str:
    root_q = BEST_SPLITS_SQL(select_sql, feature_cols, label_col)
    case = ("CASE r.root_feat "
            + "".join(f"WHEN '{c}' THEN b.{c} " for c in feature_cols)
            + "END")
    branched_sql = f"""
SELECT b.*,
       CASE WHEN ({case}) <= r.root_thr THEN CAST(0 AS BIGINT)
            ELSE CAST(1 AS BIGINT) END AS branch
FROM ({select_sql}) b
CROSS JOIN (SELECT feat AS root_feat, thr AS root_thr
            FROM ({root_q}) WHERE rn = 1) r
"""
    children_q = BEST_SPLITS_SQL(branched_sql, feature_cols, label_col,
                                 group_col="branch")
    return f"""
SELECT CAST(-1 AS BIGINT) AS branch,
       feat, thr, n_l, n_r, pos_l, pos_r, score, rn
FROM ({root_q}) WHERE rn = 1
UNION ALL
SELECT branch, feat, thr, n_l, n_r, pos_l, pos_r, score, rn
FROM ({children_q}) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Regression (variance-reduction) splits + one boosting round
# ---------------------------------------------------------------------------

def _score_reg_txt(int_type: str) -> str:
    """SSE-reduction score sum_l^2/n_l + sum_r^2/n_r.  The squares need
    128-bit exact arithmetic (sum^2 overflows int64 past ~3e10-cent
    sums): DECIMAL(38,0) in Spark, HUGEINT in DuckDB — both exact, and
    integer -> double conversion is correctly rounded in both, so the
    score doubles are identical (the ab_test_report envelope)."""
    return (
        f"(CAST(CAST(sum_l AS {int_type}) * sum_l AS DOUBLE)"
        " / CAST(n_l AS DOUBLE)"
        f" + CAST(CAST(sum_r AS {int_type}) * sum_r AS DOUBLE)"
        " / CAST(n_r AS DOUBLE))"
    )


def best_splits_reg(df: DataFrame, feature_cols: list[str],
                    target_col: str, group_cols: list[str] | None = None
                    ) -> DataFrame:
    """Regression twin of best_splits: maximize sum_l^2/n_l + sum_r^2/n_r
    (monotone-equivalent to minimizing child SSE — the variance-reduction
    criterion CART/XGBoost use for squared loss).  Same single-scan melt,
    histogram, cumulative-window and tie rules; also returns the exact
    integer child sums so leaf means (sum div n) derive downstream."""
    g = list(group_cols or [])
    melted = df.select(
        *g,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("feat"),
                    F.col(c).cast("long").alias("v"),
                )
                for c in feature_cols
            ])
        ).alias("fv"),
        F.col(target_col).cast("long").alias("y"),
    ).select(*g, F.col("fv.feat").alias("feat"), F.col("fv.v").alias("v"),
             "y")
    hist = melted.groupBy(*g, "feat", "v").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    w = Window.partitionBy(*g, "feat").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(*g, "feat")
    cum = hist.select(
        *g, "feat", "v",
        F.sum("n").over(w).cast("long").alias("n_l"),
        F.sum("s").over(w).cast("long").alias("sum_l"),
        F.sum("n").over(tot).cast("long").alias("n_tot"),
        F.sum("s").over(tot).cast("long").alias("sum_tot"),
    )
    cand = cum.filter(F.col("n_l") < F.col("n_tot")).select(
        *g, "feat", F.col("v").alias("thr"), "n_l", "sum_l",
        (F.col("n_tot") - F.col("n_l")).alias("n_r"),
        (F.col("sum_tot") - F.col("sum_l")).alias("sum_r"),
    ).withColumn("score", F.expr(_score_reg_txt("DECIMAL(38,0)")))
    wb = Window.partitionBy(*g, "feat").orderBy(
        F.col("score").desc(), F.col("thr").asc()
    )
    per_feat = cand.withColumn("brn", F.row_number().over(wb)).filter(
        F.col("brn") == 1
    )
    wg = Window.partitionBy(*g).orderBy(
        F.col("score").desc(), F.col("feat").asc()
    ) if g else Window.orderBy(F.col("score").desc(), F.col("feat").asc())
    return per_feat.select(
        *g, "feat", "thr", "n_l", "n_r", "sum_l", "sum_r",
        F.round("score", 4).alias("score"),
        F.row_number().over(wg).cast("long").alias("rn"),
    )


def BEST_SPLITS_REG_SQL(select_sql: str, feature_cols: list[str],
                        target_col: str) -> str:
    melt = " UNION ALL ".join(
        f"SELECT '{c}' AS feat, CAST({c} AS BIGINT) AS v,"
        f" CAST({target_col} AS BIGINT) AS y FROM base"
        for c in feature_cols
    )
    return f"""
WITH base AS ({select_sql}),
melted AS ({melt}),
hist AS (
  SELECT feat, v, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s
  FROM melted GROUP BY ALL
),
cum AS (
  SELECT feat, v,
         CAST(sum(n) OVER (PARTITION BY feat ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_l,
         CAST(sum(s) OVER (PARTITION BY feat ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sum_l,
         CAST(sum(n) OVER (PARTITION BY feat) AS BIGINT) AS n_tot,
         CAST(sum(s) OVER (PARTITION BY feat) AS BIGINT) AS sum_tot
  FROM hist
),
cand AS (
  SELECT feat, v AS thr, n_l, sum_l,
         n_tot - n_l AS n_r, sum_tot - sum_l AS sum_r
  FROM cum WHERE n_l < n_tot
),
scored AS (
  SELECT feat, thr, n_l, n_r, sum_l, sum_r,
         {_score_reg_txt("HUGEINT")} AS score
  FROM cand
),
per_feat AS (
  SELECT *, row_number() OVER (PARTITION BY feat
              ORDER BY score DESC, thr ASC) AS brn
  FROM scored
)
SELECT feat, thr, n_l, n_r, sum_l, sum_r,
       round(score, 4) AS score,
       CAST(row_number() OVER (ORDER BY score DESC, feat ASC) AS BIGINT)
         AS rn
FROM per_feat WHERE brn = 1
"""


def gbt_residual_round(df: DataFrame, feature_cols: list[str],
                       target_col: str) -> DataFrame:
    """One gradient-boosting round for squared loss, exactly: round 0
    fits the variance-reduction stump on the target; its integer leaf
    means (sum div n — quantized so residuals STAY integers) broadcast
    back and round 1 fits the next stump on the residuals.  Returns the
    rn = 1 split per round tagged (round 0, 1).  The residual pass is
    the whole boosting recurrence — further rounds iterate the same two
    steps; keeping predictions in quantized integer units is what lets
    every round stay bit-exact cross-engine (float leaf values would
    re-associate)."""
    r0 = best_splits_reg(df, feature_cols, target_col)
    root = r0.filter(F.col("rn") == 1).select(
        F.col("feat").alias("root_feat"), F.col("thr").alias("root_thr"),
        F.expr("sum_l div n_l").cast("long").alias("mean_l"),
        F.expr("sum_r div n_r").cast("long").alias("mean_r"),
    )
    val = None
    for c in feature_cols:
        cond = F.col("root_feat") == c
        val = F.when(cond, F.col(c)) if val is None else val.when(
            cond, F.col(c)
        )
    resid = df.crossJoin(F.broadcast(root)).withColumn(
        "resid",
        (F.col(target_col)
         - F.when(val <= F.col("root_thr"), F.col("mean_l"))
         .otherwise(F.col("mean_r"))).cast("long"),
    )
    r1 = best_splits_reg(resid, feature_cols, "resid")
    out_cols = ["feat", "thr", "n_l", "n_r", "sum_l", "sum_r", "score"]
    return (
        r0.filter(F.col("rn") == 1)
        .select(F.lit(0).cast("long").alias("round"), *out_cols)
        .unionByName(
            r1.filter(F.col("rn") == 1)
            .select(F.lit(1).cast("long").alias("round"), *out_cols)
        )
    )


def GBT_RESIDUAL_ROUND_SQL(select_sql: str, feature_cols: list[str],
                           target_col: str) -> str:
    r0_q = BEST_SPLITS_REG_SQL(select_sql, feature_cols, target_col)
    case = ("CASE r.root_feat "
            + "".join(f"WHEN '{c}' THEN b.{c} " for c in feature_cols)
            + "END")
    resid_sql = f"""
SELECT b.*,
       CAST(b.{target_col} - CASE WHEN ({case}) <= r.root_thr
            THEN r.mean_l ELSE r.mean_r END AS BIGINT) AS resid
FROM ({select_sql}) b
CROSS JOIN (SELECT feat AS root_feat, thr AS root_thr,
                   CAST(sum_l // n_l AS BIGINT) AS mean_l,
                   CAST(sum_r // n_r AS BIGINT) AS mean_r
            FROM ({r0_q}) WHERE rn = 1) r
"""
    r1_q = BEST_SPLITS_REG_SQL(resid_sql, feature_cols, "resid")
    cols = "feat, thr, n_l, n_r, sum_l, sum_r, score"
    return f"""
SELECT CAST(0 AS BIGINT) AS round, {cols} FROM ({r0_q}) WHERE rn = 1
UNION ALL
SELECT CAST(1 AS BIGINT) AS round, {cols} FROM ({r1_q}) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Arbitrary-depth greedy tree (level-synchronous loop)
# ---------------------------------------------------------------------------

def tree_train(df: DataFrame, feature_cols: list[str], label_col: str,
               depth: int) -> DataFrame:
    """Exact greedy tree to ``depth`` levels: the tree_depth2 two-step
    (grouped level search -> broadcast split frame -> branch-digit CASE)
    iterated, with the node PATH ('' at the root, then '0'/'1' digits)
    as the single group key — every level trains ALL its nodes in one
    corpus pass, so a depth-d tree costs d passes whatever its 2^d-1
    nodes (the XGBoost level-synchronous bound).  Returns one row per
    node: (node, feat, thr, n_l, n_r, pos_l, pos_r, score).  Leaves that
    become pure or single-valued simply stop producing candidate rows
    (n_l < n_tot filters them), so degenerate branches terminate early
    for free."""
    cur = df.withColumn("node", F.lit(""))
    out = None
    for _level in range(depth):
        splits = best_splits(
            cur, feature_cols, label_col, ["node"]
        ).filter(F.col("rn") == 1)
        picked = splits.select(
            "node", "feat", "thr", "n_l", "n_r", "pos_l", "pos_r", "score"
        )
        out = picked if out is None else out.unionByName(picked)
        sp = splits.select(
            F.col("node").alias("s_node"), F.col("feat").alias("s_feat"),
            F.col("thr").alias("s_thr"),
        )
        val = None
        for c in feature_cols:
            cond = F.col("s_feat") == c
            val = F.when(cond, F.col(c)) if val is None else val.when(
                cond, F.col(c)
            )
        cur = (
            cur.join(F.broadcast(sp), cur["node"] == sp["s_node"])
            .withColumn(
                "node",
                F.concat(
                    F.col("node"),
                    F.when(val <= F.col("s_thr"), "0").otherwise("1"),
                ),
            )
            .drop("s_node", "s_feat", "s_thr")
        )
    return out


def TREE_TRAIN_SQL(select_sql: str, feature_cols: list[str],
                   label_col: str, depth: int) -> str:
    """Generated oracle: the grouped split pipeline nested per level with
    the same branch-digit CASE chaining the node path."""

    def grouped_splits(base_sql: str) -> str:
        return BEST_SPLITS_SQL(base_sql, feature_cols, label_col,
                               group_col="node")

    case = ("CASE s.feat "
            + "".join(f"WHEN '{c}' THEN b.{c} " for c in feature_cols)
            + "END")
    level_base = f"SELECT b.*, '' AS node FROM ({select_sql}) b"
    selects = []
    for _level in range(depth):
        sq = grouped_splits(level_base)
        selects.append(
            f"SELECT node, feat, thr, n_l, n_r, pos_l, pos_r, score"
            f" FROM ({sq}) WHERE rn = 1"
        )
        level_base = f"""
SELECT b.*  EXCLUDE (node),
       b.node || CASE WHEN ({case}) <= s.thr THEN '0' ELSE '1' END AS node
FROM ({level_base}) b
JOIN (SELECT node, feat, thr FROM ({sq}) WHERE rn = 1) s
  ON b.node = s.node
"""
    return "\nUNION ALL\n".join(selects)


# ---------------------------------------------------------------------------
# Bagged stumps: deterministic Poisson bootstrap, all trees in one pass
# ---------------------------------------------------------------------------

# Poisson(1) pmf quantized onto the 16^6 md5-fold range: P(0)=P(1)=e^-1,
# P(2)=e^-1/2, remainder -> weight 3.  Integer thresholds, identical text.
_POIS_T1 = 6_171_992          # floor(e^-1 * 16^6)
_POIS_T2 = 12_343_985         # floor(2 * e^-1 * 16^6)
_POIS_T3 = 15_429_982         # floor(2.5 * e^-1 * 16^6)


def bag_weight_sql(row_key_expr: str, tree_col: str = "tree") -> str:
    """Deterministic Poisson(1)-bootstrap multiplicity for (row, tree):
    0/1/2/3 from the shared md5 instr-fold — every engine and every run
    draws the same bootstrap."""
    fold = "(" + " + ".join(
        f"(instr('{_HEX}', substr(md5(concat('bag|', CAST({tree_col}"
        f" AS STRING), '|', {row_key_expr})), {i}, 1)) - 1)"
        f" * {16 ** (6 - i)}"
        for i in range(1, 7)
    ) + ")"
    return (f"CAST(CASE WHEN {fold} < {_POIS_T1} THEN 0"
            f" WHEN {fold} < {_POIS_T2} THEN 1"
            f" WHEN {fold} < {_POIS_T3} THEN 2"
            " ELSE 3 END AS BIGINT)")


_HEX = "0123456789abcdef"


def bagged_stumps(df: DataFrame, feature_cols: list[str], label_col: str,
                  row_key_expr: str, n_trees: int) -> DataFrame:
    """A bag of ``n_trees`` stumps, ALL trained in one corpus pass: each
    row fans out to every tree with its deterministic Poisson-bootstrap
    multiplicity as the histogram weight (rows drawn 0 times vanish —
    the ~37% out-of-bag mass per tree), and best_splits' grouped search
    (group = tree id) finds every tree's split in the same shuffle.
    Weighted counts stay exact BIGINTs, so the ensemble is bit-identical
    cross-engine — a deterministic random forest over one feature.
    Disagreement across trees is the stability signal bagging exists
    for."""
    trees = df.sparkSession.range(n_trees).select(
        F.col("id").cast("long").alias("tree")
    )
    expanded = df.crossJoin(F.broadcast(trees)).withColumn(
        "w", F.expr(bag_weight_sql(row_key_expr))
    ).filter(F.col("w") > 0)
    g = ["tree"]
    melted = expanded.select(
        *g,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("feat"),
                    F.col(c).cast("long").alias("v"),
                )
                for c in feature_cols
            ])
        ).alias("fv"),
        F.col(label_col).cast("long").alias("y"),
        "w",
    ).select(*g, F.col("fv.feat").alias("feat"), F.col("fv.v").alias("v"),
             "y", "w")
    hist = melted.groupBy(*g, "feat", "v").agg(
        F.sum("w").cast("long").alias("n"),
        F.sum(F.col("w") * F.col("y")).cast("long").alias("pos"),
    )
    w_cum = Window.partitionBy(*g, "feat").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(*g, "feat")
    cum = hist.select(
        *g, "feat", "v",
        F.sum("n").over(w_cum).cast("long").alias("n_l"),
        F.sum("pos").over(w_cum).cast("long").alias("pos_l"),
        F.sum("n").over(tot).cast("long").alias("n_tot"),
        F.sum("pos").over(tot).cast("long").alias("pos_tot"),
    )
    cand = cum.filter(F.col("n_l") < F.col("n_tot")).select(
        *g, "feat", F.col("v").alias("thr"), "n_l", "pos_l",
        (F.col("n_tot") - F.col("n_l")).alias("n_r"),
        (F.col("pos_tot") - F.col("pos_l")).alias("pos_r"),
        (F.col("n_l") - F.col("pos_l")).alias("neg_l"),
        (F.col("n_tot") - F.col("n_l") - F.col("pos_tot")
         + F.col("pos_l")).alias("neg_r"),
    ).withColumn("score", F.expr(_SCORE_TXT))
    wb = Window.partitionBy(*g, "feat").orderBy(
        F.col("score").desc(), F.col("thr").asc()
    )
    per_feat = cand.withColumn("brn", F.row_number().over(wb)).filter(
        F.col("brn") == 1
    )
    wg = Window.partitionBy(*g).orderBy(
        F.col("score").desc(), F.col("feat").asc()
    )
    return per_feat.withColumn(
        "rn", F.row_number().over(wg).cast("long")
    ).filter(F.col("rn") == 1).select(
        "tree", "feat", "thr", "n_l", "n_r", "pos_l", "pos_r",
        F.round("score", 6).alias("score"),
    )


def BAGGED_STUMPS_SQL(select_sql: str, feature_cols: list[str],
                      label_col: str, row_key_expr: str,
                      n_trees: int) -> str:
    melt = " UNION ALL ".join(
        f"SELECT tree, '{c}' AS feat, CAST({c} AS BIGINT) AS v,"
        f" CAST({label_col} AS BIGINT) AS y, w FROM expanded"
        for c in feature_cols
    )
    return f"""
WITH base AS ({select_sql}),
trees AS (SELECT unnest(generate_series(0, {n_trees - 1})) AS tree),
expanded AS (
  SELECT b.*, t.tree, {bag_weight_sql(row_key_expr)} AS w
  FROM base b CROSS JOIN trees t
),
melted AS (
  SELECT * FROM ({melt}) WHERE w > 0
),
hist AS (
  SELECT tree, feat, v, CAST(sum(w) AS BIGINT) AS n,
         CAST(sum(w * y) AS BIGINT) AS pos
  FROM melted GROUP BY ALL
),
cum AS (
  SELECT tree, feat, v,
         CAST(sum(n) OVER (PARTITION BY tree, feat ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_l,
         CAST(sum(pos) OVER (PARTITION BY tree, feat ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pos_l,
         CAST(sum(n) OVER (PARTITION BY tree, feat) AS BIGINT) AS n_tot,
         CAST(sum(pos) OVER (PARTITION BY tree, feat) AS BIGINT) AS pos_tot
  FROM hist
),
cand AS (
  SELECT tree, feat, v AS thr, n_l, pos_l,
         n_tot - n_l AS n_r,
         pos_tot - pos_l AS pos_r,
         n_l - pos_l AS neg_l,
         n_tot - n_l - pos_tot + pos_l AS neg_r
  FROM cum WHERE n_l < n_tot
),
scored AS (
  SELECT tree, feat, thr, n_l, n_r, pos_l, pos_r,
         {_SCORE_TXT} AS score
  FROM cand
),
per_feat AS (
  SELECT *, row_number() OVER (PARTITION BY tree, feat
              ORDER BY score DESC, thr ASC) AS brn
  FROM scored
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY tree
              ORDER BY score DESC, feat ASC) AS rn
  FROM per_feat WHERE brn = 1
)
SELECT tree, feat, thr, n_l, n_r, pos_l, pos_r,
       round(score, 6) AS score
FROM best WHERE rn = 1
"""
