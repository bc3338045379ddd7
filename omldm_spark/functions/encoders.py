"""Feature encoders: target encoding, quantile discretization, hashing trick.

Beyond-reference surface: the reference's preprocessors are row-local or
moment-based scalers (PolynomialFeatures/StandardScaler/MinMaxScaler,
PipelineMap.scala whitelist); these are the three table-driven encoders a
feature platform adds on top, each a fit+transform pair expressed as plain
DataFrame ops in the repo's integer-exact envelope.

* target_encode_loo   leave-one-out target encoding with additive
                      smoothing — THE high-cardinality categorical encoder
                      (and the classic target-leakage fix: each row's own
                      label is subtracted from its category statistic).
                      All-BIGINT: sums/counts are exact, the encoded value
                      is a truncating integer division of cents.
* quantile_bin        QuantileDiscretizer fit+transform: exact bin edges
                      from the value-count histogram CDF (the
                      robust_scaler pattern), applied with a broadcast
                      edges array — no per-row shuffle, no rank pass over
                      the full table.
* hash_features       the hashing trick (Weinberger et al.): token ->
                      signed slot via the repo's shared md5 instr-fold SQL
                      text; D-dimensional sparse vectors whose collisions
                      are deterministic and engine-identical.

Scale shapes are per-function; the common property is that every fit
statistic is category/histogram/slot-scale (broadcastable), never
row-scale, and every transform is one narrow projection or one broadcast
join over the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.dedup import TOKENS_SQL, tokens_col
from ..operators.sketch import bucket_sql


# ---------------------------------------------------------------------------
# Leave-one-out target encoding
# ---------------------------------------------------------------------------

def target_encode_loo(df: DataFrame, key_col: str, cat_col: str,
                      val_col: str, m: int = 20) -> DataFrame:
    """Per-row LOO target encoding of ``cat_col`` against the BIGINT target
    ``val_col``: te = (sum_cat - own) div (cnt_cat - 1), with the global
    mean as the singleton-category fallback, plus the m-smoothed variant
    te_smooth = (sum_cat - own + m * gmean) div (cnt_cat - 1 + m).

    One tiny groupBy(cat) + one global aggregate, both broadcast back over
    the fact scan — the fact table never shuffles (a window over
    partitionBy(cat) would shuffle every row onto |cats| reducers and
    hot-spot on skewed categories; the broadcast join shape does not)."""
    stats = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).cast("long").alias("cat_cnt"),
        F.sum(val_col).cast("long").alias("cat_sum"),
    )
    glob = df.agg(
        F.count(F.lit(1)).cast("long").alias("g_cnt"),
        F.sum(val_col).cast("long").alias("g_sum"),
    ).select(F.expr("g_sum div g_cnt").cast("long").alias("g_mean"))
    return (
        df.join(F.broadcast(stats), cat_col)
        .crossJoin(F.broadcast(glob))
        .select(
            F.col(key_col),
            F.col(cat_col),
            F.col(val_col),
            F.when(
                F.col("cat_cnt") > 1,
                F.expr(f"(cat_sum - {val_col}) div (cat_cnt - 1)"),
            ).otherwise(F.col("g_mean")).cast("long").alias("te"),
            F.expr(
                f"(cat_sum - {val_col} + {m} * g_mean)"
                f" div (cat_cnt - 1 + {m})"
            ).cast("long").alias("te_smooth"),
        )
    )


def TARGET_ENCODE_SQL(select_sql: str, key_col: str, cat_col: str,
                      val_col: str, m: int = 20) -> str:
    """DuckDB oracle: same statistics, same truncating division (`//` on
    positive BIGINTs == Spark `div`)."""
    return f"""
WITH base AS ({select_sql}),
stats AS (
  SELECT {cat_col}, CAST(count(*) AS BIGINT) AS cat_cnt,
         CAST(sum({val_col}) AS BIGINT) AS cat_sum
  FROM base GROUP BY 1
),
gstats AS (
  SELECT CAST(CAST(sum({val_col}) AS BIGINT)
              // CAST(count(*) AS BIGINT) AS BIGINT) AS g_mean
  FROM base
)
SELECT b.{key_col}, b.{cat_col}, b.{val_col},
       CAST(CASE WHEN s.cat_cnt > 1
                 THEN (s.cat_sum - b.{val_col}) // (s.cat_cnt - 1)
                 ELSE g.g_mean END AS BIGINT) AS te,
       CAST((s.cat_sum - b.{val_col} + {m} * g.g_mean)
            // (s.cat_cnt - 1 + {m}) AS BIGINT) AS te_smooth
FROM base b
JOIN stats s ON b.{cat_col} = s.{cat_col}
CROSS JOIN gstats g
"""


# ---------------------------------------------------------------------------
# Quantile discretizer (fit + transform)
# ---------------------------------------------------------------------------

def quantile_bin(df: DataFrame, key_col: str, val_col: str,
                 bins: int = 10) -> DataFrame:
    """Exact quantile binning of the BIGINT ``val_col`` into ``bins``
    buckets: edges e_b = min{v : cum(v) >= ceil(b*n/bins)} for
    b = 1..bins-1 come from the value-count histogram CDF (key space =
    distinct quantized values, the robust_scaler bound, not the row
    count); the transform broadcasts the sorted (bins-1)-element edge
    array and assigns bin = 1 + |{e < v}| with one higher-order filter —
    right-closed bins, no second shuffle of the fact table."""
    edges = quantile_edges(df, val_col, bins)
    return (
        df.crossJoin(F.broadcast(edges))
        .select(
            F.col(key_col),
            F.col(val_col),
            bin_expr(val_col).alias("bin"),
        )
    )


def quantile_edges(df: DataFrame, val_col: str, bins: int) -> DataFrame:
    """The FIT half of the discretizer: a one-row frame with the sorted
    (bins-1)-element edge array from the value-count histogram CDF —
    broadcastable, reusable against any frame (the transform half is
    ``bin_expr`` over a crossJoin of this)."""
    hist = df.groupBy(F.col(val_col).alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    total = hist.agg(F.sum("c").cast("long").alias("n"))
    cdf = hist.select(
        "v", F.sum("c").over(w).cast("long").alias("cum")
    ).crossJoin(F.broadcast(total))
    edge_rows = None
    for b in range(1, bins):
        cond = cdf.filter(
            F.col("cum") >= F.expr(f"({b} * n + {bins} - 1) div {bins}")
        ).agg(F.min("v").cast("long").alias("e"))
        edge_rows = cond if edge_rows is None else edge_rows.unionByName(cond)
    return edge_rows.agg(F.array_sort(F.collect_list("e")).alias("arr"))


def bin_expr(val_col: str):
    """bin = 1 + |{edges < v}| (right-closed), over the broadcast ``arr``
    column from quantile_edges."""
    return (1 + F.size(F.filter(
        F.col("arr"), lambda e: e < F.col(val_col)
    ))).cast("long")


def QUANTILE_BIN_SQL(select_sql: str, key_col: str, val_col: str,
                     bins: int = 10) -> str:
    edge_selects = " UNION ALL ".join(
        f"SELECT CAST(min(v) AS BIGINT) AS e FROM cdf"
        f" WHERE cum >= ({b} * n + {bins} - 1) // {bins}"
        for b in range(1, bins)
    )
    return f"""
WITH base AS ({select_sql}),
hist AS (
  SELECT {val_col} AS v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1
),
cdf AS (
  SELECT v,
         CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum,
         CAST(sum(c) OVER () AS BIGINT) AS n
  FROM hist
),
edges AS ({edge_selects}),
arr AS (SELECT list(e ORDER BY e) AS arr FROM edges)
SELECT b.{key_col}, b.{val_col},
       CAST(1 + len(list_filter(a.arr, e -> e < b.{val_col})) AS BIGINT)
         AS bin
FROM base b CROSS JOIN arr a
"""


# ---------------------------------------------------------------------------
# Hashing trick
# ---------------------------------------------------------------------------

def hash_features(docs: DataFrame, dim: int = 64, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Signed feature hashing over the token stream: slot = md5-fold(tok)
    mod dim, sign = +-1 from an independent md5 row, weight(doc, slot) =
    sum of sign per occurrence — the fixed-width featurizer whose memory
    is O(dim) per doc at ANY vocabulary size (no vocab dictionary to fit,
    ship, or broadcast).  One explode + ONE (doc, slot) map-side-combined
    groupBy; the shared instr-fold SQL text (sketch.bucket_sql) makes
    collisions engine-identical."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("tok"),
    )
    slot = F.expr(bucket_sql("tok", 0, dim))
    sign = (1 - 2 * F.expr(bucket_sql("tok", 1, 2))).cast("long")
    return (
        toks.select("doc_id", slot.alias("slot"), sign.alias("sign"))
        .groupBy("doc_id", "slot")
        .agg(F.sum("sign").cast("long").alias("w"))
    )


def HASH_FEATURES_SQL(dim: int = 64, text_expr: str = "text",
                      id_col: str = "doc_id",
                      table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest({TOKENS_SQL(text_expr)}) AS tok
  FROM {table}
)
SELECT doc_id,
       {bucket_sql("tok", 0, dim)} AS slot,
       CAST(sum(1 - 2 * {bucket_sql("tok", 1, 2)}) AS BIGINT) AS w
FROM toks
GROUP BY 1, 2
"""
