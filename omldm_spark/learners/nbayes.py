"""Multinomial Naive Bayes: the closed-form generative text classifier.

Beyond-reference surface: the reference's learner set (PA/SVM/ORR/HT/NN,
OMLDM.scala learner factory) has no generative classifier; NB is the
counting-only learner a corpus pipeline gets almost for free — the model IS
two aggregates over the token stream, so training is embarrassingly
map-side-combinable and never iterates. It complements ORR (closed-form
discriminative) the way the reference pairs PA with HT.

Exactness design: all sufficient statistics (per-class token counts, class
totals, doc priors, vocabulary size) are BIGINT and bit-identical across
engines. The only transcendental is one ln() per MODEL cell (|classes| x
|vocab| evaluations, never per corpus row), quantized to integer micro-nats
with the repo's deterministic HALF-UP rule ``floor(x * 1e6 + 0.5)`` on an
argument that is itself a single IEEE division of identical integers — the
same envelope weighted_sample_docs ships (corpus.py:949; cross-engine libm
ulp risk documented there: a flip needs the true value within ~1 ulp of a
0.5e-6 boundary). Scores then sum BIGINT micro-nats per (doc, class) —
order-independent — and the argmax tie-breaks on the class name.

Scale shape (100 TB corpus): training = one explode + TWO map-side-combined
aggregates (class-token counts; class totals); no shuffle carries more than
|classes| x |vocab| rows. Scoring pre-combines each doc to its DISTINCT
(token, multiplicity) pairs BEFORE the model join (the lm.py pre-combine),
joins the vocab-sized model (broadcast when it fits, AQE otherwise), and
reduces with one (doc, class)-keyed aggregate + one per-doc argmax window.
The |classes|-row frame is the only cross join and is always broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.dedup import TOKENS_SQL, tokens_col

# Quantized log-likelihood texts — IDENTICAL in Spark SQL and DuckDB.
_LP_TXT = (
    "CAST(floor(ln((cnt + 1) / CAST(cls_total + vsz AS DOUBLE))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)
_LP0_TXT = (
    "CAST(floor(ln(1.0 / CAST(cls_total + vsz AS DOUBLE))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)
_PRIOR_TXT = (
    "CAST(floor(ln(n_docs / CAST(total_docs AS DOUBLE))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)


def nb_model(docs: DataFrame, class_col: str = "lang",
             text_col: str = "text") -> DataFrame:
    """Fit the multinomial NB token model: one row per (class, token) seen
    in that class, carrying the exact count, the class token total, the
    corpus vocabulary size, and the Laplace-smoothed log-likelihood in
    integer micro-nats. The (cls, cnt, cls_total, vsz) columns are
    bit-exact sufficient statistics; lp_mu is the quantized-ln derivation
    (module docstring)."""
    toks = docs.select(
        F.col(class_col).alias("cls"),
        F.explode(tokens_col(text_col)).alias("tok"),
    )
    counts = toks.groupBy("cls", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cls_tot = counts.groupBy("cls").agg(
        F.sum("cnt").cast("long").alias("cls_total")
    )
    vocab = counts.select("tok").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("vsz")
    )
    return (
        counts.join(cls_tot, "cls")
        .crossJoin(F.broadcast(vocab))
        .select(
            "cls", "tok", "cnt", "cls_total", "vsz",
            F.expr(_LP_TXT).alias("lp_mu"),
        )
    )


def nb_scored(docs: DataFrame, class_col: str = "lang",
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The full (doc_id, cls, score_mu) score matrix — the shared
    derivation under nb_scores (argmax prediction) and nb_label_noise
    (margin screening)."""
    model = nb_model(docs, class_col, text_col)
    doc_toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(text_col)).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("mult"))
    )
    n_docs = docs.groupBy(F.col(class_col).alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    total = docs.agg(F.count(F.lit(1)).cast("long").alias("total_docs"))
    # |classes|-row frame: prior + unseen-token fallback per class.
    cls_info = (
        model.groupBy("cls")
        .agg(F.first("cls_total").alias("cls_total"), F.first("vsz").alias("vsz"))
        .join(n_docs, "cls")
        .crossJoin(F.broadcast(total))
        .select(
            "cls",
            F.expr(_PRIOR_TXT).alias("prior_mu"),
            F.expr(_LP0_TXT).alias("lp0_mu"),
        )
    )
    scored = (
        doc_toks.crossJoin(F.broadcast(cls_info))
        .join(model.select("cls", "tok", "lp_mu"), ["cls", "tok"], "left")
        .groupBy("doc_id", "cls")
        .agg(
            (
                F.first("prior_mu")
                + F.sum(F.col("mult") * F.coalesce(F.col("lp_mu"),
                                                   F.col("lp0_mu")))
            ).cast("long").alias("score_mu")
        )
    )
    return scored


def nb_scores(docs: DataFrame, class_col: str = "lang",
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Score every document against every class and pick the argmax:
    score(d, c) = prior_mu(c) + sum_t mult(d, t) * lp_mu(c, t), with the
    per-class unseen-token fallback lp0_mu. Returns (doc_id, pred_cls,
    score_mu, true_cls, correct) — resubstitution predictions (the model
    is fit on the same corpus; a train/score split composes by passing
    different frames)."""
    scored = nb_scored(docs, class_col, text_col, id_col)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_mu").desc(), F.col("cls").asc()
    )
    truth = docs.select(
        F.col(id_col).alias("doc_id"), F.col(class_col).alias("true_cls")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(truth, "doc_id")
        .select(
            "doc_id",
            F.col("cls").alias("pred_cls"),
            "score_mu",
            "true_cls",
            (F.col("cls") == F.col("true_cls")).alias("correct"),
        )
    )


def nb_label_noise(docs: DataFrame, margin_mu: int,
                   class_col: str = "lang", text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Confident-learning-style label-noise screen: documents whose
    model-preferred class beats their GIVEN label by more than
    ``margin_mu`` micro-nats — the candidates a relabeling/filter pass
    reviews before training.  One join of the score matrix against the
    per-doc true-class score; margin is an exact BIGINT difference of the
    quantized scores.  Returns (doc_id, true_cls, pred_cls, margin_mu)
    for flagged docs only."""
    scored = nb_scored(docs, class_col, text_col, id_col)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_mu").desc(), F.col("cls").asc()
    )
    best = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    ).select("doc_id", F.col("cls").alias("pred_cls"),
             F.col("score_mu").alias("s_pred"))
    truth = docs.select(
        F.col(id_col).alias("doc_id"), F.col(class_col).alias("true_cls")
    )
    own = scored.join(
        truth, (scored["doc_id"] == truth["doc_id"])
        & (scored["cls"] == truth["true_cls"])
    ).select(truth["doc_id"], "true_cls",
             F.col("score_mu").alias("s_true"))
    return (
        best.join(own, "doc_id")
        .filter(
            (F.col("pred_cls") != F.col("true_cls"))
            & (F.col("s_pred") - F.col("s_true") > margin_mu)
        )
        .select(
            "doc_id", "true_cls", "pred_cls",
            (F.col("s_pred") - F.col("s_true")).cast("long")
            .alias("margin_mu"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle texts (chained CTEs over the same parquet `documents` view)
# ---------------------------------------------------------------------------

def NB_MODEL_SQL(class_col: str = "lang", text_expr: str = "text",
                 table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT {class_col} AS cls, unnest({TOKENS_SQL(text_expr)}) AS tok
  FROM {table}
),
counts AS (
  SELECT cls, tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1, 2
),
cls_tot AS (
  SELECT cls, CAST(sum(cnt) AS BIGINT) AS cls_total FROM counts GROUP BY 1
),
vocab AS (
  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vsz FROM counts
)
SELECT c.cls, c.tok, c.cnt, t.cls_total, v.vsz,
       {_LP_TXT} AS lp_mu
FROM counts c
JOIN cls_tot t ON c.cls = t.cls
CROSS JOIN vocab v
"""


def _NB_SCORED_CTES(class_col: str, text_expr: str, id_col: str,
                    table: str) -> str:
    """Shared WITH-body through the (doc_id, cls, score_mu) matrix."""
    return f"""
WITH toks AS (
  SELECT {class_col} AS cls, unnest({TOKENS_SQL(text_expr)}) AS tok
  FROM {table}
),
counts AS (
  SELECT cls, tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1, 2
),
cls_tot AS (
  SELECT cls, CAST(sum(cnt) AS BIGINT) AS cls_total FROM counts GROUP BY 1
),
vocab AS (
  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vsz FROM counts
),
model AS (
  SELECT c.cls, c.tok, {_LP_TXT} AS lp_mu
  FROM counts c JOIN cls_tot t ON c.cls = t.cls CROSS JOIN vocab v
),
doc_toks AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS mult
  FROM (
    SELECT {id_col} AS doc_id, unnest({TOKENS_SQL(text_expr)}) AS tok
    FROM {table}
  ) GROUP BY 1, 2
),
n_docs AS (
  SELECT {class_col} AS cls, CAST(count(*) AS BIGINT) AS n_docs
  FROM {table} GROUP BY 1
),
total AS (
  SELECT CAST(count(*) AS BIGINT) AS total_docs FROM {table}
),
cls_info AS (
  SELECT t.cls, {_PRIOR_TXT} AS prior_mu, {_LP0_TXT} AS lp0_mu
  FROM cls_tot t CROSS JOIN vocab v
  JOIN n_docs n ON t.cls = n.cls
  CROSS JOIN total
),
scored AS (
  SELECT d.doc_id, i.cls,
         CAST(any_value(i.prior_mu)
              + sum(d.mult * coalesce(m.lp_mu, i.lp0_mu)) AS BIGINT)
           AS score_mu
  FROM doc_toks d
  CROSS JOIN cls_info i
  LEFT JOIN model m ON m.cls = i.cls AND m.tok = d.tok
  GROUP BY 1, 2
),
picked AS (
  SELECT doc_id, cls, score_mu,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_mu DESC, cls ASC) AS rn
  FROM scored
)"""


def NB_SCORES_SQL(class_col: str = "lang", text_expr: str = "text",
                  id_col: str = "doc_id", table: str = "documents") -> str:
    return f"""
{_NB_SCORED_CTES(class_col, text_expr, id_col, table)}
SELECT p.doc_id, p.cls AS pred_cls, p.score_mu,
       t.{class_col} AS true_cls,
       p.cls = t.{class_col} AS correct
FROM picked p
JOIN {table} t ON p.doc_id = t.{id_col}
WHERE p.rn = 1
"""


def NB_LABEL_NOISE_SQL(margin_mu: int, class_col: str = "lang",
                       text_expr: str = "text", id_col: str = "doc_id",
                       table: str = "documents") -> str:
    return f"""
{_NB_SCORED_CTES(class_col, text_expr, id_col, table)},
best AS (
  SELECT doc_id, cls AS pred_cls, score_mu AS s_pred
  FROM picked WHERE rn = 1
),
own AS (
  SELECT s.doc_id, t.{class_col} AS true_cls, s.score_mu AS s_true
  FROM scored s
  JOIN {table} t ON s.doc_id = t.{id_col} AND s.cls = t.{class_col}
)
SELECT b.doc_id, o.true_cls, b.pred_cls,
       CAST(b.s_pred - o.s_true AS BIGINT) AS margin_mu
FROM best b JOIN own o ON b.doc_id = o.doc_id
WHERE b.pred_cls <> o.true_cls AND b.s_pred - o.s_true > {margin_mu}
"""
