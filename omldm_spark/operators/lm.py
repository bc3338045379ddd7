"""Corpus-trained bigram language-model quality scoring.

The CCNet-style quality filter shape: fit an n-gram LM on the corpus, score
every document by how well the model predicts it, and filter/bucket on the
score. Real pipelines use a KenLM 5-gram trained on a trusted corpus; the
distributed shape is identical for the self-trained bigram model built
here, and the scoring pass is where all the data movement happens.

Exactness design (the repo's quantized-aggregation envelope): the per-bigram
conditional probability c(w1 w2)/c(w1 .) is carried as the INTEGER
floor(Q * c12 / c1) with Q = 1e6 — integer division (`div` in Spark SQL,
`//` in DuckDB), exact and order-independent — summed per document as a
BIGINT, with ONE mirrored float division at the end. Avoiding log() is
deliberate: IEEE-754 mandates correctly-rounded + - * / sqrt but NOT
transcendentals, so a log-based perplexity could differ between engines in
the last ulp; the mean conditional probability ranks documents for
filtering purposes without ever calling a transcendental.

Scale shape (documented per stage in bigram_lm_scores): counts are two
partial aggregations; the scoring join is keyed on the bigram with the
model side orders of magnitude smaller than the corpus (vocab^2 vs tokens)
— broadcast when it fits, AQE otherwise; per-doc bigrams are pre-combined
(doc_id, w1, w2, k) before the join so the join input is the doc's DISTINCT
bigrams, not every token position. The (doc_id, w1, w2, k) lineage feeds
both the model aggregation and the scoring join — in one Catalyst plan that
lineage is evaluated twice (model fit is a global aggregate, so no
single-pass rewrite exists); at 100 TB, materialize the combined bigram
frame (persist/checkpoint or a parquet stage boundary) so the tokenize +
explode runs once — the fit/score split real pipelines have anyway (the
reference LM is trained offline, CCNet §3).

Reference scope note: OMLDM scores models, not text (QueryResponse,
FlinkSpoke.scala); this operator is part of the beyond-reference
LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import TOKENS_SQL, tokens_col

PROB_QUANT = 1_000_000


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str,
                 extra_cols: tuple = ()) -> DataFrame:
    """(doc_id, *extra_cols, w1, w2, k): each document's bigrams with
    in-doc multiplicity. The tokens array is pinned in its own
    projection (see dedup.shingle_array note) and the bigram array is
    built with ONE transform over an index sequence — no self-join, no
    window.  ``extra_cols`` ride the derivation (r12-opt, the
    funnel_features discipline): doc-functional attributes like
    ``source`` join for free here — adding them to the groupBy keeps
    the groups identical while sparing consumers a fact-scale join
    back onto the corpus."""
    with_toks = docs.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        tokens_col(text_col).alias("_toks"), F.rand(31).alias("_p")
    ).drop("_p")
    bi = with_toks.select(
        F.col(id_col), *extra_cols,
        F.explode(
            F.when(
                F.size("_toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_toks") - 1),
                    lambda i: F.struct(
                        F.element_at("_toks", i.cast("int")).alias("w1"),
                        F.element_at("_toks", (i + 1).cast("int")).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("b"),
    )
    return bi.select(id_col, *extra_cols, "b.w1", "b.w2").groupBy(
        id_col, *extra_cols, "w1", "w2"
    ).agg(F.count(F.lit(1)).cast("long").alias("k"))


def bigram_lm_scores(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     quant: int = PROB_QUANT) -> DataFrame:
    """Score = mean conditional bigram probability under the corpus-trained
    model (self-counts included — the model sees the whole corpus, as a
    quality filter's reference LM sees its training set).

    Output: (doc_id, n_bigrams, q_score, avg_prob) where
    q_score = Σ_positions floor(quant * c12 / c1)  (exact BIGINT) and
    avg_prob = q_score / (n_bigrams * quant)       (one mirrored division).
    Documents with < 2 tokens are absent (no bigrams — identical on both
    engines)."""
    db = _doc_bigrams(docs, text_col, id_col)
    # model: c12 per bigram, c1 = Σ_w2 c12 (derived from the counts frame,
    # NOT re-aggregated from the corpus — second shuffle is vocab-sized)
    c12 = db.groupBy("w1", "w2").agg(F.sum("k").cast("long").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    model = c12.join(c1, "w1").select(
        "w1", "w2",
        F.expr(f"(CAST({quant} AS BIGINT) * c12) div c1").alias("qp"),
    )
    scored = db.join(model, ["w1", "w2"]).groupBy(id_col).agg(
        F.sum(F.col("k") * F.col("qp")).cast("long").alias("q_score"),
        F.sum("k").cast("long").alias("n_bigrams"),
    )
    return scored.select(
        F.col(id_col).cast("long").alias(id_col),
        "n_bigrams",
        "q_score",
        (F.col("q_score").cast("double")
         / (F.col("n_bigrams").cast("double") * F.lit(float(quant)))
         ).alias("avg_prob"),
    )


def BIGRAM_LM_SQL(table: str = "documents", text_expr: str = "text",
                  id_col: str = "doc_id", quant: int = PROB_QUANT) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({TOKENS_SQL(text_expr)}) AS tok,
         generate_subscripts({TOKENS_SQL(text_expr)}, 1) AS pos
  FROM {table}
),
bi AS (
  SELECT {id_col}, tok AS w1, lead(tok, 1) OVER w AS w2
  FROM toks WINDOW w AS (PARTITION BY {id_col} ORDER BY pos)
),
db AS (
  SELECT {id_col}, w1, w2, CAST(count(*) AS BIGINT) AS k
  FROM bi WHERE w2 IS NOT NULL GROUP BY 1, 2, 3
),
c12 AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c12 FROM db GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
model AS (
  SELECT c12.w1, c12.w2,
         (CAST({quant} AS BIGINT) * c12.c12) // c1.c1 AS qp
  FROM c12 JOIN c1 USING (w1)
),
scored AS (
  SELECT db.{id_col},
         CAST(sum(db.k * m.qp) AS BIGINT) AS q_score,
         CAST(sum(db.k) AS BIGINT) AS n_bigrams
  FROM db JOIN model m ON db.w1 = m.w1 AND db.w2 = m.w2
  GROUP BY 1
)
SELECT CAST({id_col} AS BIGINT) AS {id_col}, n_bigrams, q_score,
       CAST(q_score AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * {quant}.0)
         AS avg_prob
FROM scored
"""


# ---------------------------------------------------------------------------
# BPE trainer step: one merge round over the corpus
# ---------------------------------------------------------------------------

def bpe_merge_round(docs: DataFrame, text_col: str = "text",
                    ) -> DataFrame:
    """One byte-pair-encoding training round: find the most frequent
    adjacent character pair across the corpus and report the merge
    decision plus its effect on the symbol count — the inner-loop
    primitive of every BPE/WordPiece tokenizer trainer (Sennrich et al.
    2016), distributed.

    The scale trick (the one real BPE trainers use): pair statistics are
    computed over the TOKEN VOCABULARY weighted by token frequency, never
    over raw corpus positions. One hash-groupBy collapses the corpus to
    distinct tokens (map-side combine does almost all of it); the
    character-position explode then runs over the vocabulary — thousands
    of rows — regardless of corpus size. Everything downstream of the
    first groupBy is vocabulary-scale.

    Merge-count semantics: occurrences count greedily left-to-right
    without overlap — (len - len(replace(tok, pair, ''))) / 2, identical
    in Spark and DuckDB ('aaa' with pair 'aa' -> 1 merge), matching the
    single-pass merge application of reference BPE implementations.

    Output (one row): (w1, w2, pair_cnt, n_syms_before, n_merges,
    n_syms_after) — all exact integers/strings; the chosen pair breaks
    frequency ties by (w1, w2) lexicographic order on both engines.
    """
    vocab = (
        docs.select(F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tok_cnt"))
    )
    pairs = (
        vocab.filter(F.length("tok") >= 2)
        .select(
            "tok", "tok_cnt",
            F.explode(F.sequence(F.lit(1), F.length("tok") - 1)).alias("i"),
        )
        .select(
            F.expr("substr(tok, i, 1)").alias("w1"),
            F.expr("substr(tok, i + 1, 1)").alias("w2"),
            "tok_cnt",
        )
        .groupBy("w1", "w2")
        .agg(F.sum("tok_cnt").cast("long").alias("pair_cnt"))
    )
    chosen = pairs.orderBy(
        F.col("pair_cnt").desc(), F.col("w1"), F.col("w2")
    ).limit(1)
    stats = vocab.crossJoin(F.broadcast(chosen)).agg(
        F.max("w1").alias("w1"),
        F.max("w2").alias("w2"),
        F.max("pair_cnt").cast("long").alias("pair_cnt"),
        F.sum(F.length("tok") * F.col("tok_cnt")).cast("long")
         .alias("n_syms_before"),
        F.sum(
            F.expr(
                "(length(tok) - length(replace(tok, w1 || w2, ''))) div 2"
            ) * F.col("tok_cnt")
        ).cast("long").alias("n_merges"),
    )
    return stats.select(
        "w1", "w2", "pair_cnt", "n_syms_before", "n_merges",
        (F.col("n_syms_before") - F.col("n_merges")).cast("long")
         .alias("n_syms_after"),
    )


def BPE_MERGE_SQL(table: str = "documents", text_expr: str = "text") -> str:
    return f"""
WITH vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS tok_cnt
  FROM (SELECT unnest({TOKENS_SQL(text_expr)}) AS tok FROM {table})
  GROUP BY tok
),
pairs AS (
  SELECT substr(tok, CAST(u.i AS INTEGER), 1) AS w1,
         substr(tok, CAST(u.i AS INTEGER) + 1, 1) AS w2,
         CAST(sum(tok_cnt) AS BIGINT) AS pair_cnt
  FROM vocab, unnest(range(1, CAST(length(tok) AS BIGINT))) AS u(i)
  WHERE length(tok) >= 2
  GROUP BY 1, 2
),
chosen AS (
  SELECT * FROM pairs ORDER BY pair_cnt DESC, w1, w2 LIMIT 1
),
stats AS (
  SELECT max(c.w1) AS w1, max(c.w2) AS w2,
         CAST(max(c.pair_cnt) AS BIGINT) AS pair_cnt,
         CAST(sum(length(v.tok) * v.tok_cnt) AS BIGINT) AS n_syms_before,
         CAST(sum(((length(v.tok)
                    - length(replace(v.tok, c.w1 || c.w2, ''))) // 2)
                  * v.tok_cnt) AS BIGINT) AS n_merges
  FROM vocab v, chosen c
)
SELECT w1, w2, pair_cnt, n_syms_before, n_merges,
       CAST(n_syms_before - n_merges AS BIGINT) AS n_syms_after
FROM stats
"""


def bpe_train(docs: DataFrame, n_merges: int = 3,
              text_col: str = "text") -> DataFrame:
    """BPE tokenizer training, ``n_merges`` rounds: returns the merge table
    (merge_round, w1, w2, pair_cnt) — the artifact a tokenizer ships.

    Architecture (the one real BPE trainers use, e.g. the public
    HuggingFace tokenizers trainer): ONE corpus-scale aggregation
    collapses the corpus to the frequency-weighted token vocabulary; every
    merge round then runs on the vocabulary frame (thousands of rows at
    any corpus size) — pair counting is a tiny groupBy, the chosen pair
    (2 strings) is the only thing the driver sees, and the merge applies
    as a literal string replace on the space-separated symbol sequence
    (greedy non-overlapping, ' a b ' -> ' ab ' with space sentinels —
    engine-identical semantics, see bpe_merge_round).

    Symbols never contain spaces (symbols are built by concatenating
    non-space characters), so the space-separated representation is
    unambiguous at every round. Ties break by (cnt DESC, w1, w2) —
    deterministic on both engines.
    """
    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            F.concat_ws(" ", F.split(F.col("tok"), "")).alias("seq"), "cnt"
        )
    )
    vocab.persist()
    merges = []
    try:
        for r in range(n_merges):
            syms = F.split(F.col("seq"), " ")
            pairs = (
                vocab.select(
                    syms.alias("syms"), "cnt",
                    F.explode(
                        F.sequence(F.lit(1), F.greatest(
                            F.size(syms) - 1, F.lit(0)))
                    ).alias("i"),
                )
                .filter(F.size("syms") >= 2)
                .select(
                    F.element_at("syms", F.col("i")).alias("w1"),
                    F.element_at("syms", F.col("i") + 1).alias("w2"),
                    "cnt",
                )
                .groupBy("w1", "w2")
                .agg(F.sum("cnt").cast("long").alias("pair_cnt"))
            )
            top = pairs.orderBy(
                F.col("pair_cnt").desc(), F.col("w1"), F.col("w2")
            ).limit(1).collect()
            if not top:
                break
            w1, w2, cnt = top[0]["w1"], top[0]["w2"], top[0]["pair_cnt"]
            merges.append((r, w1, w2, int(cnt)))
            nxt = vocab.select(
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                        F.lit(f" {w1} {w2} "),
                        F.lit(f" {w1}{w2} "),
                    )
                ).alias("seq"),
                "cnt",
            )
            nxt.persist()
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return spark.createDataFrame(
        merges, "merge_round long, w1 string, w2 string, pair_cnt long"
    )


def BPE_TRAIN_SQL(n_merges: int = 3, table: str = "documents",
                  text_expr: str = "text") -> str:
    ctes = [
        f"""v0 AS (
  SELECT array_to_string(string_split(tok, ''), ' ') AS seq,
         CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({TOKENS_SQL(text_expr)}) AS tok FROM {table})
  GROUP BY tok
)"""
    ]
    for r in range(n_merges):
        ctes.append(f"""p{r} AS (
  SELECT syms[CAST(u.i AS INTEGER)] AS w1,
         syms[CAST(u.i AS INTEGER) + 1] AS w2,
         CAST(sum(cnt) AS BIGINT) AS pair_cnt
  FROM (SELECT string_split(seq, ' ') AS syms, cnt FROM v{r}),
       unnest(range(1, CAST(len(syms) AS BIGINT))) AS u(i)
  WHERE len(syms) >= 2
  GROUP BY 1, 2
)""")
        ctes.append(
            f"c{r} AS (SELECT * FROM p{r} "
            f"ORDER BY pair_cnt DESC, w1, w2 LIMIT 1)"
        )
        if r + 1 < n_merges:
            ctes.append(f"""v{r + 1} AS (
  SELECT trim(replace(' ' || v.seq || ' ',
                      ' ' || c.w1 || ' ' || c.w2 || ' ',
                      ' ' || c.w1 || c.w2 || ' ')) AS seq, v.cnt
  FROM v{r} v, c{r} c
)""")
    finals = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, w1, w2, pair_cnt "
        f"FROM c{r}"
        for r in range(n_merges)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + finals


def bpe_encode_vocab(docs: DataFrame, n_merges: int = 3,
                     text_col: str = "text") -> DataFrame:
    """Apply the trained BPE merges — the ENCODE half of the tokenizer
    loop (train with :func:`bpe_train`, then this encodes the corpus).
    Returns corpus frequencies of every merged symbol (len >= 2).

    The load-bearing trick: encoding is deterministic per token TYPE, so
    the corpus never re-encodes — the frequency-weighted VOCABULARY
    (thousands of rows at any corpus size) encodes once and corpus
    symbol counts are a weighted sum over it.  A 100 TB corpus pays one
    token-count aggregation; everything after is vocab-scale.  Merges
    apply in training order as literal space-sentinel replaces (the
    exact mechanism the trainer used, so train->encode round-trips)."""
    merges = [(r["w1"], r["w2"])
              for r in bpe_train(docs, n_merges, text_col)
              .orderBy("merge_round").collect()]
    vocab = (
        docs.select(F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            F.concat_ws(" ", F.split(F.col("tok"), "")).alias("seq"), "cnt"
        )
    )
    for w1, w2 in merges:
        vocab = vocab.select(
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                    F.lit(f" {w1} {w2} "),
                    F.lit(f" {w1}{w2} "),
                )
            ).alias("seq"),
            "cnt",
        )
    return (
        vocab.select(F.explode(F.split("seq", " ")).alias("symbol"), "cnt")
        .filter(F.length("symbol") >= 2)
        .groupBy("symbol")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def BPE_ENCODE_SQL(n_merges: int = 3, table: str = "documents",
                   text_expr: str = "text") -> str:
    """Oracle for :func:`bpe_encode_vocab`: the trainer's CTE chain
    extended through the LAST vocabulary state, then symbol counts."""
    ctes = [
        f"""v0 AS (
  SELECT array_to_string(string_split(tok, ''), ' ') AS seq,
         CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({TOKENS_SQL(text_expr)}) AS tok FROM {table})
  GROUP BY tok
)"""
    ]
    for r in range(n_merges):
        ctes.append(f"""p{r} AS (
  SELECT syms[CAST(u.i AS INTEGER)] AS w1,
         syms[CAST(u.i AS INTEGER) + 1] AS w2,
         CAST(sum(cnt) AS BIGINT) AS pair_cnt
  FROM (SELECT string_split(seq, ' ') AS syms, cnt FROM v{r}),
       unnest(range(1, CAST(len(syms) AS BIGINT))) AS u(i)
  WHERE len(syms) >= 2
  GROUP BY 1, 2
)""")
        ctes.append(
            f"c{r} AS (SELECT * FROM p{r} "
            f"ORDER BY pair_cnt DESC, w1, w2 LIMIT 1)"
        )
        ctes.append(f"""v{r + 1} AS (
  SELECT trim(replace(' ' || v.seq || ' ',
                      ' ' || c.w1 || ' ' || c.w2 || ' ',
                      ' ' || c.w1 || c.w2 || ' ')) AS seq, v.cnt
  FROM v{r} v, c{r} c
)""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT symbol, CAST(sum(cnt) AS BIGINT) AS cnt
FROM (
  SELECT unnest(string_split(seq, ' ')) AS symbol, cnt FROM v{n_merges}
)
WHERE len(symbol) >= 2
GROUP BY symbol"""
    )


# ---------------------------------------------------------------------------
# PMI collocations (corpus phrase mining)
# ---------------------------------------------------------------------------

# the one shared double-expression: identical text runs on both engines, so
# the single ln() sees bit-identical operands (all inputs exact BIGINTs,
# composed as moderate ratios — no >2^53 products anywhere)
_PMI_EXPR = (
    "CAST(floor(ln((CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))"
    " * (CAST(t1 AS DOUBLE) / CAST(c2 AS DOUBLE))"
    " * (CAST(t1 AS DOUBLE) / CAST(t2 AS DOUBLE)))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)


def pmi_collocations(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", min_count: int = 5,
                     topk: int = 50) -> DataFrame:
    """Top-``topk`` collocations by pointwise mutual information
    (Church & Hanks, CL 1990): bigrams whose corpus probability most
    exceeds independence, PMI = ln(p12 / (p1 p2)) with p12 = c12/T2,
    p_w = c_w/T1 — the phrase-mining filter (new-york, machine-learning)
    a tokenizer/vocab pipeline runs before merging multiword units.

    All counts are exact BIGINTs off TWO map-side-combined aggs (bigram
    pairs + unigrams, both derived from the same tokens projection); the
    PMI is ONE ln() over a product of moderate ratios — no integer
    product ever approaches 2^53, so the double is loss-free and the
    HALF-UP ppm quantization is engine-exact.  The ``min_count`` floor
    kills hapax pairs (PMI's classic failure mode) and bounds the ranked
    set; the final global top-k window feeds the pair AGGREGATE, never
    row-scale data.  Margins join on vocab-scale keys (w1/w2 keyed
    shuffles); totals broadcast as one-row frames."""
    db = _doc_bigrams(docs, text_col, id_col)
    c12 = (
        db.groupBy("w1", "w2")
        .agg(F.sum("k").cast("long").alias("c12"))
    )
    uni = (
        docs.select(F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    t1 = uni.agg(F.sum("c").cast("long").alias("t1"))
    t2 = c12.agg(F.sum("c12").cast("long").alias("t2"))
    w = Window.orderBy(F.desc("pmi_ppm"), "w1", "w2")
    scored = (
        c12.filter(F.col("c12") >= min_count)
        .join(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1")),
              "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2")),
              "w2")
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .select("w1", "w2", "c12", "c1", "c2",
                F.expr(_PMI_EXPR).alias("pmi_ppm"))
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
    )


def PMI_COLLOCATIONS_SQL(table: str = "documents", text_expr: str = "text",
                         id_col: str = "doc_id", min_count: int = 5,
                         topk: int = 50) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({TOKENS_SQL(text_expr)}) AS tok,
         generate_subscripts({TOKENS_SQL(text_expr)}, 1) AS pos
  FROM {table}
),
bi AS (
  SELECT {id_col}, tok AS w1, lead(tok, 1) OVER w AS w2
  FROM toks WINDOW w AS (PARTITION BY {id_col} ORDER BY pos)
),
db AS (
  SELECT {id_col}, w1, w2, CAST(count(*) AS BIGINT) AS k
  FROM bi WHERE w2 IS NOT NULL GROUP BY 1, 2, 3
),
c12 AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c12 FROM db GROUP BY 1, 2),
uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
t1 AS (SELECT CAST(sum(c) AS BIGINT) AS t1 FROM uni),
t2 AS (SELECT CAST(sum(c12) AS BIGINT) AS t2 FROM c12),
scored AS (
  SELECT w1, w2, c12, c1, c2, {_PMI_EXPR} AS pmi_ppm
  FROM (
    SELECT p.w1, p.w2, p.c12, u1.c AS c1, u2.c AS c2,
           t1.t1 AS t1, t2.t2 AS t2
    FROM c12 p
    JOIN uni u1 ON u1.tok = p.w1
    JOIN uni u2 ON u2.tok = p.w2
    CROSS JOIN t1 CROSS JOIN t2
    WHERE p.c12 >= {min_count}
  )
)
SELECT w1, w2, c12, c1, c2, pmi_ppm,
       CAST(row_number() OVER (ORDER BY pmi_ppm DESC, w1, w2)
            AS BIGINT) AS rank
FROM scored
QUALIFY row_number() OVER (ORDER BY pmi_ppm DESC, w1, w2) <= {topk}
"""


# ---------------------------------------------------------------------------
# PLSA topic-model EM round (distributed EM over the inverted index)
# ---------------------------------------------------------------------------

def _plsa_fold(expr: str) -> str:
    """Engine-shared 48-bit md5 fold — ONE definition for the whole
    repo (operators/corpus.u48_fold_sql): hash-critical generated SQL
    must not exist in two copies that can drift (the NOTES_r4
    ANSI-overflow CAST fix only reached the original; review r9)."""
    from .corpus import u48_fold_sql

    return u48_fold_sql(expr)


def _plsa_aff(kind: str, col: str, z: int) -> str:
    """Deterministic integer affinity in [1, 997]: the EM seed.  A pure
    function of the (term|doc, topic) pair via the shared md5 fold, so
    both engines start from the identical initialization."""
    seed = f"concat('{kind}:', {col}, ':', '{z}')"
    return f"(1 + ({_plsa_fold(seed)} % 997))"


def _plsa_r_ppm(z: int, k: int) -> str:
    """E-step responsibility r(z | d, w) in floor-ppm as ONE shared-text
    expression over columns (doc, term): r ∝ b(d,z)·a(w,z) with the
    normalizer a literal sum over the k topics — entirely map-side, no
    shuffle, no window.  Envelope: b·a <= 997^2, ×1e6 <= ~1e12 < 2^53,
    so the double floor-division is exact and engine-identical."""
    terms = [f"({_plsa_aff('d', 'doc', zz)} * {_plsa_aff('w', 'term', zz)})"
             for zz in range(k)]
    num = terms[z]
    den = " + ".join(terms)
    return (f"CAST(floor(CAST({num} AS DOUBLE)"
            f" * CAST(1000000.0 AS DOUBLE)"
            f" / CAST(({den}) AS DOUBLE)) AS BIGINT)")


def _plsa_with_r(posts: DataFrame, k: int) -> DataFrame:
    """E-step responsibilities via broadcast DIMENSION frames
    (r12-opt, second iteration): the 2k md5 affinities are pure
    functions of the DISTINCT doc / term keys, so they are computed
    once per key on two key-scale frames and broadcast-joined onto
    the postings — ~|docs|+|vocab| md5 folds total instead of
    8 × |postings| inline evaluations.  The r_z arithmetic then runs
    on plain integer columns.  Measured (sf0.1, interleaved A/B ×2):
    plsa_round 6.4-8.1 s inline -> **2.7-4.5 s** here, bit-identical
    output.  The two earlier factored shapes (affinity columns per
    POSTING row) measured 2.2x SLOWER than inline — the md5-dense
    per-row projection trips the 64 KB codegen fallback and evaluates
    interpreted; per-key dimension frames sidestep that entirely.
    This is also the blessed 100 TB shape: the factor matrices of a
    real multi-round EM are exactly these vocab×k / docs×k broadcast
    frames.  Both consumers (plsa_round, plsa_second_round) produce
    rows identical to the shared oracle text (same integer products,
    same double casts, same floor; collect-compare equal at sf0.1)."""
    docdim = posts.select("doc").distinct().select(
        "doc",
        *[F.expr(_plsa_aff("d", "doc", z)).alias(f"_bd{z}")
          for z in range(k)],
    )
    termdim = posts.select("term").distinct().select(
        "term",
        *[F.expr(_plsa_aff("w", "term", z)).alias(f"_aw{z}")
          for z in range(k)],
    )
    aff = (
        posts.join(F.broadcast(docdim), "doc")
        .join(F.broadcast(termdim), "term")
    )
    den = " + ".join(f"(_bd{z} * _aw{z})" for z in range(k))
    return aff.select(
        "doc", "term", "tf",
        *[F.expr(
            f"CAST(floor(CAST((_bd{z} * _aw{z}) AS DOUBLE)"
            f" * CAST(1000000.0 AS DOUBLE)"
            f" / CAST(({den}) AS DOUBLE)) AS BIGINT)").alias(f"r{z}")
          for z in range(k)],
    )


def plsa_round(docs: DataFrame, k: int = 4, top_n: int = 15,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """One exact EM round of PLSA (Hofmann SIGIR'99) over the corpus:
    from a deterministic seeded factorization p(z|d) ∝ b(d,z),
    p(w|z) ∝ a(w,z), compute the E-step responsibilities r(z|d,w) and
    the M-step topic-term counts n̂(w,z) = Σ_d tf(d,w)·r(z|d,w); report
    the ``top_n`` terms per topic by n̂ (the topic keyword view).

    Output: (topic, term, n_hat_q, rank) — n̂ carried as the exact
    BIGINT Σ tf·r_ppm (per-row tf·r <= 1e4·1e6 = 1e10; a term-topic
    group overflows int64 only past ~9e8 posting rows for ONE term,
    beyond any real corpus' document frequency).

    Scale shape — the part that matters at 100 TB: the E-step's 2k
    md5 affinities ride broadcast doc/term DIMENSION frames (one fold
    per distinct key — `_plsa_with_r`), exactly the vocab×k / docs×k
    factor matrices a real multi-round EM persists and broadcasts;
    the responsibilities and the per-(d,w) normalizer are then plain
    integer arithmetic over those columns (k is a model constant, so
    no per-topic shuffle, no shuffled join).  The only shuffles are
    the postings groupBy (map-side combined) and the (term, topic)
    M-step aggregation; the final top-n window partitions by topic
    over the vocab-sized aggregate.

    Reference scope note: OMLDM has no topic-model surface (its
    learners are supervised, OMLDM §2.9); beyond-reference charter."""
    from .retrieval import postings

    posts = postings(docs, text_col, id_col).select(
        F.col(id_col).alias("doc"), "term", "tf")
    # r12-opt: broadcast dimension-frame affinities (see _plsa_with_r)
    # — 2.4x faster than the inline literals, bit-identical
    with_r = _plsa_with_r(posts, k)
    # r13-opt: M-step as a k-WIDE term-keyed aggregate (one sum(tf*r_z)
    # column per topic — the same integer addends the (topic, term)
    # groupBy over the k-stacked frame summed), so the posting frame is
    # never exploded k ways through the exchange; the stack runs at
    # VOCAB scale on the aggregated frame
    nhatw = with_r.groupBy("term").agg(
        *[F.sum(F.col("tf") * F.col(f"r{z}")).cast("long")
          .alias(f"nh{z}") for z in range(k)])
    nhat = nhatw.selectExpr(
        "term",
        "stack(" + str(k) + ", "
        + ", ".join(f"CAST({z} AS BIGINT), nh{z}" for z in range(k))
        + ") AS (topic, n_hat_q)",
    ).select("topic", "term", "n_hat_q")
    w = Window.partitionBy("topic").orderBy(
        F.desc("n_hat_q"), F.asc("term"))
    return (
        nhat.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
    )


def PLSA_ROUND_SQL(k: int = 4, top_n: int = 15, table: str = "documents",
                   text_expr: str = "text",
                   id_col: str = "doc_id") -> str:
    """DuckDB mirror: identical fold, affinities, and floor-ppm E-step
    (shared expression text); the k-way stack becomes a UNION ALL."""
    branches = "\nUNION ALL ".join(
        f"SELECT CAST({z} AS BIGINT) AS topic, term, tf,"
        f" {_plsa_r_ppm(z, k)} AS r_ppm FROM posts"
        for z in range(k)
    )
    return f"""
WITH toked AS (
  SELECT {id_col}, {TOKENS_SQL(text_expr)} AS toks FROM {table}
),
posts AS (
  SELECT term, {id_col} AS doc, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT {id_col}, unnest(toks) AS term FROM toked)
  GROUP BY term, {id_col}
),
resp AS (
{branches}
),
nhat AS (
  SELECT topic, term, CAST(sum(tf * r_ppm) AS BIGINT) AS n_hat_q
  FROM resp GROUP BY 1, 2
)
SELECT topic, term, n_hat_q,
       CAST(row_number() OVER (PARTITION BY topic
                               ORDER BY n_hat_q DESC, term) AS BIGINT)
         AS rank
FROM nhat
QUALIFY row_number() OVER (PARTITION BY topic
                           ORDER BY n_hat_q DESC, term) <= {top_n}
"""


def plsa_second_round(docs: DataFrame, k: int = 4, top_n: int = 15,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      cache_out: list | None = None) -> DataFrame:
    """TWO exact EM rounds of PLSA — the round where real EM structure
    appears.  Round 1's responsibilities are closed-form (plsa_round);
    round 2 re-estimates BOTH factors from round 1's M-step and runs a
    genuine factor-join E-step:

      a2(w,z) = n̂1(w,z)·1e6 div Σ_z n̂1(w,·)     (term-keyed share)
      b2(d,z) = m̂1(d,z)·1e6 div Σ_z m̂1(d,·)     (doc-keyed share,
                 m̂1(d,z) = Σ_w tf·r1 — the p(z|d) M-step)
      r2(z|d,w) = b2·a2·1e6 div Σ_z b2·a2        (pure integer, exact)

    and reports round 2's top terms per topic: (topic, term, n_hat2_q,
    rank).

    Scale shape (r13-opt — the round-2 E-step now rides the SAME
    broadcast-dimension discipline as round 1, VERDICT r12 item 3):
    round 1's responsibilities materialize ONCE (persist) and feed
    both M-step aggregations as k-WIDE keyed aggregates (one
    sum(tf·r_z) column per topic — no posting-scale stack explosion
    through the exchange); the updated factors a2/b2 are then k-wide
    KEY-SCALE dimension frames (term → [a2_0..a2_{k-1}], doc →
    [b2_0..b2_{k-1}] — exactly the vocab×k / docs×k factor matrices a
    real multi-round EM persists and broadcasts) that broadcast-join
    onto the persisted postings, and the per-(d,w) normalizer is the
    row-local sum of the k num_z columns — no shuffled posting-scale
    join, no (doc, term) window, no k× row multiplication before the
    M-step.  The round-2 M-step aggregates k wide sums per term and
    stacks to (topic, term) at VOCAB scale.  Measured (sf0.1,
    interleaved A/B): 4.0 s → ~2 s; plan: 2 posting-scale
    SortMergeJoins + 1 posting-scale Window → 2 BroadcastHashJoins,
    Window only in the final vocab-scale top-n.

    Exactness envelope: r ≤ 1e6, so n̂1(w,z) ≤ 1e6·ctf(w) and the a2
    numerator n̂1·1e6 ≤ 1e12·ctf(w) — int64-exact through ctf(w) ≈
    9.2e6 corpus occurrences of one term; beyond that, downscale n̂1
    (÷2^20) before the share with no other change.  Every division is
    positive-integer div — bit-identical on both engines.  b2·a2 ≤
    1e12, ·1e6 ≤ 1e18 < int64 max.  Floor-ppm responsibilities CAN
    be zero (1e6/(k·997²) < 1 for k ≥ 2), so a (doc, term) pair whose
    doc-share and term-share supports are disjoint would see a ZERO
    round-2 normalizer — guarded: such pairs carry r2 = 0 for every
    topic (explicit, engine-identical) instead of a NULL that silently
    drops their M-step mass."""
    from pyspark.sql import Window as W

    from .retrieval import postings

    # persist POSTS, not the k-times-larger stacked frame: posts feeds
    # three consumers (nhat1, mdoc1 via the stack — a map-only
    # re-expansion from cache — and the round-2 E-step join), so this
    # caches 1/k the bytes and avoids re-running the corpus tokenize +
    # (term, doc) groupBy for the join (review r9).  ``cache_out``
    # collects the persisted handle so sweep/iterative callers can
    # unpersist after materializing the result (the oriented_triangles
    # discipline) instead of leaking one CacheManager entry per call
    posts = postings(docs, text_col, id_col).select(
        F.col(id_col).alias("doc"), "term", "tf").persist()
    if cache_out is not None:
        cache_out.append(posts)
    # r12-opt: the dimension-join E-step (see _plsa_with_r) persists —
    # the stacked frame is consumed twice (nhat1 + mdoc1) and the lazy
    # form re-built the broadcast dims and both joins per consumer
    with_r = _plsa_with_r(posts, k).persist()
    if cache_out is not None:
        cache_out.append(with_r)
    # round-1 M-steps as k-WIDE keyed aggregates: one sum(tf*r_z)
    # column per topic, grouped by the key alone — the same integer
    # addends the (key, topic) groupBy over the k-stacked frame
    # summed, without exploding the posting frame k ways through the
    # exchange (r13-opt; the stack happens at KEY scale below)
    nhat1w = with_r.groupBy("term").agg(
        *[F.sum(F.col("tf") * F.col(f"r{z}")).cast("long")
          .alias(f"nh{z}") for z in range(k)])
    mdoc1w = with_r.groupBy("doc").agg(
        *[F.sum(F.col("tf") * F.col(f"r{z}")).cast("long")
          .alias(f"mh{z}") for z in range(k)])
    # the updated factors as k-wide KEY-SCALE dimension frames; the
    # normalizing total is the row-local sum of the k columns (equal
    # to the old per-key groupBy total — same addends)
    nh_tot = " + ".join(f"nh{z}" for z in range(k))
    mh_tot = " + ".join(f"mh{z}" for z in range(k))
    a2w = nhat1w.select(
        "term",
        *[F.expr(f"CAST(nh{z} * 1000000 div ({nh_tot}) AS BIGINT)")
          .alias(f"a2_{z}") for z in range(k)])
    b2w = mdoc1w.select(
        "doc",
        *[F.expr(f"CAST(mh{z} * 1000000 div ({mh_tot}) AS BIGINT)")
          .alias(f"b2_{z}") for z in range(k)])
    # round-2 E-step: broadcast both factor frames onto the persisted
    # postings (the _plsa_with_r discipline applied to the UPDATED
    # factors); num_z and the (d, w) normalizer are plain row-local
    # integer arithmetic — the old posting-scale b2/a2 shuffled joins
    # and the (doc, term) window no longer exist
    joined = (
        posts.join(F.broadcast(b2w), "doc")
        .join(F.broadcast(a2w), "term")
        .select(
            "term", "tf",
            *[(F.col(f"b2_{z}") * F.col(f"a2_{z}")).alias(f"num{z}")
              for z in range(k)])
    )
    # guard: floor-ppm responsibilities CAN be zero (1e6/(k*997^2) < 1
    # for k >= 2), so a (doc, term) whose doc-share and term-share
    # supports are disjoint has sum(num_z) = 0 — div would NULL the row
    # and silently drop its M-step mass (review r9); such pairs carry
    # r2 = 0 for every topic instead, on both engines
    den = " + ".join(f"num{z}" for z in range(k))
    r2 = joined.select(
        "term", "tf",
        *[F.expr(f"CASE WHEN ({den}) = 0 THEN CAST(0 AS BIGINT)"
                 f" ELSE CAST(num{z} * 1000000 div ({den}) AS BIGINT)"
                 " END").alias(f"r2_{z}") for z in range(k)])
    # round-2 M-step, k-wide by term; the k-way stack runs at VOCAB
    # scale on the aggregated frame
    nhat2w = r2.groupBy("term").agg(
        *[F.sum(F.col("tf") * F.col(f"r2_{z}")).cast("long")
          .alias(f"n2_{z}") for z in range(k)])
    nhat2 = nhat2w.selectExpr(
        "term",
        "stack(" + str(k) + ", "
        + ", ".join(f"CAST({z} AS BIGINT), n2_{z}" for z in range(k))
        + ") AS (topic, n_hat2_q)",
    ).select("topic", "term", "n_hat2_q")
    wtop = W.partitionBy("topic").orderBy(F.desc("n_hat2_q"),
                                          F.asc("term"))
    return (
        nhat2.withColumn("rank", F.row_number().over(wtop).cast("long"))
        .filter(F.col("rank") <= top_n)
    )


def PLSA_TWO_ROUNDS_SQL(k: int = 4, top_n: int = 15,
                        table: str = "documents",
                        text_expr: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB mirror: identical round-1 responsibilities, shares, and
    integer round-2 E-step."""
    branches = "\nUNION ALL ".join(
        f"SELECT CAST({z} AS BIGINT) AS topic, doc, term, tf,"
        f" {_plsa_r_ppm(z, k)} AS r_ppm FROM posts"
        for z in range(k)
    )
    return f"""
WITH toked AS (
  SELECT {id_col}, {TOKENS_SQL(text_expr)} AS toks FROM {table}
),
posts AS (
  SELECT term, {id_col} AS doc, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT {id_col}, unnest(toks) AS term FROM toked)
  GROUP BY term, {id_col}
),
resp AS (
{branches}
),
nhat1 AS (
  SELECT term, topic, CAST(sum(tf * r_ppm) AS BIGINT) AS nh
  FROM resp GROUP BY 1, 2
),
mdoc1 AS (
  SELECT doc, topic, CAST(sum(tf * r_ppm) AS BIGINT) AS mh
  FROM resp GROUP BY 1, 2
),
a2 AS (
  SELECT term, topic,
         CAST(nh * 1000000 // sum(nh) OVER (PARTITION BY term)
              AS BIGINT) AS a2
  FROM nhat1
),
b2 AS (
  SELECT doc, topic,
         CAST(mh * 1000000 // sum(mh) OVER (PARTITION BY doc)
              AS BIGINT) AS b2
  FROM mdoc1
),
joined AS (
  SELECT p.doc, p.term, p.tf, b.topic, b.b2 * a.a2 AS num
  FROM posts p
  JOIN b2 b ON b.doc = p.doc
  JOIN a2 a ON a.term = p.term AND a.topic = b.topic
),
r2 AS (
  SELECT doc, term, tf, topic,
         CASE WHEN sum(num) OVER (PARTITION BY doc, term) = 0
              THEN CAST(0 AS BIGINT)
              ELSE CAST(num * 1000000
                        // sum(num) OVER (PARTITION BY doc, term)
                        AS BIGINT) END AS r2_ppm
  FROM joined
),
nhat2 AS (
  SELECT topic, term, CAST(sum(tf * r2_ppm) AS BIGINT) AS n_hat2_q
  FROM r2 GROUP BY 1, 2
)
SELECT topic, term, n_hat2_q,
       CAST(row_number() OVER (PARTITION BY topic
                               ORDER BY n_hat2_q DESC, term) AS BIGINT)
         AS rank
FROM nhat2
QUALIFY row_number() OVER (PARTITION BY topic
                           ORDER BY n_hat2_q DESC, term) <= {top_n}
"""


KN_DISCOUNT_PPM = 750_000  # the standard d = 0.75 absolute discount


def kneser_ney_bigram(docs: DataFrame, top_n: int = 25,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      cache_out: list | None = None) -> DataFrame:
    """Interpolated Kneser-Ney smoothed bigram probabilities — the
    smoothing behind the KenLM quality filters of CCNet-style corpus
    curation (the repo's bigram_lm_scores uses raw MLE; KN is what a
    production filter trains):

      P_KN(w2|w1) = max(c12 - d, 0)/c1
                    + (d * N1+(w1,.)/c1) * (N1+(.,w2)/B)

    with d = 0.75, N1+(w1,.) = distinct followers of w1, N1+(.,w2) =
    distinct predecessors of w2 (the CONTINUATION count — KN's insight:
    "Francisco" is frequent but follows only "San"), and B = distinct
    bigram types.  Reports the ``top_n`` bigrams by count (ties by
    (w1, w2)): (w1, w2, c12, c1, n1f, n1p, p_kn_ppm).

    Exactness: every count is an exact BIGINT from the shared corpus
    bigram frame; the probability is pure floor-ppm integer arithmetic:
    term1 = max(c12*1e6 - d_ppm, 0) div c1; lambda_ppm = d_ppm*n1f div
    c1 (n1f <= c1, so < 1e6); pcont_ppm = n1p*1e6 div B; term2 =
    lambda_ppm*pcont_ppm div 1e6.  Envelope: c12*1e6 and n1p*1e6 stay
    int64-exact through 9.2e12 occurrences/types — beyond any corpus.

    Scale: all four statistics derive from the ONE (w1, w2) count frame
    (c1 / n1f are a w1-keyed reaggregation, n1p a w2-keyed one, B a
    scalar); the joins are keyed on w1 / w2 and the scalar B broadcasts.
    No token-position self-join anywhere — bigrams come from the
    map-only transform in _doc_bigrams.  The top-n is a distributed
    sort-limit, never a single-partition window."""
    db = _doc_bigrams(docs, text_col, id_col)
    # the bigram count frame persists: FOUR consumers (c1, n1p, the
    # scalar B, and the scored join) each prune different columns, so
    # ReusedExchange cannot dedupe them and each would re-run the
    # corpus tokenize + bigram explode (review r10 — the cohens_kappa
    # lesson).  One bounded |bigram-types| entry, released via
    # ``cache_out`` by sweep callers.
    c12 = db.groupBy("w1", "w2").agg(
        F.sum("k").cast("long").alias("c12")).persist()
    if cache_out is not None:
        cache_out.append(c12)
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"))
    n1p = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1p"))
    b_tot = c12.agg(F.count(F.lit(1)).cast("long").alias("b_tot"))
    d = KN_DISCOUNT_PPM
    scored = (
        c12.join(c1, "w1").join(n1p, "w2")
        .crossJoin(F.broadcast(b_tot))
        .select(
            "w1", "w2", "c12", "c1", "n1f", "n1p",
            F.expr(
                f"CAST(greatest(c12 * 1000000 - {d}, 0) div c1"
                f" + ({d} * n1f div c1) * (n1p * 1000000 div b_tot)"
                " div 1000000 AS BIGINT)"
            ).alias("p_kn_ppm"),
        )
    )
    return scored.orderBy(F.desc("c12"), "w1", "w2").limit(top_n)


def KNESER_NEY_SQL(top_n: int = 25, table: str = "documents",
                   text_expr: str = "text",
                   id_col: str = "doc_id") -> str:
    d = KN_DISCOUNT_PPM
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({TOKENS_SQL(text_expr)}) AS tok,
         generate_subscripts({TOKENS_SQL(text_expr)}, 1) AS pos
  FROM {table}
),
bi AS (
  SELECT {id_col}, tok AS w1, lead(tok, 1) OVER w AS w2
  FROM toks WINDOW w AS (PARTITION BY {id_col} ORDER BY pos)
),
c12 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
  FROM bi WHERE w2 IS NOT NULL GROUP BY 1, 2
),
c1 AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS n1f
  FROM c12 GROUP BY 1
),
n1p AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS n1p FROM c12 GROUP BY 1
),
b AS (SELECT CAST(count(*) AS BIGINT) AS b_tot FROM c12)
SELECT c12.w1, c12.w2, c12.c12, c1.c1, c1.n1f, n1p.n1p,
       CAST(greatest(c12.c12 * 1000000 - {d}, 0) // c1.c1
            + ({d} * c1.n1f // c1.c1) * (n1p.n1p * 1000000 // b.b_tot)
              // 1000000 AS BIGINT) AS p_kn_ppm
FROM c12 JOIN c1 USING (w1) JOIN n1p USING (w2) CROSS JOIN b
ORDER BY c12.c12 DESC, c12.w1, c12.w2
LIMIT {top_n}
"""


def kn_heldout_scores(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      cache_out: list | None = None) -> DataFrame:
    """Held-out Kneser-Ney document scoring — the honest shape of an LM
    quality filter: the KN bigram model trains on HALF the corpus
    (doc_id % 2 = 0) and scores the OTHER half, so unseen bigrams and
    unseen histories actually occur (self-scoring, as bigram_lm_scores
    does for MLE, never exercises the smoothing that is KN's whole
    point).  Backoff ladder per scored bigram:

      history seen, bigram seen    -> full interpolated KN
      history seen, bigram unseen  -> discount mass * continuation
      history unseen               -> continuation probability alone

    Output per held-out doc: (doc_id, n_bigrams, q_score,
    n_unseen_bigrams, n_oov_histories) with q_score = Σ k * p_kn_ppm
    (exact BIGINT; mean prob = q_score / (n_bigrams * 1e6)).

    Scale: the model is the same ONE persisted bigram-count frame as
    kneser_ney_bigram (released via ``cache_out``); scoring is three
    LEFT keyed joins + the scalar broadcast — the eval corpus never
    joins itself."""
    train = docs.where(F.expr(f"{id_col} % 2 = 0"))
    held = docs.where(F.expr(f"{id_col} % 2 = 1"))
    c12 = _doc_bigrams(train, text_col, id_col).groupBy("w1", "w2").agg(
        F.sum("k").cast("long").alias("c12")).persist()
    if cache_out is not None:
        cache_out.append(c12)
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"))
    n1p = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1p"))
    b_tot = c12.agg(F.count(F.lit(1)).cast("long").alias("b_tot"))
    db = _doc_bigrams(held, text_col, id_col)
    d = KN_DISCOUNT_PPM
    p = (
        f"CASE WHEN c1 IS NULL THEN coalesce(n1p, 0) * 1000000 div b_tot"
        f" ELSE greatest(coalesce(c12, 0) * 1000000 - {d}, 0) div c1"
        f" + ({d} * n1f div c1) * (coalesce(n1p, 0) * 1000000 div b_tot)"
        " div 1000000 END"
    )
    scored = (
        db.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .join(n1p, "w2", "left")
        .crossJoin(F.broadcast(b_tot))
        .select(
            F.col(id_col), "k",
            F.expr(f"CAST({p} AS BIGINT)").alias("p_ppm"),
            F.col("c12").isNull().alias("unseen"),
            F.col("c1").isNull().alias("oov_hist"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.sum(F.col("k") * F.col("p_ppm")).cast("long").alias("q_score"),
        F.sum(F.when(F.col("unseen"), F.col("k")).otherwise(0))
        .cast("long").alias("n_unseen_bigrams"),
        F.sum(F.when(F.col("oov_hist"), F.col("k")).otherwise(0))
        .cast("long").alias("n_oov_histories"),
    ).select(F.col(id_col).cast("long").alias(id_col), "n_bigrams",
             "q_score", "n_unseen_bigrams", "n_oov_histories")


def KN_HELDOUT_SQL(table: str = "documents", text_expr: str = "text",
                   id_col: str = "doc_id") -> str:
    d = KN_DISCOUNT_PPM
    bigrams = f"""
  SELECT {id_col}, w1, w2, CAST(count(*) AS BIGINT) AS k FROM (
    SELECT {id_col}, tok AS w1, lead(tok, 1) OVER w AS w2
    FROM (
      SELECT {id_col}, unnest({TOKENS_SQL(text_expr)}) AS tok,
             generate_subscripts({TOKENS_SQL(text_expr)}, 1) AS pos
      FROM {table} WHERE {id_col} % 2 = __PAR__
    ) WINDOW w AS (PARTITION BY {id_col} ORDER BY pos)
  ) WHERE w2 IS NOT NULL GROUP BY 1, 2, 3"""
    p = (f"CASE WHEN c1.c1 IS NULL"
         f" THEN coalesce(n1p.n1p, 0) * 1000000 // b.b_tot"
         f" ELSE greatest(coalesce(c12.c12, 0) * 1000000 - {d}, 0) // c1.c1"
         f" + ({d} * c1.n1f // c1.c1)"
         f" * (coalesce(n1p.n1p, 0) * 1000000 // b.b_tot) // 1000000 END")
    return f"""
WITH train_db AS ({bigrams.replace('__PAR__', '0')}),
held_db AS ({bigrams.replace('__PAR__', '1')}),
c12 AS (
  SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c12 FROM train_db GROUP BY 1, 2
),
c1 AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS n1f
  FROM c12 GROUP BY 1
),
n1p AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p FROM c12 GROUP BY 1),
b AS (SELECT CAST(count(*) AS BIGINT) AS b_tot FROM c12),
scored AS (
  SELECT db.{id_col}, db.k, CAST({p} AS BIGINT) AS p_ppm,
         c12.c12 IS NULL AS unseen, c1.c1 IS NULL AS oov_hist
  FROM held_db db
  LEFT JOIN c12 ON c12.w1 = db.w1 AND c12.w2 = db.w2
  LEFT JOIN c1 ON c1.w1 = db.w1
  LEFT JOIN n1p ON n1p.w2 = db.w2
  CROSS JOIN b
)
SELECT CAST({id_col} AS BIGINT) AS {id_col},
       CAST(sum(k) AS BIGINT) AS n_bigrams,
       CAST(sum(k * p_ppm) AS BIGINT) AS q_score,
       CAST(sum(CASE WHEN unseen THEN k ELSE 0 END) AS BIGINT)
         AS n_unseen_bigrams,
       CAST(sum(CASE WHEN oov_hist THEN k ELSE 0 END) AS BIGINT)
         AS n_oov_histories
FROM scored
GROUP BY 1
"""


def ngram_novelty_by_batch(docs: DataFrame, n_batches: int = 8,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           cache_out: list | None = None) -> DataFrame:
    """Corpus-freshness profiling: how much of each ingest batch's
    bigram mass is NEW (first ever seen in that batch)?  The dataset-
    curation dashboard metric behind "is the crawl still adding
    information or re-collecting the same text" — novelty collapsing
    toward 0 across batches is the saturation signal.

    Batches are planted round-robin (batch = doc_id % n_batches, the
    pii.py discipline); first_seen(bigram) = min batch.  Output per
    batch: (batch, n_occurrences, n_types, novel_occurrences,
    novel_types, novel_ppm) with novel_ppm = floor-ppm of novel
    occurrence mass.

    Scale: ONE bigram aggregation keyed (batch, w1, w2), a bigram-keyed
    min-reaggregation for first_seen (persisted — two consumers), one
    keyed join back, one groupBy(batch).  Nothing is corpus-quadratic;
    the join is vocab-scale."""
    db = _doc_bigrams(docs, text_col, id_col)
    per = db.select(
        F.expr(f"{id_col} % {n_batches}").cast("long").alias("batch"),
        "w1", "w2", "k",
    ).groupBy("batch", "w1", "w2").agg(
        F.sum("k").cast("long").alias("k_b")).persist()
    if cache_out is not None:
        cache_out.append(per)
    first = per.groupBy("w1", "w2").agg(
        F.min("batch").cast("long").alias("first_seen"))
    joined = per.join(first, ["w1", "w2"])
    return joined.groupBy("batch").agg(
        F.sum("k_b").cast("long").alias("n_occurrences"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("first_seen") == F.col("batch"),
                     F.col("k_b")).otherwise(0)).cast("long")
        .alias("novel_occurrences"),
        F.sum(F.when(F.col("first_seen") == F.col("batch"), 1)
              .otherwise(0)).cast("long").alias("novel_types"),
    ).select(
        "batch", "n_occurrences", "n_types", "novel_occurrences",
        "novel_types",
        F.expr("novel_occurrences * 1000000 div n_occurrences")
        .cast("long").alias("novel_ppm"),
    )


def NGRAM_NOVELTY_SQL(n_batches: int = 8, table: str = "documents",
                      text_expr: str = "text",
                      id_col: str = "doc_id") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({TOKENS_SQL(text_expr)}) AS tok,
         generate_subscripts({TOKENS_SQL(text_expr)}, 1) AS pos
  FROM {table}
),
bi AS (
  SELECT {id_col}, tok AS w1, lead(tok, 1) OVER w AS w2
  FROM toks WINDOW w AS (PARTITION BY {id_col} ORDER BY pos)
),
per AS (
  SELECT CAST({id_col} % {n_batches} AS BIGINT) AS batch, w1, w2,
         CAST(count(*) AS BIGINT) AS k_b
  FROM bi WHERE w2 IS NOT NULL GROUP BY 1, 2, 3
),
first AS (
  SELECT w1, w2, CAST(min(batch) AS BIGINT) AS first_seen
  FROM per GROUP BY 1, 2
),
agg AS (
  SELECT batch,
         CAST(sum(k_b) AS BIGINT) AS n_occurrences,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN first_seen = batch THEN k_b ELSE 0 END)
              AS BIGINT) AS novel_occurrences,
         CAST(sum(CASE WHEN first_seen = batch THEN 1 ELSE 0 END)
              AS BIGINT) AS novel_types
  FROM per JOIN first USING (w1, w2)
  GROUP BY 1
)
SELECT batch, n_occurrences, n_types, novel_occurrences, novel_types,
       CAST(novel_occurrences * 1000000 // n_occurrences AS BIGINT)
         AS novel_ppm
FROM agg
"""


def draft_acceptance_counts(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """(source, w1, w2, c): per-source bigram transition counts — the
    draft-acceptance report's ADDITIVE sufficient statistic (counts
    merge by plain sum, arrival order irrelevant), the carried state of
    the streaming twin."""
    # r12-opt: source rides the bigram derivation (extra_cols) — the
    # fact-scale join back onto the corpus no longer exists
    db = _doc_bigrams(docs, text_col, id_col, extra_cols=("source",))
    return db.groupBy("source", "w1", "w2").agg(
        F.sum("k").cast("long").alias("c"))


def draft_acceptance_from_counts(per: DataFrame) -> DataFrame:
    """Report columns from a (source, w1, w2, c) counts frame.  The
    caller owns persistence of ``per`` — it is consumed twice (global
    draft-model argmax + the per-source acceptance join)."""
    glob = per.groupBy("w1", "w2").agg(F.sum("c").cast("long").alias("cg"))
    # r12-opt (guide §2.4): the draft argmax (cg DESC, w2 ASC) is
    # min(struct(-cg, w2)) — a map-side-combined keyed agg over the
    # distinct-bigram frame, no vocab-scale window sort
    draft = glob.groupBy("w1").agg(
        F.min(F.struct((-F.col("cg")).alias("ncg"),
                       F.col("w2").alias("w2"))).alias("_t")
    ).select("w1", F.col("_t.w2").alias("dw2"))
    return (
        per.join(draft, "w1")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_transitions"),
            F.sum(F.when(F.col("w2") == F.col("dw2"), F.col("c"))
                  .otherwise(0)).cast("long").alias("n_accepted"),
        )
        .select(
            "source", "n_transitions", "n_accepted",
            F.expr("n_accepted * 1000000 div n_transitions").cast("long")
            .alias("accept_ppm"),
        )
    )


def draft_acceptance_by_source(docs: DataFrame, text_col: str = "text",
                               id_col: str = "doc_id",
                               cache_out: list | None = None) -> DataFrame:
    """Speculative-decoding draft-acceptance profiling: if a 1-gram-
    context draft model (predict the corpus-wide most frequent next
    token; ties to the lexicographically smallest — the greedy bigram
    table a speculative decoder would table-look-up) proposed every next
    token, what share of this corpus' transitions would the verifier
    accept?  Per-source acceptance rate is the data-side half of the
    Leviathan et al. 2023 acceptance-rate analysis: it bounds the
    speedup a draft model of this shape can earn on each source, and
    ranks sources by self-predictability (templated/boilerplate sources
    accept high; diverse prose accepts low).

    Output: (source, n_transitions, n_accepted, accept_ppm), floor-ppm.

    Scale: ONE (source, w1, w2) aggregation off the pre-combined
    per-doc bigram frame (map-side combine collapses each partition to
    its distinct transitions first), persisted — the draft argmax is a
    vocab-scale reaggregation + a w1-keyed window over DISTINCT-bigram
    rows (never token positions), and the acceptance join is keyed on
    w1 with a 1-row-per-w1 build side.  Nothing fact-scale is sorted
    globally and nothing is corpus-quadratic."""
    per = draft_acceptance_counts(docs, text_col, id_col).persist()
    if cache_out is not None:
        cache_out.append(per)
    return draft_acceptance_from_counts(per)


def DRAFT_ACCEPT_SQL(table: str = "documents", text_expr: str = "text",
                     id_col: str = "doc_id") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({TOKENS_SQL(text_expr)}) AS tok,
         generate_subscripts({TOKENS_SQL(text_expr)}, 1) AS pos
  FROM {table}
),
bi AS (
  SELECT {id_col}, tok AS w1, lead(tok, 1) OVER w AS w2
  FROM toks WINDOW w AS (PARTITION BY {id_col} ORDER BY pos)
),
per AS (
  SELECT d.source, b.w1, b.w2, CAST(count(*) AS BIGINT) AS c
  FROM bi b JOIN {table} d USING ({id_col})
  WHERE b.w2 IS NOT NULL GROUP BY 1, 2, 3
),
gl AS (
  SELECT w1, w2, CAST(sum(c) AS BIGINT) AS cg FROM per GROUP BY 1, 2
),
draft AS (
  SELECT w1, w2 AS dw2 FROM (
    SELECT w1, w2,
           row_number() OVER (PARTITION BY w1 ORDER BY cg DESC, w2) AS rn
    FROM gl
  ) WHERE rn = 1
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_transitions,
       CAST(sum(CASE WHEN w2 = dw2 THEN c ELSE 0 END) AS BIGINT)
         AS n_accepted,
       CAST(sum(CASE WHEN w2 = dw2 THEN c ELSE 0 END) * 1000000
            // sum(c) AS BIGINT) AS accept_ppm
FROM per JOIN draft USING (w1)
GROUP BY source
"""


# The token_counts_bpe pre-tokenizer: alnum runs + single punctuation.
# The whitespace class is spelled EXPLICITLY instead of \s because the
# shorthand differs across regex engines (Java \s includes \x0B,
# RE2's does not) — with the literal class both engines see the same
# set, and every consumer (Spark + oracle + token_counts_bpe in
# queries.py) interpolates THIS constant, the shared-text discipline.
BPE_RE = r"[a-z0-9]+|[^a-z0-9 \t\n\x0B\f\r]"
_BPE_RE = BPE_RE


def tokenizer_fertility_report(docs: DataFrame, text_col: str = "text"
                               ) -> DataFrame:
    """Tokenizer-fertility rollup per (lang, source) cell: document,
    character, whitespace-token, and subword counts plus the two ratios
    every multilingual tokenizer evaluation reports — fertility
    (subwords per whitespace word) and compression (chars per subword).
    High-fertility cells are where a vocabulary underserves a language
    (each word fragments into many pieces), i.e. where token budgets
    and context windows silently shrink; this is the per-corpus-cell
    version of the fertility tables in the XLM-R / BLOOM tokenizer
    analyses.

    Exactness: length() counts Unicode code points on both engines;
    the BPE-ish segmentation is the shared token_counts_bpe regex; the
    ratios are floor-ppm over exact BIGINT sums (NULL for an empty
    denominator cell).

    Scale: row-local counting expressions into ONE low-cardinality
    (lang, source) groupBy — map-side combine collapses each partition
    to |cells| partial rows; no join, no window."""
    t = F.lower(F.col(text_col))
    per_doc = docs.select(
        "lang", "source",
        F.length(text_col).cast("long").alias("nc"),
        F.size(tokens_col(text_col)).cast("long").alias("nw"),
        F.size(F.regexp_extract_all(t, F.lit(_BPE_RE), F.lit(0)))
        .cast("long").alias("ns"),
    )
    return per_doc.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nc").cast("long").alias("n_chars"),
        F.sum("nw").cast("long").alias("n_ws_tokens"),
        F.sum("ns").cast("long").alias("n_subwords"),
    ).select(
        "lang", "source", "n_docs", "n_chars", "n_ws_tokens", "n_subwords",
        F.expr("CASE WHEN n_ws_tokens = 0 THEN NULL"
               " ELSE n_subwords * 1000000 div n_ws_tokens END")
        .cast("long").alias("fertility_ppm"),
        F.expr("CASE WHEN n_subwords = 0 THEN NULL"
               " ELSE n_chars * 1000000 div n_subwords END")
        .cast("long").alias("compression_ppm"),
    )


def TOKENIZER_FERTILITY_SQL(table: str = "documents",
                            text_expr: str = "text") -> str:
    return f"""
WITH per_doc AS (
  SELECT lang, source,
         CAST(length({text_expr}) AS BIGINT) AS nc,
         CAST(len({TOKENS_SQL(text_expr)}) AS BIGINT) AS nw,
         CAST(len(regexp_extract_all(lower({text_expr}),
              '{BPE_RE}')) AS BIGINT) AS ns
  FROM {table}
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       CAST(sum(nw) AS BIGINT) AS n_ws_tokens,
       CAST(sum(ns) AS BIGINT) AS n_subwords,
       CAST(CASE WHEN sum(nw) = 0 THEN NULL
            ELSE sum(ns) * 1000000 // sum(nw) END AS BIGINT)
         AS fertility_ppm,
       CAST(CASE WHEN sum(ns) = 0 THEN NULL
            ELSE sum(nc) * 1000000 // sum(ns) END AS BIGINT)
         AS compression_ppm
FROM per_doc
GROUP BY 1, 2
"""


def ccnet_perplexity_buckets(docs: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """CCNet's head/middle/tail bucketing (Wenzek et al., LREC 2020):
    per LANGUAGE, rank documents by LM quality score and cut the
    ranking into three equal buckets — the partition CCNet publishes
    per language shard and the knob most pipelines use ("train on
    head+middle").  The score is bigram_lm_scores' exact integer mean
    conditional probability (µ-prob = q_score div n_bigrams), ranked
    DESC with doc_id tie-break, so ntile(3) is deterministic and
    bucket 1 is the head.  Documents with < 2 tokens carry no score
    and are absent (identical on both engines).

    Output: (lang, bucket, n_docs, mean_score_ppm, min_score_ppm,
    max_score_ppm) — 3 rows per language.

    Scale: rides the bigram_lm_scores shapes (two vocab-scale
    aggregates + one keyed scoring join), then ONE lang-keyed ntile
    window over per-doc score rows and a |langs|x3 rollup.  The window
    is keyed by language — the natural shard axis, never global."""
    sc = bigram_lm_scores(docs, text_col, id_col).select(
        id_col,
        F.expr("q_score div n_bigrams").cast("long").alias("score_ppm"),
    )
    j = sc.join(docs.select(id_col, "lang"), id_col)
    w = Window.partitionBy("lang").orderBy(
        F.desc("score_ppm"), F.col(id_col))
    return (
        j.select("lang", "score_ppm", F.ntile(3).over(w).alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("sum(score_ppm) div count(*)").cast("long")
            .alias("mean_score_ppm"),
            F.min("score_ppm").cast("long").alias("min_score_ppm"),
            F.max("score_ppm").cast("long").alias("max_score_ppm"),
        )
        .select("lang", F.col("bucket").cast("long").alias("bucket"),
                "n_docs", "mean_score_ppm", "min_score_ppm",
                "max_score_ppm")
    )


def CCNET_BUCKETS_SQL(table: str = "documents", text_expr: str = "text",
                      id_col: str = "doc_id",
                      quant: int = PROB_QUANT) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({TOKENS_SQL(text_expr)}) AS tok,
         generate_subscripts({TOKENS_SQL(text_expr)}, 1) AS pos
  FROM {table}
),
bi AS (
  SELECT {id_col}, tok AS w1, lead(tok, 1) OVER w AS w2
  FROM toks WINDOW w AS (PARTITION BY {id_col} ORDER BY pos)
),
db AS (
  SELECT {id_col}, w1, w2, CAST(count(*) AS BIGINT) AS k
  FROM bi WHERE w2 IS NOT NULL GROUP BY 1, 2, 3
),
c12 AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c12 FROM db GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
model AS (
  SELECT c12.w1, c12.w2,
         (CAST({quant} AS BIGINT) * c12.c12) // c1.c1 AS qp
  FROM c12 JOIN c1 USING (w1)
),
scored AS (
  SELECT db.{id_col},
         CAST(sum(db.k * m.qp) // sum(db.k) AS BIGINT) AS score_ppm
  FROM db JOIN model m ON db.w1 = m.w1 AND db.w2 = m.w2
  GROUP BY 1
),
bucketed AS (
  SELECT d.lang, s.score_ppm,
         ntile(3) OVER (PARTITION BY d.lang
                        ORDER BY s.score_ppm DESC, s.{id_col}) AS bucket
  FROM scored s JOIN {table} d USING ({id_col})
)
SELECT lang, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(score_ppm) // count(*) AS BIGINT) AS mean_score_ppm,
       CAST(min(score_ppm) AS BIGINT) AS min_score_ppm,
       CAST(max(score_ppm) AS BIGINT) AS max_score_ppm
FROM bucketed
GROUP BY 1, 2
"""


WORDPIECE_TOP = 20


def wordpiece_pair_scores(docs: DataFrame, text_col: str = "text",
                          top_n: int = WORDPIECE_TOP) -> DataFrame:
    """WordPiece merge-candidate ranking (Schuster & Nakajima, ICASSP
    2012; the criterion BERT's tokenizer trains with): pairs rank by
    the LIKELIHOOD gain  count(ab) / (count(a)·count(b))  rather than
    BPE's raw frequency — a rare pair of rare symbols can beat a
    frequent pair of ubiquitous ones, which is exactly the
    morphology-preserving behavior WordPiece is chosen for.  The
    companion diagnostic to bpe_merge_round: run both and diff the
    rankings to see what the criterion changes.

    Exactness: the score is floor-ppb in DECIMAL(38,0)/HUGEINT —
    pair_cnt·1e9 div (c1·c2); the unit-count product c1·c2 overflows
    int64 around 3e9 occurrences per symbol (reachable at corpus
    scale), so the division rides the wide type on BOTH engines.
    Ranking breaks floor-collision ties by (w1, w2) — a total order.

    Scale: the same vocabulary collapse as bpe_merge_round (one
    corpus-scale groupBy, then everything is vocab-scale); unigram
    counts reaggregate the SAME vocab frame; top-n is TakeOrdered."""
    vocab = wordpiece_vocab(docs, text_col)
    return wordpiece_from_vocab(vocab, top_n)


def wordpiece_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(tok, tok_cnt) — the ADDITIVE sufficient statistic of the
    criterion (token counts merge by keyed sum under any arrival
    order), which is exactly the state the streaming twin folds."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tok_cnt"))
    )


def wordpiece_from_vocab(vocab: DataFrame,
                         top_n: int = WORDPIECE_TOP) -> DataFrame:
    """The scoring half, from the vocabulary frame — shared by the
    batch operator and the streaming twin."""
    chars = (
        vocab.select(
            "tok_cnt",
            F.explode(F.sequence(F.lit(1), F.length("tok"))).alias("i"),
            F.col("tok"),
        )
        .select(F.expr("substr(tok, i, 1)").alias("ch"), "tok_cnt")
        .groupBy("ch")
        .agg(F.sum("tok_cnt").cast("long").alias("c"))
    )
    pairs = (
        vocab.filter(F.length("tok") >= 2)
        .select(
            "tok", "tok_cnt",
            F.explode(F.sequence(F.lit(1), F.length("tok") - 1)).alias("i"),
        )
        .select(
            F.expr("substr(tok, i, 1)").alias("w1"),
            F.expr("substr(tok, i + 1, 1)").alias("w2"),
            "tok_cnt",
        )
        .groupBy("w1", "w2")
        .agg(F.sum("tok_cnt").cast("long").alias("pair_cnt"))
    )
    scored = (
        pairs.join(chars.select(F.col("ch").alias("w1"),
                                F.col("c").alias("c1")), "w1")
        .join(chars.select(F.col("ch").alias("w2"),
                           F.col("c").alias("c2")), "w2")
        .select(
            "w1", "w2", "pair_cnt", "c1", "c2",
            F.expr(
                "CAST(CAST(pair_cnt AS DECIMAL(38,0)) * 1000000000"
                " div (CAST(c1 AS DECIMAL(38,0)) * c2) AS BIGINT)"
            ).alias("score_ppb"),
        )
    )
    w = Window.orderBy(F.desc("score_ppb"), "w1", "w2")
    return (
        scored.select("*", F.row_number().over(w).cast("long")
                      .alias("rank"))
        .where(F.col("rank") <= top_n)
        .select("rank", "w1", "w2", "pair_cnt", "c1", "c2", "score_ppb")
    )


def WORDPIECE_SQL(table: str = "documents", text_expr: str = "text",
                  top_n: int = WORDPIECE_TOP) -> str:
    return f"""
WITH vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS tok_cnt
  FROM (SELECT unnest({TOKENS_SQL(text_expr)}) AS tok FROM {table})
  GROUP BY tok
),
chars AS (
  SELECT substr(tok, CAST(u.i AS INTEGER), 1) AS ch,
         CAST(sum(tok_cnt) AS BIGINT) AS c
  FROM vocab, unnest(range(1, CAST(length(tok) AS BIGINT) + 1)) AS u(i)
  GROUP BY 1
),
pairs AS (
  SELECT substr(tok, CAST(u.i AS INTEGER), 1) AS w1,
         substr(tok, CAST(u.i AS INTEGER) + 1, 1) AS w2,
         CAST(sum(tok_cnt) AS BIGINT) AS pair_cnt
  FROM vocab, unnest(range(1, CAST(length(tok) AS BIGINT))) AS u(i)
  WHERE length(tok) >= 2
  GROUP BY 1, 2
),
scored AS (
  SELECT p.w1, p.w2, p.pair_cnt, a.c AS c1, b.c AS c2,
         CAST(CAST(p.pair_cnt AS HUGEINT) * 1000000000
              // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS score_ppb
  FROM pairs p
  JOIN chars a ON a.ch = p.w1
  JOIN chars b ON b.ch = p.w2
)
SELECT CAST(row_number() OVER (ORDER BY score_ppb DESC, w1, w2)
            AS BIGINT) AS rank,
       w1, w2, pair_cnt, c1, c2, score_ppb
FROM scored
QUALIFY rank <= {top_n}
"""


# ---------------------------------------------------------------------------
# WordPiece ENCODE (greedy longest-match-first segmentation)
# ---------------------------------------------------------------------------


def wordpiece_encode_vocab(docs: DataFrame, n_pieces: int = 20,
                           text_col: str = "text") -> DataFrame:
    """Apply a trained WordPiece vocabulary — the ENCODE half of the
    tokenizer (train with :func:`wordpiece_pair_scores`, then this
    segments the corpus), completing the train+encode pair exactly as
    bpe_train/bpe_encode_vocab do for BPE.  The segmenter is WordPiece
    INFERENCE (greedy longest-match-first, the algorithm BERT's
    tokenizer runs): at each position take the longest vocabulary
    piece that prefixes the remaining suffix — here every single
    character plus the top-``n_pieces`` two-character merges by the
    likelihood criterion — and continuation pieces (position > 1)
    carry the ``##`` prefix.  Returns corpus frequencies of every
    emitted piece.

    Scale (the bpe_encode_vocab vocabulary collapse): segmentation is
    deterministic per token TYPE, so the corpus pays ONE token-count
    aggregation and the greedy scan runs once per distinct token — on
    a vocabulary-scale frame — as a single Catalyst ``aggregate`` fold
    over the token's character positions (whole-stage codegen, no
    Python, no per-round jobs, no joins; the piece table rides the
    expression as an array literal).  The trained piece table itself
    is model-scale (``n_pieces`` rows), collected once like the BPE
    merge table.  The vocabulary frame persists: the piece-table job
    and the segmentation pass both fold the SAME (tok, tok_cnt) cache,
    so the corpus tokenize+explode runs once, not twice.

    Exactness: string-only (no floats anywhere); the piece ranking
    that defines the vocabulary has a total order (score DESC, w1,
    w2).  The DuckDB oracle replays the same greedy scan as a
    recursive CTE.  Reference scope: OMLDM has no tokenizer surface
    (SURVEY.md §2); beyond-reference LLM-pipeline charter."""
    vocab = wordpiece_vocab(docs, text_col).persist()
    pieces = [
        r["w1"] + r["w2"]
        for r in wordpiece_from_vocab(vocab, n_pieces)
        .select("w1", "w2").collect()  # trained piece table: n_pieces rows
    ]
    pieces_arr = F.array(*[F.lit(p) for p in pieces]) if pieces else \
        F.expr("CAST(array() AS ARRAY<STRING>)")

    def step(acc, i):
        prefix = F.when(acc["pos"] > 1, F.lit("##")).otherwise(F.lit(""))
        two = F.col("tok").substr(acc["pos"], F.lit(2))
        one = F.col("tok").substr(acc["pos"], F.lit(1))
        take2 = F.struct(
            (acc["pos"] + F.lit(2)).alias("pos"),
            F.array_append(acc["out"], F.concat(prefix, two)).alias("out"),
        )
        take1 = F.struct(
            (acc["pos"] + F.lit(1)).alias("pos"),
            F.array_append(acc["out"], F.concat(prefix, one)).alias("out"),
        )
        return (
            F.when(i != acc["pos"], acc)
            .otherwise(F.when(F.array_contains(pieces_arr, two), take2)
                       .otherwise(take1))
        )

    segmented = vocab.select(
        F.aggregate(
            F.sequence(F.lit(1), F.length("tok")),
            F.struct(
                F.lit(1).cast("int").alias("pos"),
                F.expr("CAST(array() AS ARRAY<STRING>)").alias("out"),
            ),
            step,
            lambda acc: acc["out"],
        ).alias("pieces"),
        "tok_cnt",
    )
    return (
        segmented.select(F.explode("pieces").alias("piece"), "tok_cnt")
        .groupBy("piece")
        .agg(F.sum("tok_cnt").cast("long").alias("cnt"))
    )


def WORDPIECE_ENCODE_SQL(n_pieces: int = 20, table: str = "documents",
                         text_expr: str = "text") -> str:
    """Oracle for :func:`wordpiece_encode_vocab`: the trainer's CTE
    chain through the ranked piece table, then the SAME greedy
    longest-match scan as a recursive CTE over the vocabulary."""
    return f"""
WITH RECURSIVE vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS tok_cnt
  FROM (SELECT unnest({TOKENS_SQL(text_expr)}) AS tok FROM {table})
  GROUP BY tok
),
chars AS (
  SELECT substr(tok, CAST(u.i AS INTEGER), 1) AS ch,
         CAST(sum(tok_cnt) AS BIGINT) AS c
  FROM vocab, unnest(range(1, CAST(length(tok) AS BIGINT) + 1)) AS u(i)
  GROUP BY 1
),
pairs AS (
  SELECT substr(tok, CAST(u.i AS INTEGER), 1) AS w1,
         substr(tok, CAST(u.i AS INTEGER) + 1, 1) AS w2,
         CAST(sum(tok_cnt) AS BIGINT) AS pair_cnt
  FROM vocab, unnest(range(1, CAST(length(tok) AS BIGINT))) AS u(i)
  WHERE length(tok) >= 2
  GROUP BY 1, 2
),
ranked AS (
  SELECT p.w1 || p.w2 AS piece2,
         row_number() OVER (
           ORDER BY CAST(p.pair_cnt AS HUGEINT) * 1000000000
                    // (CAST(a.c AS HUGEINT) * b.c) DESC, p.w1, p.w2
         ) AS rank
  FROM pairs p
  JOIN chars a ON a.ch = p.w1
  JOIN chars b ON b.ch = p.w2
),
pieces2 AS (SELECT piece2 FROM ranked WHERE rank <= {n_pieces}),
seg AS (
  SELECT tok, tok_cnt, 1 AS pos, CAST(NULL AS VARCHAR) AS piece
  FROM vocab
  UNION ALL
  SELECT tok, tok_cnt,
         pos + CASE WHEN hit THEN 2 ELSE 1 END,
         CASE WHEN pos > 1 THEN '##' ELSE '' END ||
           substr(tok, pos, CASE WHEN hit THEN 2 ELSE 1 END)
  FROM (
    SELECT tok, tok_cnt, pos,
           substr(tok, pos, 2) IN (SELECT piece2 FROM pieces2) AS hit
    FROM seg WHERE pos <= length(tok)
  )
)
SELECT piece, CAST(sum(tok_cnt) AS BIGINT) AS cnt
FROM seg WHERE piece IS NOT NULL
GROUP BY piece"""


# ---------------------------------------------------------------------------
# Green-list watermark detection (synthetic-text filter)
# ---------------------------------------------------------------------------


def llm_watermark_detect(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         keep_cols: tuple = ()) -> DataFrame:
    """Green-list watermark detector (Kirchenbauer et al., ICML 2023
    "A Watermark for Large Language Models"): a watermarking LLM seeds
    a hash with the previous token and biases sampling toward the
    "green" quarter of the vocabulary; a detector — which is what a
    pretraining pipeline runs to QUARANTINE watermarked synthetic text
    before it contaminates the corpus — recomputes the green test per
    position and z-tests the green count against the gamma = 1/4 null.

    Green test (cross-engine determinism): token at position i is
    green iff the first hex digit of md5(prev_tok || ' ' || tok) is in
    0-3 — md5 hex strings are identical in Spark and DuckDB (the
    repo's minhash discipline), and hashing the (prev, cur) pair is
    the self-hash variant of the published scheme.

    The statistic avoids sqrt: with g greens of n scored positions,
    z^2 = (g - n/4)^2 / (n * 3/16) = (4g - n)^2 / (3n), reported as
    the SIGNED floor-ppm  sign(4g - n) * (4g - n)^2 * 1e6 div (3n)  in
    DECIMAL(38,0)/HUGEINT (exact integer arithmetic on both engines;
    (4g-n)^2 * 1e6 passes int64 at ~5e4 tokens/doc, so the wide type
    carries it).  ``flagged`` is the z > 4 one-sided detection
    (z2_signed_ppm > 16e6), the paper's interpretable threshold.

    Scale: zero exchanges — tokens, the pairwise green test, and the
    per-document counts are all row-local higher-order-function folds
    (whole-stage codegen); a 100 TB corpus maps this over every
    partition with no shuffle at all.  Docs with fewer than 2 tokens
    have no scored positions and are excluded (n = 0 has no null
    distribution).  Reference scope: beyond-reference LLM-pipeline
    charter (OMLDM has no text surface, SURVEY.md §2)."""
    toks = tokens_col(text_col)
    keep = [F.col(c) for c in keep_cols]
    green_i = (
        "substr(md5(concat(element_at(_toks, i - 1), ' ', "
        "element_at(_toks, i))), 1, 1) IN ('0', '1', '2', '3')"
    )
    return (
        docs.select(F.col(id_col), *keep, toks.alias("_toks"))
        .where(F.size("_toks") >= 2)
        .select(
            id_col, *keep,
            (F.size("_toks") - 1).cast("long").alias("n_scored"),
            F.expr(
                "CAST(size(filter(sequence(2, size(_toks)), "
                f"i -> {green_i})) AS BIGINT)"
            ).alias("green_cnt"),
        )
        .select(
            id_col, *keep, "n_scored", "green_cnt",
            F.expr(
                "CAST(CASE WHEN 4 * green_cnt >= n_scored THEN 1 ELSE -1 END"
                " * (CAST(4 * green_cnt - n_scored AS DECIMAL(38,0))"
                "    * (4 * green_cnt - n_scored) * 1000000"
                "    div (CAST(3 AS DECIMAL(38,0)) * n_scored))"
                " AS BIGINT)"
            ).alias("z2_signed_ppm"),
        )
        .select(
            id_col, *keep, "n_scored", "green_cnt", "z2_signed_ppm",
            (F.col("z2_signed_ppm") > 16_000_000).alias("flagged"),
        )
    )


def WATERMARK_SQL(table: str = "documents", text_expr: str = "text",
                  id_col: str = "doc_id") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col}, {TOKENS_SQL(text_expr)} AS t FROM {table}
),
counted AS (
  SELECT {id_col},
         CAST(len(t) - 1 AS BIGINT) AS n_scored,
         CAST(len(list_filter(range(2, len(t) + 1),
              i -> substr(md5(t[i - 1] || ' ' || t[i]), 1, 1)
                   IN ('0', '1', '2', '3'))) AS BIGINT) AS green_cnt
  FROM toks WHERE len(t) >= 2
),
scored AS (
  SELECT {id_col}, n_scored, green_cnt,
         CAST(CASE WHEN 4 * green_cnt >= n_scored THEN 1 ELSE -1 END
              * (CAST(4 * green_cnt - n_scored AS HUGEINT)
                 * (4 * green_cnt - n_scored) * 1000000
                 // (CAST(3 AS HUGEINT) * n_scored))
              AS BIGINT) AS z2_signed_ppm
  FROM counted
)
SELECT {id_col}, n_scored, green_cnt, z2_signed_ppm,
       z2_signed_ppm > 16000000 AS flagged
FROM scored"""


def watermark_source_report(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            source_col: str = "source") -> DataFrame:
    """The per-source quarantine decision the detector feeds: which
    sources carry watermarked (synthetic) text, and how much.  Rolls
    :func:`llm_watermark_detect` up per source — documents flagged at
    z > 4, the flagged fraction, and the corpus-level green rate (the
    latter distinguishes "a few heavily-watermarked docs" from "a
    uniform slight tilt", which need different remediations).

    All integer: flagged_ppm = n_flagged*1e6 div n_docs;
    green_rate_ppm = Σ green*1e6 div Σ scored in DECIMAL(38,0)/HUGEINT
    (Σ scored crosses int64 around 9e18 tokens).  Scale: the per-doc
    detector is exchange-free and carries ``source`` through as a
    passthrough column, so the whole report is ONE map-side-combined
    groupBy over the corpus — no join anywhere."""
    per_doc = llm_watermark_detect(
        docs.select(source_col, id_col, text_col), text_col, id_col,
        keep_cols=(source_col,))
    return (
        per_doc
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("flagged"), 1).otherwise(0)).cast("long")
            .alias("n_flagged"),
            F.sum("n_scored").cast("long").alias("n_scored"),
            F.sum("green_cnt").cast("long").alias("green_cnt"),
        )
        .select(
            source_col, "n_docs", "n_flagged",
            F.expr("CAST(n_flagged * 1000000 div n_docs AS BIGINT)")
            .alias("flagged_ppm"),
            F.expr(
                "CAST(CAST(green_cnt AS DECIMAL(38,0)) * 1000000"
                " div n_scored AS BIGINT)"
            ).alias("green_rate_ppm"),
        )
    )


def WATERMARK_SOURCE_SQL(table: str = "documents",
                         text_expr: str = "text",
                         id_col: str = "doc_id",
                         source_col: str = "source") -> str:
    return f"""
WITH det AS ({WATERMARK_SQL(table, text_expr, id_col)})
SELECT d.{source_col},
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN det.flagged THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       CAST(sum(CASE WHEN det.flagged THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS flagged_ppm,
       CAST(CAST(sum(det.green_cnt) AS HUGEINT) * 1000000
            // sum(det.n_scored) AS BIGINT) AS green_rate_ppm
FROM det JOIN {table} d ON d.{id_col} = det.{id_col}
GROUP BY d.{source_col}"""
