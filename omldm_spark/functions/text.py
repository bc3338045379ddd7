"""Text analysis for training-data pipelines (beyond-reference surface).

Language-ID (stopword-hit heuristic), quality scoring, token counting,
document fingerprinting — all pure Catalyst expressions over the
``documents`` table; every ratio stays an exact integer division so DuckDB
oracles hash-match bit-for-bit.

Scale: everything here is a narrow projection + one groupBy; no UDFs, no
Python. Filters on the computed columns push down to the parquet scan when
used as pipeline predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import tokens_col

# Tiny per-language stopword lists for the heuristic language scorer.
# Deterministic tie-break: priority order en > de > es > fr.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "von"],
    "es": ["el", "los", "las", "y", "es", "que"],
    "fr": ["le", "les", "et", "est", "une", "dans"],
}
LANG_PRIORITY = ["en", "de", "es", "fr"]


def text_metrics(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality metrics: token/char counts, mean token length,
    stopword ratio (English list) — exact integer ratios."""
    toks = tokens_col(text_col)
    en = STOPWORDS["en"]
    n_tokens = F.size(toks).cast("long")
    sum_tok_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(en))).cast("long")
    return docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (sum_tok_len / n_tokens).alias("mean_token_len"),
        (n_stop / n_tokens).alias("stopword_ratio"),
    ).filter(F.col("n_tokens") > 0)


def text_metrics_sql(table: str = "documents", text_expr: str = "text",
                     id_col: str = "doc_id") -> str:
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    toks = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t != '')"
    return f"""
SELECT {id_col},
       CAST(length({text_expr}) AS BIGINT) AS n_chars,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
         / CAST(len(toks) AS BIGINT) AS mean_token_len,
       CAST(len(list_filter(toks, t -> t IN ({en}))) AS BIGINT)
         / CAST(len(toks) AS BIGINT) AS stopword_ratio
FROM (SELECT {id_col}, {text_expr}, {toks} AS toks FROM {table})
WHERE len(toks) > 0
"""


def lang_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit counts per language + arg-max prediction with the fixed
    priority tie-break (n-gram-free heuristic language ID)."""
    toks = tokens_col(text_col)
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(STOPWORDS[lang])))
        .cast("long")
        .alias(f"score_{lang}")
        for lang in LANG_PRIORITY
    ]
    df = docs.select(F.col(id_col), *scores)
    # Priority CASE: the first language in LANG_PRIORITY wins ties.
    expr = None
    for lang in LANG_PRIORITY:
        cond_parts = [
            F.col(f"score_{lang}") >= F.col(f"score_{other}")
            for other in LANG_PRIORITY
            if other != lang
        ]
        cond = cond_parts[0]
        for c in cond_parts[1:]:
            cond = cond & c
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return df.withColumn("lang_pred", expr.otherwise(F.lit("??")))


def lang_scores_sql(table: str = "documents", text_expr: str = "text",
                    id_col: str = "doc_id") -> str:
    toks = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t != '')"
    score_cols = ", ".join(
        "CAST(len(list_filter(toks, t -> t IN ({words}))) AS BIGINT) AS score_{lang}".format(
            words=", ".join(f"'{w}'" for w in STOPWORDS[lang]), lang=lang
        )
        for lang in LANG_PRIORITY
    )
    cases = " ".join(
        "WHEN "
        + " AND ".join(
            f"score_{lang} >= score_{other}"
            for other in LANG_PRIORITY
            if other != lang
        )
        + f" THEN '{lang}'"
        for lang in LANG_PRIORITY
    )
    return f"""
SELECT {id_col}, score_en, score_de, score_es, score_fr,
       CASE {cases} ELSE '??' END AS lang_pred
FROM (
  SELECT {id_col}, {score_cols}
  FROM (SELECT {id_col}, {toks} AS toks FROM {table})
)
"""


def norm_text_col(text_col: str = "text"):
    """THE normalization the dedup family fingerprints over — one
    definition (lowercase, collapse whitespace, trim) so consumers
    (fingerprint, corpus_datasheet) cannot drift onto different keys
    (review r9)."""
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def NORM_TEXT_SQL(expr: str = "text") -> str:
    """DuckDB mirror of norm_text_col."""
    return f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalization fingerprint: md5 of lowercased, whitespace-collapsed,
    trimmed text — the canonical near-exact dedup key."""
    return docs.select(
        F.col(id_col), F.md5(norm_text_col(text_col)).alias("fingerprint"))


def fingerprint_sql(table: str = "documents", text_expr: str = "text",
                    id_col: str = "doc_id") -> str:
    return f"""
SELECT {id_col},
       md5({NORM_TEXT_SQL(text_expr)}) AS fingerprint
FROM {table}
"""


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus token accounting per (lang, source) — exact sums + ratio."""
    n_tokens = F.size(tokens_col(text_col)).cast("long")
    return (
        docs.select("lang", "source", n_tokens.alias("n_tokens"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            (F.sum("n_tokens").cast("long") / F.count(F.lit(1)).cast("long")).alias(
                "avg_tokens"
            ),
        )
    )


def token_counts_sql(table: str = "documents", text_expr: str = "text") -> str:
    toks = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t != '')"
    return f"""
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_tokens) AS BIGINT) / CAST(count(*) AS BIGINT) AS avg_tokens
FROM (SELECT lang, source, CAST(len({toks}) AS BIGINT) AS n_tokens FROM {table})
GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# Repetition-based quality filters (Gopher-style; Rae et al. 2021 §A.1.1)
# ---------------------------------------------------------------------------
#
# Fraction-of-repetition signals over word n-grams: most-common-word
# fraction, top-2-gram fraction, duplicated 2/3-gram fractions. Documents
# here are single-line, so the published line-level variants collapse to
# the n-gram family; the same explode->count pipeline generalizes to lines
# by swapping the tokenizer.
#
# Scale shape: ONE union of three explodes (1/2/3-grams tagged by `kind`)
# -> ONE groupBy (doc, kind, gram) with map-side combine -> two small
# keyed aggregations per doc. Everything keyed by doc_id: partitions
# cleanly at any scale, no UDFs, no driver round-trips.
#
# Exactness: counts are ints; every fraction is one double division of two
# exact ints, mirrored operation-for-operation in the SQL builder. The
# deterministic top gram is row_number ordered by (count DESC, gram ASC).

REPETITION_THRESHOLDS = {
    "top_word_frac": 0.30,
    "top_2gram_frac": 0.20,
    "dup_3gram_frac": 0.30,
}


def repetition_metrics(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-doc n-gram repetition metrics + a Gopher-style keep flag."""
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col), tokens_col(text_col).alias("words")
    ).withColumn("n_words", F.size("words").cast("long")).filter(
        F.col("n_words") > 0
    )

    def gram_rows(k: int):
        if k == 1:
            gram = F.explode("words")
        else:
            # guard n_words >= k: sequence(1, n-(k-1)) REVERSES when the
            # doc is shorter than the gram (sequence(1, 0) = [1, 0]) and
            # would fabricate phantom grams from out-of-range
            # element_at NULLs (the r9 char_simpson lesson)
            idx = F.when(
                F.col("n_words") >= k,
                F.sequence(F.lit(1),
                           (F.col("n_words") - (k - 1)).cast("int")),
            ).otherwise(F.array().cast("array<int>"))
            terms = lambda i: F.concat_ws(  # noqa: E731
                " ", *[F.element_at("words", i + j) for j in range(k)]
            )
            gram = F.explode(
                F.when(F.col("n_words") >= k, F.transform(idx, terms))
                .otherwise(F.array().cast("array<string>"))
            )
        return base.select(F.col(id_col), F.lit(k).alias("kind"),
                           gram.alias("gram"))

    grams = gram_rows(1).unionByName(gram_rows(2)).unionByName(gram_rows(3))
    counts = grams.groupBy(id_col, "kind", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = counts.groupBy(id_col, "kind").agg(
        F.sum("c").cast("long").alias("n"),
        F.max("c").cast("long").alias("mx"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
        .cast("long").alias("dup"),
    )
    w = Window.partitionBy(id_col, "kind").orderBy(F.col("c").desc(), "gram")
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "kind", F.col("gram").alias("top_gram"))
    )
    per = totals.join(top, [id_col, "kind"])

    def pick(kind: int, col: str):
        return F.max(F.when(F.col("kind") == kind, F.col(col)))

    piv = per.groupBy(id_col).agg(
        pick(1, "n").alias("n_words"),
        pick(1, "top_gram").alias("top_word"),
        pick(1, "mx").alias("mx1"),
        pick(2, "top_gram").alias("top_2gram"),
        pick(2, "mx").alias("mx2"),
        pick(2, "n").alias("n2"),
        pick(2, "dup").alias("dup2"),
        pick(3, "n").alias("n3"),
        pick(3, "dup").alias("dup3"),
    )

    def frac(num, den):
        return F.when(
            F.col(den).isNotNull(),
            F.col(num).cast("double") / F.col(den).cast("double"),
        ).otherwise(F.lit(0.0))

    t = REPETITION_THRESHOLDS
    out = piv.select(
        id_col,
        "n_words",
        "top_word",
        frac("mx1", "n_words").alias("top_word_frac"),
        "top_2gram",
        frac("mx2", "n2").alias("top_2gram_frac"),
        frac("dup2", "n2").alias("dup_2gram_frac"),
        frac("dup3", "n3").alias("dup_3gram_frac"),
    )
    return out.withColumn(
        "keep",
        (F.col("top_word_frac") < t["top_word_frac"])
        & (F.col("top_2gram_frac") < t["top_2gram_frac"])
        & (F.col("dup_3gram_frac") < t["dup_3gram_frac"]),
    )


def repetition_metrics_sql(table: str = "documents", text_expr: str = "text",
                           id_col: str = "doc_id") -> str:
    toks = ("list_filter(regexp_split_to_array(lower(" + text_expr
            + "), '\\s+'), t -> t != '')")
    t = REPETITION_THRESHOLDS
    return f"""
WITH base AS (
  SELECT {id_col}, words, CAST(len(words) AS BIGINT) AS n_words
  FROM (SELECT {id_col}, {toks} AS words FROM {table})
  WHERE len(words) > 0
),
g AS (
  SELECT {id_col}, 1 AS kind, unnest(words) AS gram FROM base
  UNION ALL
  SELECT {id_col}, 2, unnest(list_transform(range(1, CAST(n_words AS INTEGER)),
         i -> words[i] || ' ' || words[i+1])) FROM base
  UNION ALL
  SELECT {id_col}, 3, unnest(list_transform(range(1, CAST(n_words AS INTEGER) - 1),
         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) FROM base
),
c AS (
  SELECT {id_col}, kind, gram, CAST(count(*) AS BIGINT) AS c
  FROM g GROUP BY 1, 2, 3
),
t AS (
  SELECT {id_col}, kind,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(max(c) AS BIGINT) AS mx,
         CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup
  FROM c GROUP BY 1, 2
),
r AS (
  SELECT {id_col}, kind, gram,
         row_number() OVER (PARTITION BY {id_col}, kind
                            ORDER BY c DESC, gram) AS rn
  FROM c
),
top AS (SELECT {id_col}, kind, gram AS top_gram FROM r WHERE rn = 1),
per AS (SELECT * FROM t JOIN top USING ({id_col}, kind)),
piv AS (
  SELECT {id_col},
         max(CASE WHEN kind = 1 THEN n END) AS n_words,
         max(CASE WHEN kind = 1 THEN top_gram END) AS top_word,
         max(CASE WHEN kind = 1 THEN mx END) AS mx1,
         max(CASE WHEN kind = 2 THEN top_gram END) AS top_2gram,
         max(CASE WHEN kind = 2 THEN mx END) AS mx2,
         max(CASE WHEN kind = 2 THEN n END) AS n2,
         max(CASE WHEN kind = 2 THEN dup END) AS dup2,
         max(CASE WHEN kind = 3 THEN n END) AS n3,
         max(CASE WHEN kind = 3 THEN dup END) AS dup3
  FROM per GROUP BY {id_col}
),
m AS (
  SELECT {id_col}, n_words, top_word,
         CASE WHEN n_words IS NOT NULL
              THEN CAST(mx1 AS DOUBLE) / CAST(n_words AS DOUBLE)
              ELSE 0.0 END AS top_word_frac,
         top_2gram,
         CASE WHEN n2 IS NOT NULL
              THEN CAST(mx2 AS DOUBLE) / CAST(n2 AS DOUBLE)
              ELSE 0.0 END AS top_2gram_frac,
         CASE WHEN n2 IS NOT NULL
              THEN CAST(dup2 AS DOUBLE) / CAST(n2 AS DOUBLE)
              ELSE 0.0 END AS dup_2gram_frac,
         CASE WHEN n3 IS NOT NULL
              THEN CAST(dup3 AS DOUBLE) / CAST(n3 AS DOUBLE)
              ELSE 0.0 END AS dup_3gram_frac
  FROM piv
)
SELECT *,
       (top_word_frac < {t["top_word_frac"]}
        AND top_2gram_frac < {t["top_2gram_frac"]}
        AND dup_3gram_frac < {t["dup_3gram_frac"]}) AS keep
FROM m
"""


# ---------------------------------------------------------------------------
# Ordered quality-filter funnel (Gopher-rule style, Rae et al. 2021)
# ---------------------------------------------------------------------------

# (rule name, survives-this-rule predicate over the integer features
# nt / sl / ns / m).  ORDER matters: the funnel reports, per rule, how
# many docs that survived every earlier rule die here — the operational
# report a corpus-cleaning pipeline tunes thresholds against.  Every
# predicate is an INTEGER cross-multiplication (mean token length in
# [4.0, 5.0] is sl*10 BETWEEN 40*nt AND 50*nt), so both engines agree
# bit-for-bit with no ratio arithmetic.
FUNNEL_RULES = [
    ("min_tokens_20", "nt >= 20"),
    ("max_tokens_90", "nt <= 90"),
    ("mean_token_len_4_5", "sl * 10 BETWEEN 40 * nt AND 50 * nt"),
    ("min_stopword_3pct", "ns * 100 >= 3 * nt"),
    ("top_word_10pct", "m * 10 <= nt"),
]


def quality_funnel(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-rule kill/survive counts for the ordered quality funnel.

    One tokenized scan yields the integer features (token count nt,
    summed token length sl, stopword hits ns) plus one explode +
    doc-keyed agg for the top-word count m; the funnel itself is ONE
    global aggregate with a conditional count per prefix (map-side
    combined — 6 longs per partition), unpivoted to one row per rule.
    Docs with zero tokens carry m = 0 via the left join and die at
    rule 1 like every other short doc.

    Output: (rule_no, rule, n_in, n_killed, n_out) with
    n_in = n_out of the previous rule (n_in of rule 1 = corpus size).
    Scale: linear scan + one bounded agg; nothing quadratic, no UDFs.
    """
    return funnel_report_from_counters(funnel_counters(docs, text_col,
                                                       id_col))


def funnel_features(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    extra_cols: tuple = ()) -> DataFrame:
    """The per-doc funnel feature frame (doc_id, *extra_cols, nt, sl,
    ns, m) — the ONE derivation every funnel-predicate consumer shares
    (the funnel report, its streaming twin, and the source-valuation
    counterfactuals), so a rule/feature change cannot silently diverge
    between them.  One tokenized scan, every feature row-local.

    r12-opt (guide §2.3, the semdedup row-local-fold discipline): the
    top-word count m used to be explode → (doc, word) groupBy →
    doc groupBy → join back — three fact-scale exchanges whose only
    output is one long per doc.  m is the longest equal-run in the
    SORTED token array, so it now rides a row-local
    array_sort + aggregate fold in the same projection as nt/sl/ns:
    zero exchanges, no join, and the whole feature frame is a single
    narrow map over the scan at any corpus size."""
    toks = tokens_col(text_col)
    en = STOPWORDS["en"]
    base = docs.select(F.col(id_col).alias("doc_id"),
                       *[F.col(c) for c in extra_cols],
                       toks.alias("toks"))
    run = lambda acc, t: F.when(  # noqa: E731
        t == acc["p"], acc["r"] + F.lit(1).cast("long")
    ).otherwise(F.lit(1).cast("long"))
    return base.select(
        "doc_id", *extra_cols,
        F.size("toks").cast("long").alias("nt"),
        F.aggregate("toks", F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t).cast("long"))
        .alias("sl"),
        F.size(F.filter("toks", lambda t: t.isin(en))).cast("long")
        .alias("ns"),
        F.aggregate(
            F.array_sort("toks"),
            F.struct(
                F.lit(None).cast("string").alias("p"),
                F.lit(0).cast("long").alias("r"),
                F.lit(0).cast("long").alias("b")),
            lambda acc, t: F.struct(
                t.alias("p"), run(acc, t).alias("r"),
                F.greatest(acc["b"], run(acc, t)).alias("b")),
            lambda acc: acc["b"],
        ).alias("m"),
    )


def FUNNEL_FEATURES_CTES(table: str = "documents",
                         text_expr: str = "text",
                         id_col: str = "doc_id",
                         extra: str = "") -> str:
    """DuckDB mirror of funnel_features as a CTE chain ending in ``f``
    (columns: {extra} nt, sl, ns, m).  ``extra`` is a trailing-comma
    column list (e.g. ``"source,"``)."""
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    toks = (f"list_filter(regexp_split_to_array(lower({text_expr}),"
            " '\\s+'), t -> t != '')")
    return f"""base AS (
  SELECT {id_col} AS doc_id, {extra} {toks} AS toks FROM {table}),
feats AS (
  SELECT doc_id, {extra} CAST(len(toks) AS BIGINT) AS nt,
         CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
              AS BIGINT) AS sl,
         CAST(len(list_filter(toks, t -> t IN ({en}))) AS BIGINT) AS ns
  FROM base),
tw AS (
  SELECT doc_id, max(c) AS m FROM (
    SELECT doc_id, w, count(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS w FROM base) GROUP BY 1, 2)
  GROUP BY 1),
f AS (
  SELECT {extra} nt, sl, ns, CAST(coalesce(m, 0) AS BIGINT) AS m
  FROM feats LEFT JOIN tw USING (doc_id))"""


def funnel_counters(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """The funnel's sufficient statistic: ONE row (s0..sK) where s_i =
    docs surviving rules 1..i.  Counters are ADDITIVE over docs (every
    predicate is row-local), so they merge by plain sum — the state the
    streaming twin carries per batch."""
    f = funnel_features(docs, text_col, id_col).select(
        "nt", "sl", "ns", "m")
    prefix = []
    aggs = [F.count(F.lit(1)).cast("long").alias("s0")]
    for i, (_, pred) in enumerate(FUNNEL_RULES, start=1):
        prefix.append(pred)
        conj = " AND ".join(prefix)
        aggs.append(
            F.count(F.when(F.expr(conj), 1)).cast("long").alias(f"s{i}"))
    return f.agg(*aggs)


def funnel_report_from_counters(row: DataFrame) -> DataFrame:
    """Unpivot the one-row counter state to the per-rule funnel report —
    shared by the batch path and the streaming twin."""
    stack_args = []
    for i, (name, _) in enumerate(FUNNEL_RULES, start=1):
        stack_args.append(
            f"CAST({i} AS BIGINT), '{name}', s{i - 1},"
            f" s{i - 1} - s{i}, s{i}")
    return row.selectExpr(
        f"stack({len(FUNNEL_RULES)}, {', '.join(stack_args)})"
        " AS (rule_no, rule, n_in, n_killed, n_out)")


def quality_funnel_sql(table: str = "documents", text_expr: str = "text",
                       id_col: str = "doc_id") -> str:
    prefix, selects = [], []
    counters = ["CAST(count(*) AS BIGINT) AS s0"]
    for i, (_, pred) in enumerate(FUNNEL_RULES, start=1):
        prefix.append(pred)
        conj = " AND ".join(prefix)
        counters.append(f"CAST(count(*) FILTER ({conj}) AS BIGINT) AS s{i}")
    for i, (name, _) in enumerate(FUNNEL_RULES, start=1):
        selects.append(
            f"SELECT CAST({i} AS BIGINT) AS rule_no, '{name}' AS rule,"
            f" s{i - 1} AS n_in, s{i - 1} - s{i} AS n_killed,"
            f" s{i} AS n_out FROM agg")
    return f"""
WITH {FUNNEL_FEATURES_CTES(table, text_expr, id_col)},
agg AS (SELECT {', '.join(counters)} FROM f)
{chr(10).join(s + (' UNION ALL' if i < len(selects) else '')
              for i, s in enumerate(selects, start=1))}
"""


def char_simpson_scores(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Per-doc character-level Simpson index (Rényi-2 collision
    probability): Σ c_i² · 1e6 div n² over the character histogram —
    the transcendental-free cousin of byte entropy used to screen
    degenerate text (a one-character flood scores 1e6; diverse prose
    sits near the language's collision floor, English ≈ 6-7%).  The
    bigram_lm_scores discipline applies: Shannon entropy needs log(),
    which IEEE does NOT require correctly rounded, so a log-based
    oracle can differ in the last ulp cross-engine — the collision
    ratio needs only *, /, floor, all correctly rounded, so the SHARED
    double expression is bit-identical on both engines at any doc
    length (an int64 `sum(c²)·1e6` would wrap at ~3e6 repeated chars —
    exactly the flood this screen targets — while DuckDB's HUGEINT
    would not: silent cross-engine divergence).  One explode over
    character positions + two keyed aggs.

    Characters come from ONE split('') pass — an O(n) array build per
    doc — never substr(text, i, 1) over an exploded index, which
    re-scans the string per position (O(n²): a 4e6-char flood doc took
    minutes; the split form is instant).  Both engines split '' into
    identical per-char arrays and both yield [''] for empty text, so
    the ch != '' filter makes empty docs emit NO row on either engine
    (an unfiltered Spark sequence(1, 0) variant REVERSED to [1, 0] and
    fabricated a 2-char row — review r9).

    Output: (doc_id, n_chars, n_distinct_chars, simpson_ppm)."""
    chars = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.explode(F.split(F.col(text_col), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    hist = chars.groupBy(id_col, "ch").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    return hist.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        F.expr(_SIMPSON_PPM).alias("simpson_ppm"),
    )


# shared double text: CAST the exact integer sums once, then one *, one
# /, one floor — identical operation tree on both engines
_SIMPSON_PPM = (
    "CAST(floor(CAST(sum(c * c) AS DOUBLE) * 1000000.0"
    " / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE))) AS BIGINT)"
)


def char_simpson_sql(table: str = "documents", text_expr: str = "text",
                     id_col: str = "doc_id") -> str:
    return f"""
WITH chars AS (
  SELECT {id_col}, ch FROM (
    SELECT {id_col}, unnest(string_split({text_expr}, '')) AS ch
    FROM {table}
  ) WHERE ch != ''
),
hist AS (
  SELECT {id_col}, ch, CAST(count(*) AS BIGINT) AS c
  FROM chars GROUP BY 1, 2
)
SELECT CAST({id_col} AS BIGINT) AS {id_col},
       CAST(sum(c) AS BIGINT) AS n_chars,
       CAST(count(*) AS BIGINT) AS n_distinct_chars,
       {_SIMPSON_PPM} AS simpson_ppm
FROM hist
GROUP BY 1
"""
