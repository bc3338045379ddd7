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


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalization fingerprint: md5 of lowercased, whitespace-collapsed,
    trimmed text — the canonical near-exact dedup key."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def fingerprint_sql(table: str = "documents", text_expr: str = "text",
                    id_col: str = "doc_id") -> str:
    return f"""
SELECT {id_col},
       md5(trim(regexp_replace(lower({text_expr}), '\\s+', ' ', 'g'))) AS fingerprint
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
