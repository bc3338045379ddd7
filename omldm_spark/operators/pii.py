"""PII detection + redaction over the documents table.

The standard scrubbing pass of a pretraining pipeline (C4/Dolma-style):
regex-match emails, IPv4 addresses, and phone numbers; count matches per
document and rewrite the text with typed placeholders. Pure Catalyst
(`regexp_count` / `regexp_replace`) — zero Python, zero shuffles; at 100 TB
this is a map-only pass that pipelines into whatever scan precedes it.

The synthetic documents table contains no PII (verified: zero matches for
any of the three patterns), so the operator plants deterministic PII spans
derived from ``doc_id`` first — the same derive-inputs-from-the-given-table
approach as operators/multimodal.synth_media — and then detects and redacts
them. Both engines build the identical augmented text, so the oracle checks
the full detect+redact semantics, not just zeros.

Patterns are written in the common subset of Java regex (Spark) and RE2
(DuckDB): character classes, bounded repetition, and ``\\b`` word boundaries
only — no lookaround, no backreferences. Redaction order is email -> ip ->
phone; the placeholder tokens contain no digits or ``@`` so later patterns
cannot match inside an earlier replacement.

Reference scope note: OMLDM has no scrubbing stage (its payloads are numeric
feature vectors, DataPointParser.scala:17-47); this operator is part of the
beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{3}-\d{4}\b"


def plant_pii(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Deterministically append PII spans keyed by doc_id: every 3rd doc an
    email, every 5th an IPv4, every 7th a phone number (some docs get
    several, most get none — exercising multi-match and zero-match rows)."""
    did = F.col(id_col)
    email = F.when(
        did % 3 == 0,
        F.concat(F.lit(" contact user"), did.cast("string"),
                 F.lit("@example.com now")),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 5 == 0,
        F.concat(F.lit(" host 10."), (did % 200).cast("string"), F.lit(".0."),
                 (did % 250).cast("string"), F.lit(" up")),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 7 == 0,
        F.concat(F.lit(" call 555-"), (100 + did % 900).cast("string"),
                 F.lit("-"), (1000 + did % 9000).cast("string"),
                 F.lit(" today")),
    ).otherwise(F.lit(""))
    return docs.withColumn(text_col, F.concat(F.col(text_col), email, ip, phone))


def pii_redact(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document PII counts + redacted text.

    Output: (doc_id, n_emails, n_ips, n_phones, clean_text). Map-only —
    every column is a Catalyst regexp expression over the row."""
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), IPV4_RE, "[IP]"
        ),
        PHONE_RE,
        "[PHONE]",
    )
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        redacted.alias("clean_text"),
    )


def PLANT_PII_SQL(table: str = "documents", text_col: str = "text",
                  id_col: str = "doc_id") -> str:
    """DuckDB mirror of plant_pii: identical augmented text."""
    return f"""
SELECT * REPLACE (
  {text_col}
  || CASE WHEN {id_col} % 3 = 0
          THEN ' contact user' || CAST({id_col} AS VARCHAR) || '@example.com now'
          ELSE '' END
  || CASE WHEN {id_col} % 5 = 0
          THEN ' host 10.' || CAST({id_col} % 200 AS VARCHAR) || '.0.'
               || CAST({id_col} % 250 AS VARCHAR) || ' up'
          ELSE '' END
  || CASE WHEN {id_col} % 7 = 0
          THEN ' call 555-' || CAST(100 + {id_col} % 900 AS VARCHAR) || '-'
               || CAST(1000 + {id_col} % 9000 AS VARCHAR) || ' today'
          ELSE '' END
  AS {text_col})
FROM {table}
"""


def PII_REDACT_SQL(table: str = "documents", text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    t = text_col
    return f"""
WITH planted AS ({PLANT_PII_SQL(table, text_col, id_col)})
SELECT CAST({id_col} AS BIGINT) AS {id_col},
       CAST(len(regexp_extract_all({t}, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all({t}, '{IPV4_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all({t}, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(
         regexp_replace(
           regexp_replace({t}, '{EMAIL_RE}', '[EMAIL]', 'g'),
           '{IPV4_RE}', '[IP]', 'g'),
         '{PHONE_RE}', '[PHONE]', 'g') AS clean_text
FROM planted
"""


# ---------------------------------------------------------------------------
# k-anonymity suppression over quasi-identifier groups
# ---------------------------------------------------------------------------

def k_anonymity_suppress(df: DataFrame, qi_cols: list, k: int = 5):
    """Suppress rows whose quasi-identifier combination matches fewer than
    ``k`` rows — the release gate a privacy-reviewed training export runs
    before shipping user-derived tables.

    Output: the surviving rows plus ``qi_count`` (the group's size).  The
    group size rides ONE window over the QI key — a single QI-keyed
    exchange shared by the count and the output, no join-back of a counts
    table and no second shuffle.  At 100 TB the QI key-space is the
    partitioning axis; skewed QI combos are exactly the ones k-anonymity
    keeps, so the skew is benign (big groups pass through untouched).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*qi_cols)
    return (
        df.withColumn("qi_count", F.count(F.lit(1)).over(w).cast("long"))
        .filter(F.col("qi_count") >= k)
    )


def K_ANONYMITY_SQL(select_sql: str, qi_cols: list, k: int = 5) -> str:
    """Oracle twin over any row-source SELECT."""
    keys = ", ".join(str(c) for c in qi_cols)
    return f"""
SELECT * FROM (
  SELECT *, CAST(count(*) OVER (PARTITION BY {keys}) AS BIGINT) AS qi_count
  FROM ({select_sql})
) WHERE qi_count >= {k}
"""


def l_diversity_audit(df: DataFrame, qi_cols: list, sensitive_col: str,
                      l: int = 3) -> DataFrame:
    """Per-QI-group sensitive-value diversity — the attribute-disclosure
    gate k-anonymity misses (Machanavajjhala et al., "l-Diversity",
    ICDE 2006): a group of >= k rows that all share ONE sensitive value
    still discloses it, so the release gate must also require >= l
    distinct sensitive values per group.

    Output: one row per QI group — (qi..., n_rows, l_distinct,
    top_sensitive_n, passes_l).  Shape: TWO stacked map-side-combined
    aggs ((qi, sensitive) partials, then the qi rollup) — never a
    countDistinct window, so the shuffle carries |qi x sensitive| partial
    rows, bounded by the key space, not the data."""
    per_val = df.groupBy(
        *qi_cols, F.col(sensitive_col).alias("__sv")
    ).agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    return (
        per_val.groupBy(*qi_cols)
        .agg(
            F.sum("__cnt").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("l_distinct"),
            F.max("__cnt").cast("long").alias("top_sensitive_n"),
        )
        .withColumn("passes_l", F.col("l_distinct") >= l)
    )


def L_DIVERSITY_SQL(select_sql: str, qi_cols: list, sensitive_col: str,
                    l: int = 3) -> str:
    keys = ", ".join(str(c) for c in qi_cols)
    return f"""
WITH per_val AS (
  SELECT {keys}, {sensitive_col} AS sv,
         CAST(count(*) AS BIGINT) AS cnt
  FROM ({select_sql}) GROUP BY {keys}, {sensitive_col}
)
SELECT {keys},
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS l_distinct,
       CAST(max(cnt) AS BIGINT) AS top_sensitive_n,
       count(*) >= {l} AS passes_l
FROM per_val GROUP BY {keys}
"""
