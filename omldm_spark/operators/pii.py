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


def t_closeness_audit(df: DataFrame, qi_cols: list, sensitive_col: str,
                      t_ppm: int = 200_000) -> DataFrame:
    """Per-QI-group t-closeness over an ORDERED sensitive attribute —
    the distribution-skew gate completing the release-audit trio
    (k-anonymity -> l-diversity -> t-closeness; Li et al., ICDE 2007):
    a group can be k-anonymous AND l-diverse yet still leak because its
    sensitive distribution differs sharply from the table's.  For an
    ordered attribute the earth-mover's distance collapses to the mean
    absolute cumulative gap: EMD = sum_i |cum_i(P - Q)| / (m - 1).

    Arithmetic is EXACT integer end-to-end on the common denominator
    n_g * N: diff_j = cnt_g_j * N - cnt_t_j * n_g, cumulated in value
    order, and emd_ppm = 10^6 * sum|cum| div (n_g * N * (m-1)).
    Overflow bound: 10^6 * m * n_g * N must stay under 2^63 — fine to
    ~10^5-row groups against ~10^8-row tables; beyond that, audit
    against a fixed-size global sample (the reference distribution is a
    constant anyway).

    Shape: ONE scan — the (QI x value) partial count persists and every
    other distribution (global per-value, totals, group sizes) rolls up
    from it; the dense (group x value) grid comes from a BROADCAST of
    the tiny per-value global table; the window partitions BY GROUP
    (never global).

    Output: (qi..., n_rows, emd_ppm, passes_t)."""
    sv = F.col(sensitive_col).alias("__sv")
    per_group = (
        df.groupBy(*qi_cols, sv)
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt_g"))
        .persist()
    )
    glob = (
        per_group.groupBy("__sv")
        .agg(F.sum("__cnt_g").cast("long").alias("__cnt_t"))
    )
    tot = glob.agg(
        F.sum("__cnt_t").cast("long").alias("__N"),
        F.count(F.lit(1)).cast("long").alias("__m"),
    )
    glob = glob.crossJoin(F.broadcast(tot))
    groups = (
        per_group.groupBy(*qi_cols)
        .agg(F.sum("__cnt_g").cast("long").alias("n_rows"))
    )
    dense = (
        groups.join(F.broadcast(glob))
        .join(per_group, [*qi_cols, "__sv"], "left")
        .select(
            *qi_cols, "__sv", "n_rows", "__N", "__m",
            (F.coalesce("__cnt_g", F.lit(0).cast("long")) * F.col("__N")
             - F.col("__cnt_t") * F.col("n_rows")).alias("__diff"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*qi_cols).orderBy("__sv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.withColumn("__cum", F.sum("__diff").over(w))
    return (
        cum.groupBy(*qi_cols)
        .agg(
            F.first("n_rows").alias("n_rows"),
            F.sum(F.abs("__cum")).cast("long").alias("__emd_num"),
            F.first("__N").alias("__N"),
            F.first("__m").alias("__m"),
        )
        .select(
            *qi_cols, "n_rows",
            F.expr("CAST(1000000 * __emd_num AS BIGINT)"
                   " div (n_rows * __N * (__m - 1))").alias("emd_ppm"),
        )
        .withColumn("passes_t", F.col("emd_ppm") <= t_ppm)
    )


def T_CLOSENESS_SQL(select_sql: str, qi_cols: list, sensitive_col: str,
                    t_ppm: int = 200_000) -> str:
    keys = ", ".join(str(c) for c in qi_cols)
    gk = ", ".join(f"g.{c}" for c in qi_cols)
    pj = " AND ".join(f"p.{c} = g.{c}" for c in qi_cols)
    return f"""
WITH src AS ({select_sql}),
gdist AS (
  SELECT {sensitive_col} AS sv, CAST(count(*) AS BIGINT) AS cnt_t
  FROM src GROUP BY {sensitive_col}
),
tot AS (
  SELECT CAST(sum(cnt_t) AS BIGINT) AS N,
         CAST(count(*) AS BIGINT) AS m
  FROM gdist
),
per_group AS (
  SELECT {keys}, {sensitive_col} AS sv,
         CAST(count(*) AS BIGINT) AS cnt_g
  FROM src GROUP BY {keys}, {sensitive_col}
),
groups AS (
  SELECT {keys}, CAST(sum(cnt_g) AS BIGINT) AS n_rows
  FROM per_group GROUP BY {keys}
),
dense AS (
  SELECT {gk}, v.sv, g.n_rows, t.N, t.m,
         coalesce(p.cnt_g, 0) * t.N - v.cnt_t * g.n_rows AS diff
  FROM groups g CROSS JOIN gdist v CROSS JOIN tot t
  LEFT JOIN per_group p ON {pj} AND p.sv = v.sv
),
cum AS (
  SELECT *, CAST(sum(diff) OVER (
    PARTITION BY {keys} ORDER BY sv
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
  FROM dense
)
SELECT {keys}, any_value(n_rows) AS n_rows,
       CAST(1000000 * sum(abs(c)) AS BIGINT)
         // (any_value(n_rows) * any_value(N) * (any_value(m) - 1))
         AS emd_ppm,
       CAST(1000000 * sum(abs(c)) AS BIGINT)
         // (any_value(n_rows) * any_value(N) * (any_value(m) - 1))
         <= {t_ppm} AS passes_t
FROM cum GROUP BY {keys}
"""
