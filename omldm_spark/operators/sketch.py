"""Distributed sketches: count-min over corpus term frequencies.

Beyond-reference surface (SURVEY.md §2.11 charter): the heavy-hitter /
frequency-estimation primitive a 100 TB corpus pipeline uses when the exact
vocabulary (vocab_top_terms) is too wide to materialize — the sketch is
depth x width integers REGARDLESS of corpus size, so it fits in one
broadcast and merges across partitions/shards/days by cell-wise addition.

Scale design:

* build      one token explode x depth rows, then ONE hash-groupBy whose
             key space is at most depth*width cells — map-side combine
             collapses almost everything before the shuffle; the shuffle
             payload is the sketch itself (KBs), independent of corpus
             scale. No driver state, no UDFs.
* estimate   probe terms and the sketch are both tiny -> broadcast joins;
             the corpus is touched only by the (optional) exact-count
             comparison column.

Cross-engine exactness: the row hash h_d(token) must be IDENTICAL in Spark
and DuckDB or the cells don't line up. Both engines evaluate the SAME SQL
text: the first 6 hex digits of md5(d || '|' || token) are folded to an
integer with instr('0123..f', digit) arithmetic (the simhash recipe,
operators/dedup.py) and reduced mod width — no engine-specific hash, no
floats, so sketch cells and min-estimates hash-match bit-for-bit.

The estimate is the classic CMS guarantee: est >= true always (cells only
ever over-count on collisions), which the paired exact count exposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import TOKENS_SQL, tokens_col

_HEX = "0123456789abcdef"


def bucket_sql(tok_expr: str, d: int, width: int, nhex: int = 6) -> str:
    """SQL text (valid in BOTH Spark SQL and DuckDB) for row ``d``'s
    bucket of a token expression: fold the first ``nhex`` hex digits of
    md5('d|' || token) into an integer, mod width. Values < 16^6 — no
    overflow anywhere."""
    terms = " + ".join(
        f"(instr('{_HEX}', substr(md5(concat('{d}|', {tok_expr})), {j}, 1)) - 1)"
        f" * {16 ** (nhex - j)}"
        for j in range(1, nhex + 1)
    )
    return f"CAST(({terms}) % {width} AS BIGINT)"


def countmin_sketch(docs: DataFrame, depth: int = 4, width: int = 256,
                    text_col: str = "text") -> DataFrame:
    """Build the sketch: (d, bucket, cnt) — at most depth*width rows."""
    toks = docs.select(F.explode(tokens_col(text_col)).alias("tok"))
    cells = toks.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).cast("int").alias("d"),
                    F.expr(bucket_sql("tok", d, width)).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("c")
    ).select("c.d", "c.bucket")
    return cells.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_term_counts(docs: DataFrame, terms: list[str], depth: int = 4,
                    width: int = 256, text_col: str = "text") -> DataFrame:
    """Estimate each probe term's corpus frequency from the sketch and pair
    it with the exact count: (term, est_cnt, true_cnt), est >= true.

    The sketch and the probe set both broadcast; the only corpus-scale work
    is the sketch build and the exact-count comparison aggregate."""
    spark = docs.sparkSession
    sketch = countmin_sketch(docs, depth=depth, width=width,
                             text_col=text_col)
    probe = spark.createDataFrame([(t,) for t in terms], "term string")
    pcells = probe.select(
        "term",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).cast("int").alias("d"),
                    F.expr(bucket_sql("term", d, width)).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("c"),
    ).select("term", "c.d", "c.bucket")
    est = (
        pcells.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
             .cast("long").alias("est_cnt"))
    )
    toks = docs.select(F.explode(tokens_col(text_col)).alias("tok"))
    true = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy(F.col("tok").alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    )
    return (
        est.join(F.broadcast(true), "term", "left")
        .select(
            "term", "est_cnt",
            F.coalesce(F.col("true_cnt"), F.lit(0).cast("long"))
             .alias("true_cnt"),
        )
    )


def CMS_TERM_COUNTS_SQL(terms: list[str], depth: int = 4, width: int = 256,
                        table: str = "documents",
                        text_expr: str = "text") -> str:
    values = ", ".join(f"('{t}')" for t in terms)
    in_list = ", ".join(f"'{t}'" for t in terms)
    cell_union = "\nUNION ALL ".join(
        f"SELECT {d} AS d, {bucket_sql('tok', d, width)} AS bucket FROM toks"
        for d in range(depth)
    )
    probe_union = "\nUNION ALL ".join(
        f"SELECT term, {d} AS d, {bucket_sql('term', d, width)} AS bucket"
        f" FROM probe"
        for d in range(depth)
    )
    return f"""
WITH toks AS (
  SELECT unnest({TOKENS_SQL(text_expr)}) AS tok FROM {table}
),
sketch AS (
  SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM ({cell_union}) GROUP BY d, bucket
),
probe(term) AS (VALUES {values}),
pcells AS ({probe_union}),
est AS (
  SELECT term,
         CAST(min(coalesce(s.cnt, CAST(0 AS BIGINT))) AS BIGINT) AS est_cnt
  FROM pcells p LEFT JOIN sketch s ON p.d = s.d AND p.bucket = s.bucket
  GROUP BY term
),
tru AS (
  SELECT tok AS term, CAST(count(*) AS BIGINT) AS true_cnt
  FROM toks WHERE tok IN ({in_list}) GROUP BY tok
)
SELECT e.term, e.est_cnt,
       coalesce(t.true_cnt, CAST(0 AS BIGINT)) AS true_cnt
FROM est e LEFT JOIN tru t ON e.term = t.term
"""
