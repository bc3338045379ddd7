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


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch.
#
# Beyond-reference surface (SURVEY.md §2.11): the cardinality twin of the
# count-min sketch above — m = 2^b integer registers REGARDLESS of input
# size, mergeable across partitions/shards/days by cell-wise max.  At 100 TB
# a COUNT(DISTINCT user_id) shuffles every distinct key; the HLL build is
# ONE groupBy whose key space is m registers (map-side combine collapses
# each partition to <= m rows before the shuffle), and the register table
# broadcasts anywhere.
#
# Determinism / cross-engine exactness:
# * bucket + rho derive from md5 of the key via the same instr-fold SQL text
#   in BOTH engines (CMS recipe above) — register tables hash-match exactly.
# * rho (leading-zero rank) uses a generated integer CASE ladder
#   (sum of `v >= 2^k` indicators), NOT floor(log2(v)): log2 in doubles
#   rounds up at v = 2^48 - 1 (ulp(48) ≈ 1.4e-14 > the true gap), which
#   would mis-rank real md5 outputs.  Integers never lie.
# * the estimate divides integer Z_scaled = sum 2^(49 - M_j) (BIGINT-exact,
#   <= 2^55) through ONE shared double-arithmetic SQL text, so even the
#   float tail is bit-identical across engines (shared-Cramer recipe,
#   learners/orr.py).
# * no small-range ln() correction: libm ln may differ by ulps across
#   engines; the raw estimator stays deterministic and the paired exact
#   count exposes the small-cardinality bias honestly.
# ---------------------------------------------------------------------------

HLL_B = 6  # m = 64 registers; md5 bits: 8 -> bucket (256 % 64 uniform), 48 -> rho


def _hll_hash_sql(key_expr: str) -> str:
    """Shared SQL text for md5 hex of the (stringified) key."""
    return f"md5(CAST({key_expr} AS STRING))"


def hll_bucket_sql(key_expr: str) -> str:
    """Register index 0..63 from the first two hex digits (0..255 uniform,
    256 % 64 == 0 so the fold stays uniform)."""
    h = _hll_hash_sql(key_expr)
    return (
        f"CAST((((instr('{_HEX}', substr({h}, 1, 1)) - 1) * 16"
        f" + (instr('{_HEX}', substr({h}, 2, 1)) - 1)) % 64) AS INT)"
    )


def _hll_v_sql(key_expr: str) -> str:
    """48-bit integer from hex digits 3..14 of the key hash."""
    h = _hll_hash_sql(key_expr)
    terms = " + ".join(
        f"CAST(instr('{_HEX}', substr({h}, {j}, 1)) - 1 AS BIGINT)"
        f" * CAST({16 ** (14 - j)} AS BIGINT)"
        for j in range(3, 15)
    )
    return f"CAST({terms} AS BIGINT)"


def hll_rho_sql(v_expr: str = "v") -> str:
    """rho = (leading zeros of the 48-bit tail) + 1 = 49 - bit_length(v),
    via an integer indicator ladder — exact for every v, unlike
    floor(log2(v)).  ``v_expr`` should be a short column reference (the
    1.5 KB md5 fold is materialized ONCE as a column, not inlined 48x)."""
    bitlen = " + ".join(
        f"(CASE WHEN ({v_expr}) >= {2 ** k} THEN 1 ELSE 0 END)"
        for k in range(0, 48)
    )
    return f"CAST(49 - ({bitlen}) AS INT)"


def hll_registers(df: DataFrame, key_expr: str) -> DataFrame:
    """(bucket, max_rho) for non-empty registers — at most 64 rows.  The
    multiset collapses inside max(): no DISTINCT pass is ever needed
    (max is idempotent), so the only shuffle moves <= 64 rows per map
    partition."""
    return (
        df.select(
            F.expr(hll_bucket_sql(key_expr)).alias("bucket"),
            F.expr(_hll_v_sql(key_expr)).alias("v"),
        )
        .select("bucket", F.expr(hll_rho_sql("v")).alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def _est_sql(z_expr: str) -> str:
    """Shared double-arithmetic text: alpha_64 * 64^2 * 2^49 / Z_scaled.
    alpha_64 = 0.709, the canonical Flajolet constant for m = 64 (the
    0.7213/(1 + 1.079/m) approximation is specified only for m >= 128).
    Every literal is CAST to DOUBLE: DuckDB parses bare decimal literals
    as DECIMAL and its scale-limited division would diverge from Spark's
    double math in the 8th digit (same pitfall as token_budget_mix)."""
    a = "CAST(0.709 AS DOUBLE)"
    m, two49 = "CAST(64.0 AS DOUBLE)", "CAST(562949953421312.0 AS DOUBLE)"
    return (
        f"{a} * {m} * {m}"
        f" * {two49} / CAST({z_expr} AS DOUBLE)"
    )


def hll_distinct(df: DataFrame, key_expr: str) -> DataFrame:
    """One summary row: (m, v_zero, z_scaled, est_distinct, true_distinct).

    z_scaled = sum over ALL m registers of 2^(49 - M_j) with M_j = 0 for
    empty registers — integer BIGINT math (shiftleft), <= 2^55.  The
    est_distinct double derives from that integer through the shared SQL
    text so it hash-matches the oracle bit-for-bit.  true_distinct is the
    paired exact count (the honesty column, same pattern as CMS)."""
    regs = hll_registers(df, key_expr)
    true = df.agg(
        F.countDistinct(F.expr(key_expr)).cast("long").alias("true_distinct")
    )
    return hll_summary_from_registers(regs, true)


def hll_summary_from_registers(regs: DataFrame, true: DataFrame) -> DataFrame:
    """Fold a (bucket, max_rho) register table into the one-row summary —
    shared by the batch path and the streaming twin (whose registers are
    the compacted state of an update-mode max aggregation; HLL's max-merge
    is exactly the streaming-agg merge, so the twin is free)."""
    summary = regs.agg(
        F.count(F.lit(1)).cast("int").alias("n_present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - max_rho)"))
         .cast("long").alias("z_present"),
    ).select(
        F.lit(64).cast("int").alias("m"),
        (F.lit(64) - F.col("n_present")).cast("int").alias("v_zero"),
        (F.col("z_present")
         + (F.lit(64) - F.col("n_present")).cast("long")
         * F.lit(562949953421312).cast("long")).alias("z_scaled"),
    ).withColumn("est_distinct", F.expr(_est_sql("z_scaled")))
    return summary.crossJoin(F.broadcast(true))


def HLL_DISTINCT_SQL(table: str, key_expr: str) -> str:
    """DuckDB oracle — same bucket/rho/est text; integer shifts via `<<`
    (integer ops are exact in both engines, only FLOAT math needs the
    shared-text guarantee)."""
    return f"""
WITH h AS (
  SELECT {hll_bucket_sql(key_expr)} AS bucket,
         {_hll_v_sql(key_expr)} AS v
  FROM {table}
),
regs AS (
  SELECT bucket, max({hll_rho_sql("v")}) AS max_rho
  FROM h GROUP BY 1
),
s AS (
  SELECT CAST(count(*) AS INT) AS n_present,
         CAST(sum(CAST(1 AS BIGINT) << (49 - max_rho)) AS BIGINT)
           AS z_present
  FROM regs
),
summary AS (
  SELECT CAST(64 AS INT) AS m,
         CAST(64 - n_present AS INT) AS v_zero,
         CAST(z_present + CAST(64 - n_present AS BIGINT)
              * CAST(562949953421312 AS BIGINT) AS BIGINT) AS z_scaled
  FROM s
)
SELECT m, v_zero, z_scaled,
       {_est_sql("z_scaled")} AS est_distinct,
       (SELECT CAST(count(DISTINCT {key_expr}) AS BIGINT) FROM {table})
         AS true_distinct
FROM summary
"""


def hll_grouped_distinct(df: DataFrame, group_cols: list[str],
                         key_expr: str) -> DataFrame:
    """Per-group HLL distinct estimates in ONE pass — the query shape a
    100 TB pipeline uses for 'distinct users per (day, country)' style
    rollups where COUNT(DISTINCT) per group would shuffle every distinct
    (group, key) pair.  Here the shuffle is |groups| x m register rows,
    map-side combined, independent of cardinality.

    Output: group cols + (v_zero, z_scaled, est_distinct, true_distinct)
    — integer registers aggregated per group, estimate from the shared
    double text, paired exact count (the honesty column, one extra
    aggregate over the same shuffle keys)."""
    regs = (
        df.select(
            *group_cols,
            F.expr(hll_bucket_sql(key_expr)).alias("bucket"),
            F.expr(_hll_v_sql(key_expr)).alias("v"),
        )
        .select(*group_cols, "bucket", F.expr(hll_rho_sql("v")).alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )
    true = df.groupBy(*group_cols).agg(
        F.countDistinct(F.expr(key_expr)).cast("long").alias("true_distinct")
    )
    return hll_grouped_summary_from_registers(regs, group_cols, true)


def hll_grouped_summary_from_registers(regs: DataFrame,
                                       group_cols: list[str],
                                       true: DataFrame) -> DataFrame:
    """Grouped version of :func:`hll_summary_from_registers` — also the
    read side of the windowed streaming sketch (per-window registers are
    streaming agg state; this folds the compacted state per group)."""
    summary = (
        regs.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_present"),
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - max_rho)"))
             .cast("long").alias("z_present"),
        )
        .select(
            *group_cols,
            (F.lit(64) - F.col("n_present")).cast("int").alias("v_zero"),
            (F.col("z_present")
             + (F.lit(64) - F.col("n_present")).cast("long")
             * F.lit(562949953421312).cast("long")).alias("z_scaled"),
        )
        .withColumn("est_distinct", F.expr(_est_sql("z_scaled")))
    )
    return summary.join(true, group_cols)


def HLL_GROUPED_SQL(table: str, group_cols: list[str], key_expr: str) -> str:
    g = ", ".join(group_cols)
    return f"""
WITH h AS (
  SELECT {g}, {hll_bucket_sql(key_expr)} AS bucket,
         {_hll_v_sql(key_expr)} AS v
  FROM {table}
),
regs AS (
  SELECT {g}, bucket, max({hll_rho_sql("v")}) AS max_rho
  FROM h GROUP BY {g}, bucket
),
s AS (
  SELECT {g}, CAST(count(*) AS INT) AS n_present,
         CAST(sum(CAST(1 AS BIGINT) << (49 - max_rho)) AS BIGINT)
           AS z_present
  FROM regs GROUP BY {g}
),
summary AS (
  SELECT {g}, CAST(64 - n_present AS INT) AS v_zero,
         CAST(z_present + CAST(64 - n_present AS BIGINT)
              * CAST(562949953421312 AS BIGINT) AS BIGINT) AS z_scaled
  FROM s
),
true_c AS (
  SELECT {g}, CAST(count(DISTINCT {key_expr}) AS BIGINT) AS true_distinct
  FROM {table} GROUP BY {g}
)
SELECT summary.*, {_est_sql("z_scaled")} AS est_distinct, true_distinct
FROM summary JOIN true_c USING ({g})
"""


# ---------------------------------------------------------------------------
# Heavy hitters: CMS-prefiltered exact counting
# ---------------------------------------------------------------------------

def cms_heavy_hitters(docs: DataFrame, threshold: int, depth: int = 4,
                      width: int = 256, text_col: str = "text") -> DataFrame:
    """Terms with exact corpus frequency >= ``threshold``, found WITHOUT a
    vocabulary-scale aggregate: the count-min sketch (depth x width cells,
    map-side combined) acts as a candidate filter — a term can reach the
    threshold only if EVERY one of its depth cells does, so the corpus
    token stream inner-joins the broadcast hot-cell set (cells with
    cnt >= threshold) once per depth row and only survivors reach the
    exact count.  No false negatives (CMS never undercounts); false
    positives (cold terms sharing hot cells) die in the final exact
    filter.

    This is the two-pass heavy-hitters plan for when the vocabulary
    doesn't fit a groupBy's key space at 100 TB: pass 1 state is bounded
    at depth*width cells whatever the corpus; pass 2's aggregate keys are
    only the candidates, which Zipf keeps tiny for any meaningful
    threshold.  Returns (tok, cnt, est) with est = min over the term's
    cells — always >= cnt, both exact integers."""
    toks = docs.select(F.explode(tokens_col(text_col)).alias("tok"))
    with_buckets = toks.select(
        "tok",
        *[F.expr(bucket_sql("tok", d, width)).alias(f"b{d}")
          for d in range(depth)],
    )
    sketch = countmin_sketch(docs, depth=depth, width=width,
                             text_col=text_col)
    hot = sketch.filter(F.col("cnt") >= threshold)
    cand = with_buckets
    for d in range(depth):
        hd = hot.filter(F.col("d") == d).select(
            F.col("bucket").alias(f"b{d}"), F.col("cnt").alias(f"c{d}")
        )
        cand = cand.join(F.broadcast(hd), f"b{d}")
    return (
        cand.groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min(F.least(*[F.col(f"c{d}") for d in range(depth)]))
            .cast("long").alias("est"),
        )
        .filter(F.col("cnt") >= threshold)
    )


def CMS_HEAVY_HITTERS_SQL(threshold: int, depth: int = 4, width: int = 256,
                          table: str = "documents",
                          text_expr: str = "text") -> str:
    """DuckDB oracle: exact counts filtered at the threshold, paired with
    the same sketch-cell minimum (the oracle recomputes est from the
    shared md5 instr-fold cells — identical collisions)."""
    cell_selects = " UNION ALL ".join(
        f"SELECT {d} AS d, {bucket_sql('tok', d, width)} AS bucket FROM toks"
        for d in range(depth)
    )
    est_joins = "\n".join(
        f"JOIN cells c{d} ON c{d}.d = {d}"
        f" AND c{d}.bucket = {bucket_sql('e.tok', d, width)}"
        for d in range(depth)
    )
    least = ", ".join(f"c{d}.cnt" for d in range(depth))
    return f"""
WITH toks AS (
  SELECT unnest({TOKENS_SQL(text_expr)}) AS tok FROM {table}
),
cells AS (
  SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM ({cell_selects}) GROUP BY 1, 2
),
exact AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1
)
SELECT e.tok, e.cnt, CAST(least({least}) AS BIGINT) AS est
FROM exact e
{est_joins}
WHERE e.cnt >= {threshold}
"""


# ---------------------------------------------------------------------------
# Sliding-window distinct via sketch merging
# ---------------------------------------------------------------------------

def hll_trailing_daily(df: DataFrame, key_expr: str, ts_s_col: str,
                       trailing_days: int = 7) -> DataFrame:
    """Trailing-N-day distinct counts per observed day from MERGED daily
    HLL registers — the sliding-window COUNT DISTINCT that has no cheap
    exact form at scale (each day's users overlap the next; re-counting
    every window re-reads N days of raw data).  The corpus is read ONCE
    into per-(day, bucket) registers; each cell then fans out to the <= N
    trailing windows it serves (cells x N rows, sketch-scale, nowhere
    near the corpus) and cell-wise max — HLL's lossless merge — rebuilds
    every window's registers.  Windows are reported at OBSERVED days
    (semi-join).  The paired true_distinct column is the exact audit
    (computed from day-deduplicated pairs, the only corpus-scale part an
    exact answer inherently needs)."""
    day = f"CAST({ts_s_col} div 86400 AS BIGINT)"
    cells = (
        df.select(
            F.expr(day).alias("day_idx"),
            F.expr(hll_bucket_sql(key_expr)).alias("bucket"),
            F.expr(_hll_v_sql(key_expr)).alias("v"),
        )
        .select("day_idx", "bucket", F.expr(hll_rho_sql("v")).alias("rho"))
        .groupBy("day_idx", "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )
    days = cells.select("day_idx").distinct()
    fan = cells.select(
        F.explode(
            F.sequence(F.col("day_idx"),
                       F.col("day_idx") + (trailing_days - 1))
        ).alias("day_idx"),
        F.col("bucket"),
        F.col("max_rho"),
    ).join(days, "day_idx", "left_semi")
    regs = fan.groupBy("day_idx", "bucket").agg(
        F.max("max_rho").alias("max_rho")
    )
    pairs = df.select(
        F.expr(day).alias("day_idx"), F.expr(key_expr).alias("k")
    ).distinct()
    true = (
        pairs.select(
            F.explode(
                F.sequence(F.col("day_idx"),
                           F.col("day_idx") + (trailing_days - 1))
            ).alias("day_idx"),
            "k",
        )
        .join(days, "day_idx", "left_semi")
        .groupBy("day_idx")
        .agg(F.countDistinct("k").cast("long").alias("true_distinct"))
    )
    return hll_grouped_summary_from_registers(regs, ["day_idx"], true)


def HLL_TRAILING_DAILY_SQL(table: str, key_expr: str, ts_s_expr: str,
                           trailing_days: int = 7) -> str:
    n1 = trailing_days - 1
    return f"""
WITH base AS (
  SELECT CAST(({ts_s_expr}) // 86400 AS BIGINT) AS day_idx, {key_expr} AS k
  FROM {table}
),
h AS (
  SELECT day_idx, {hll_bucket_sql("k")} AS bucket, {_hll_v_sql("k")} AS v
  FROM base
),
cells AS (
  SELECT day_idx, bucket, max({hll_rho_sql("v")}) AS max_rho
  FROM h GROUP BY 1, 2
),
days AS (SELECT DISTINCT day_idx FROM cells),
fan AS (
  SELECT c.day_idx + off AS day_idx, c.bucket, c.max_rho
  FROM cells c CROSS JOIN (
    SELECT unnest(generate_series(0, {n1})) AS off
  )
  WHERE c.day_idx + off IN (SELECT day_idx FROM days)
),
regs AS (
  SELECT day_idx, bucket, max(max_rho) AS max_rho FROM fan GROUP BY 1, 2
),
s AS (
  SELECT day_idx, CAST(count(*) AS INT) AS n_present,
         CAST(sum(CAST(1 AS BIGINT) << (49 - max_rho)) AS BIGINT)
           AS z_present
  FROM regs GROUP BY 1
),
summary AS (
  SELECT day_idx, CAST(64 - n_present AS INT) AS v_zero,
         CAST(z_present + CAST(64 - n_present AS BIGINT)
              * CAST(562949953421312 AS BIGINT) AS BIGINT) AS z_scaled
  FROM s
),
pairs AS (SELECT DISTINCT day_idx, k FROM base),
true_c AS (
  SELECT f.day_idx, CAST(count(DISTINCT f.k) AS BIGINT) AS true_distinct
  FROM (
    SELECT p.day_idx + off AS day_idx, p.k
    FROM pairs p CROSS JOIN (
      SELECT unnest(generate_series(0, {n1})) AS off
    )
    WHERE p.day_idx + off IN (SELECT day_idx FROM days)
  ) f
  GROUP BY 1
)
SELECT summary.*, {_est_sql("z_scaled")} AS est_distinct, true_distinct
FROM summary JOIN true_c USING (day_idx)
"""


def hll_overlap(df: DataFrame, key_expr: str, cond_a, cond_b) -> DataFrame:
    """Audience-overlap estimate from MERGEABLE HLL registers: |A∩B| is
    not directly sketchable, but |A∪B| is free (cell-wise max of the two
    register sets — the same merge the shards/streams already use), so
    inclusion-exclusion gives est_overlap = est_a + est_b - est_union
    without ever joining the two audiences.  The join-free shape is the
    point at 100 TB: three constant-size register sets instead of a
    distinct-user semi join.  Error grows when the overlap is small
    relative to the audiences (differences of estimates) — the paired
    exact columns (true_a/true_b/true_overlap, one extra aggregate) are
    the honesty check, as everywhere in this module.

    Output one row: z_a, z_b, z_union (BIGINT register sums), est_a,
    est_b, est_union, est_overlap (shared-double-text derived — hash-
    exact cross-engine), true_a, true_b, true_overlap."""
    def regs(cond):
        return (
            df.filter(cond)
            .select(
                F.expr(hll_bucket_sql(key_expr)).alias("bucket"),
                F.expr(_hll_v_sql(key_expr)).alias("v"),
            )
            .select("bucket", F.expr(hll_rho_sql("v")).alias("rho"))
            .groupBy("bucket")
            .agg(F.max("rho").alias("max_rho"))
        )

    def z_of(r, name):
        return (
            r.agg(
                F.count(F.lit(1)).cast("long").alias("np"),
                F.sum(F.expr(
                    "shiftleft(CAST(1 AS BIGINT), 49 - max_rho)"))
                .cast("long").alias("zp"),
            )
            .select(
                (F.col("zp") + (F.lit(64) - F.col("np"))
                 * F.lit(562949953421312).cast("long")).alias(name)
            )
        )

    ra, rb = regs(cond_a), regs(cond_b)
    runion = (
        ra.unionByName(rb).groupBy("bucket").agg(
            F.max("max_rho").alias("max_rho"))
    )
    za, zb, zu = z_of(ra, "z_a"), z_of(rb, "z_b"), z_of(runion, "z_union")
    ka = F.expr(key_expr)
    true = df.agg(
        F.countDistinct(F.when(cond_a, ka)).cast("long").alias("true_a"),
        F.countDistinct(F.when(cond_b, ka)).cast("long").alias("true_b"),
    )
    t_overlap = (
        df.filter(cond_a).select(ka.alias("k")).distinct()
        .join(df.filter(cond_b).select(ka.alias("k")).distinct(), "k",
              "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("true_overlap"))
    )
    out = za.crossJoin(zb).crossJoin(zu)
    return (
        out.withColumn("est_a", F.expr(_est_sql("z_a")))
        .withColumn("est_b", F.expr(_est_sql("z_b")))
        .withColumn("est_union", F.expr(_est_sql("z_union")))
        .withColumn(
            "est_overlap",
            F.expr(f"{_est_sql('z_a')} + {_est_sql('z_b')}"
                   f" - {_est_sql('z_union')}"),
        )
        .crossJoin(true).crossJoin(t_overlap)
    )


def HLL_OVERLAP_SQL(table: str, key_expr: str, cond_a_sql: str,
                    cond_b_sql: str) -> str:
    def regs(name, cond):
        return f"""{name} AS (
  SELECT bucket, max({hll_rho_sql("v")}) AS max_rho
  FROM (SELECT {hll_bucket_sql(key_expr)} AS bucket,
               {_hll_v_sql(key_expr)} AS v
        FROM {table} WHERE {cond})
  GROUP BY bucket
)"""

    def z(name, src):
        return f"""{name} AS (
  SELECT CAST(sum(CAST(1 AS BIGINT) << (49 - max_rho)) AS BIGINT)
         + CAST(64 - count(*) AS BIGINT)
           * CAST(562949953421312 AS BIGINT) AS z
  FROM {src}
)"""

    return f"""
WITH {regs("ra", cond_a_sql)},
{regs("rb", cond_b_sql)},
ru AS (
  SELECT bucket, max(max_rho) AS max_rho
  FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY bucket
),
{z("za", "ra")}, {z("zb", "rb")}, {z("zu", "ru")},
tr AS (
  SELECT CAST(count(DISTINCT CASE WHEN {cond_a_sql} THEN {key_expr} END)
              AS BIGINT) AS true_a,
         CAST(count(DISTINCT CASE WHEN {cond_b_sql} THEN {key_expr} END)
              AS BIGINT) AS true_b
  FROM {table}
),
tov AS (
  SELECT CAST(count(*) AS BIGINT) AS true_overlap FROM (
    SELECT DISTINCT {key_expr} AS k FROM {table} WHERE {cond_a_sql}
    INTERSECT
    SELECT DISTINCT {key_expr} AS k FROM {table} WHERE {cond_b_sql}
  )
)
SELECT za.z AS z_a, zb.z AS z_b, zu.z AS z_union,
       {_est_sql("za.z")} AS est_a,
       {_est_sql("zb.z")} AS est_b,
       {_est_sql("zu.z")} AS est_union,
       {_est_sql("za.z")} + {_est_sql("zb.z")} - {_est_sql("zu.z")}
         AS est_overlap,
       tr.true_a, tr.true_b, tov.true_overlap
FROM za, zb, zu, tr, tov
"""


AMS_K = 9  # counters; the median-of-9 estimator


def ams_f2_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """AMS second-moment sketch (Alon-Matias-Szegedy, STOC'96) over the
    corpus token-frequency vector, beside the exact F2 it estimates —
    completing the mergeable-sketch quartet (HLL distincts, count-min
    point counts, bloom membership, AMS moments).  F2 drives
    self-join-size estimation and skew detection: F2/n² is the
    collision probability a join planner prices.

    Determinism (the HLL discipline): counter j's ±1 sign for token t
    is the parity of hex digit j+1 of md5(t) — one md5 per TYPE, nine
    digit-reads, identical text on both engines; no RNG.  Every
    counter is an exact BIGINT (Σ ±f(t)), the estimate is the median
    of the nine squares via an ordered pick over the 9-row frame, and
    the signed error rides the shared floor text.

    Output: one row (k, n_tokens, n_types, true_f2, est_f2, err_ppm).

    Scale: one token aggregation (vocab-scale, map-side combined), a
    9x explode that feeds the combiner (9 partial rows per partition
    leave the map side), and O(k) final arithmetic.  The sketch state
    is k longs — THE streaming/mergeable moment estimator."""
    from .dedup import tokens_col

    f = (
        docs.select(F.explode(tokens_col(text_col)).alias("t"))
        .groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    sgn = (
        f"CASE WHEN (instr('{_HEX}', substr(md5(t), j + 1, 1)) - 1) % 2"
        " = 0 THEN 1 ELSE -1 END"
    )
    counters = (
        f.select("t", "f",
                 F.explode(F.sequence(F.lit(0), F.lit(AMS_K - 1)))
                 .alias("j"))
        .groupBy("j")
        .agg(F.sum(F.expr(f"({sgn}) * f")).cast("long").alias("c"))
    )
    from pyspark.sql import Window

    ranked = counters.select(
        "j", (F.col("c") * F.col("c")).cast("long").alias("c2")
    ).select(
        "c2",
        F.row_number().over(Window.orderBy("c2", "j")).alias("rn"),
    )
    est = ranked.where(F.col("rn") == (AMS_K + 1) // 2) \
        .select(F.col("c2").alias("est_f2"))
    tot = f.agg(
        F.sum("f").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.expr("f * f")).cast("long").alias("true_f2"),
    )
    return tot.crossJoin(F.broadcast(est)).select(
        F.lit(AMS_K).cast("long").alias("k"),
        "n_tokens", "n_types", "true_f2", "est_f2",
        # diagnostic ratio in DOUBLE throughout (ADVICE r10: a BIGINT
        # (est-true)*1e6 product overflows int64 once |est-true| exceeds
        # ~9.2e12 — reachable by a quadratic F2 around ~1e8 tokens, far
        # below the module's scale envelope); floor-ppm of an
        # IEEE-identical expression is engine-portable
        F.expr(
            "CAST(floor((CAST(est_f2 AS DOUBLE) - CAST(true_f2 AS DOUBLE))"
            " * 1000000.0 / CAST(true_f2 AS DOUBLE)) AS BIGINT)"
        ).alias("err_ppm"),
    )


def AMS_F2_SQL(table: str = "documents", text_expr: str = "text") -> str:
    from .dedup import TOKENS_SQL

    sgn = (
        f"CASE WHEN (instr('{_HEX}', substr(md5(t), j + 1, 1)) - 1) % 2"
        " = 0 THEN 1 ELSE -1 END"
    )
    return f"""
WITH f AS (
  SELECT t, CAST(count(*) AS BIGINT) AS f
  FROM (SELECT unnest({TOKENS_SQL(text_expr)}) AS t FROM {table})
  GROUP BY 1
),
counters AS (
  SELECT j, CAST(sum(({sgn}) * f) AS BIGINT) AS c
  FROM f CROSS JOIN (SELECT unnest(generate_series(0, {AMS_K - 1})) AS j)
  GROUP BY 1
),
ranked AS (
  SELECT CAST(c * c AS BIGINT) AS c2,
         row_number() OVER (ORDER BY CAST(c * c AS BIGINT), j) AS rn
  FROM counters
),
est AS (SELECT c2 AS est_f2 FROM ranked WHERE rn = {(AMS_K + 1) // 2}),
tot AS (
  SELECT CAST(sum(f) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(f * f) AS BIGINT) AS true_f2
  FROM f
)
SELECT CAST({AMS_K} AS BIGINT) AS k, n_tokens, n_types, true_f2, est_f2,
       CAST(floor((CAST(est_f2 AS DOUBLE) - CAST(true_f2 AS DOUBLE))
            * 1000000.0 / CAST(true_f2 AS DOUBLE)) AS BIGINT) AS err_ppm
FROM tot CROSS JOIN est
"""
