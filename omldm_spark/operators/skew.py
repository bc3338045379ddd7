"""Skew-resistant aggregation: two-phase salted groupBy (SURVEY.md scale
rules; the hand-tuned partitioners of the reference, R1/R4, become hash
shuffles — salting is the Spark-native answer when a key is hot).

    groupBy(key)          one reducer owns the hot key -> straggler
    salted two-phase      groupBy(key, salt) partial  -> groupBy(key) final
                          hot key spreads over ``salt_buckets`` reducers;
                          the second shuffle moves only partial aggregates.

AQE's skew-join handling covers joins; this covers aggregations whose
partials are algebraic (sum/count/min/max — anything with a merge). Results
are EXACTLY equal to the direct groupBy (integer/exact partials), which the
oracle asserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    salt_buckets: int = 16,
    salt_source: Column | None = None,
    **aggs: tuple[str, str],
) -> DataFrame:
    """Two-phase aggregation. ``aggs`` maps output name -> (fn, col) with fn
    in {sum, count, min, max}. ``salt_source`` defaults to a deterministic
    per-row expression (keep it deterministic for replayable tests; use
    rand() in production where determinism doesn't matter).
    """
    salt = (
        salt_source
        if salt_source is not None
        else F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets))
    )
    partial_exprs = []
    final_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{out}"))
            final_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{out}"))
            final_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r}")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*partial_exprs)
    )
    return partial.groupBy(*key_cols).agg(*final_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    fact_salt: Column | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: the manual salting fallback for when a hot
    join key overwhelms one reducer and the dim side is too big (or the
    join too deep) for a broadcast. AQE's skew-join split covers sort-merge
    joins it can measure; salting is the planner-independent answer and the
    pattern a 1000-executor job reaches for first.

        fact.join(dim, key)          hot key -> one straggler task
        salted                       fact rows get salt in [0, B); dim rows
                                     replicate B times (once per salt); the
                                     join key becomes (key, salt), so a hot
                                     key spreads over B reducers.

    Each fact row still matches each of its dim rows EXACTLY once (the dim
    copy with the row's own salt), so the result equals the unsalted join
    row-for-row — asserted by the oracle. Cost: |dim| x B extra replicated
    rows through the shuffle — use B ~ hot-key-multiplicity / average, not
    hundreds. ``fact_salt`` defaults to a deterministic per-row expression
    (replayable tests); any distribution works for correctness, uniform
    works best for balance."""
    salt = (
        fact_salt
        if fact_salt is not None
        else F.pmod(F.xxhash64(*fact.columns), F.lit(salt_buckets))
    )
    f = fact.withColumn("_salt", salt.cast("int"))
    d = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i).cast("int") for i in range(salt_buckets)])),
    )
    return f.join(d, [key, "_salt"]).drop("_salt")


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction
# ---------------------------------------------------------------------------

def bloom_build(dim: DataFrame, key_col: str, bits: int = 1024,
                k: int = 2) -> list[int]:
    """Build a ``bits``-bit bloom filter over a dim's join keys as
    ``bits/64`` BIGINT words (bit_or aggregation — one pass, mergeable,
    the filter is KBs however large the dim).  Returns the words as
    Python ints for literal-folding into the fact-side filter."""
    from .sketch import bucket_sql

    nwords = bits // 64
    key = f"CAST({key_col} AS STRING)"
    cells = dim.select(
        F.explode(F.array(*[
            F.expr(bucket_sql(key, i, bits)).alias("b") for i in range(k)
        ])).alias("bucket")
    ).select(
        (F.col("bucket") / 64).cast("int").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket % 64 AS INT))")
         .alias("mask"),
    )
    rows = cells.groupBy("word").agg(
        F.bit_or("mask").alias("bits")).collect()
    words = [0] * nwords
    for r in rows:
        words[int(r["word"])] = int(r["bits"])
    return words


def bloom_semi_reduce(fact: DataFrame, fact_key: str, dim: DataFrame,
                      dim_key: str, bits: int = 1024, k: int = 2):
    """Semi-join reduction: prefilter the FACT side with the dim's bloom
    filter before the actual join — the runtime-filter pattern (AQE's
    InSubqueryExec / Delta dynamic file pruning) made explicit, for
    engines/joins where AQE can't inject it.  At 100 TB this turns 'join
    then discard 95% of the fact' into 'scan-side prune then join'.

    No false negatives (every true match passes the bloom — pinned by
    test); false positives are eliminated by the real semi join that
    follows, so the RESULT equals the plain semi join exactly and the
    oracle is bloom-free.  Returns (reduced_join_df, filter_column) so
    callers can also measure the pruning rate."""
    from .sketch import bucket_sql

    words = bloom_build(dim, dim_key, bits=bits, k=k)
    lit_words = F.array(*[F.lit(w).cast("long") for w in words])
    key = f"CAST({fact_key} AS STRING)"
    cond = F.lit(True)
    for i in range(k):
        bucket = F.expr(bucket_sql(key, i, bits))
        word = F.element_at(lit_words, (bucket / 64).cast("int") + 1)
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT),"
            f" CAST({bucket_sql(key, i, bits)} % 64 AS INT))"
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    reduced = fact.filter(cond)
    return reduced.join(
        dim.select(F.col(dim_key).alias("_bk")).distinct(),
        F.col(fact_key) == F.col("_bk"),
        "left_semi",
    ), cond


# ---------------------------------------------------------------------------
# Join-key skew profiler (the diagnostic you run BEFORE choosing salting)
# ---------------------------------------------------------------------------

def skew_profile(df: DataFrame, key_col: str, n_top: int = 5) -> DataFrame:
    """Frequency profile of a join/agg key: one row per hot key (top
    ``n_top`` by count) plus a '__total__' summary row carrying the
    distinct-key count and the skew ratio (hottest / ceil-average)
    in ppm — the number that decides whether a key needs salting or AQE
    skew-join before a 100 TB run.

    Shape: ONE map-side-combined groupBy collapses the corpus to the
    distinct keys; the top-N and the summary aggregate over that keyed
    frame.  Exactness: counts are BIGINT; the skew ratio is one integral
    division floor(1e6 * max_cnt / ceil_avg) where
    ceil_avg = (total + n_keys - 1) div n_keys.
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # top-N via orderBy+limit = TakeOrderedAndProject (per-partition heap,
    # driver merge of N rows) — NOT a global row_number window, which would
    # funnel every distinct key through one task at scale; the rank window
    # then runs over the N-row result only
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(n_top)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("key", "cnt", "rank")
    )
    summary = counts.agg(
        F.lit("__total__").alias("key"),
        F.sum("cnt").cast("long").alias("cnt"),
        F.lit(0).cast("long").alias("rank"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_cnt"),
    ).select(
        "key", "cnt", "rank", "n_keys",
        F.expr(
            "CAST((max_cnt * 1000000) div ((cnt + n_keys - 1) div n_keys)"
            " AS BIGINT)"
        ).alias("skew_ppm"),
    )
    return top.select(
        "key", "cnt", "rank",
        F.lit(0).cast("long").alias("n_keys"),
        F.lit(0).cast("long").alias("skew_ppm"),
    ).unionByName(summary)


def SKEW_PROFILE_SQL(select_sql: str, key_expr: str, n_top: int = 5) -> str:
    return f"""
WITH counts AS (
  SELECT CAST({key_expr} AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS cnt
  FROM ({select_sql}) GROUP BY 1
),
top AS (
  SELECT key, cnt, rank, CAST(0 AS BIGINT) AS n_keys,
         CAST(0 AS BIGINT) AS skew_ppm
  FROM (SELECT key, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, key ASC) AS BIGINT)
                 AS rank
        FROM counts)
  WHERE rank <= {n_top}
),
summary AS (
  SELECT '__total__' AS key, CAST(sum(cnt) AS BIGINT) AS cnt,
         CAST(0 AS BIGINT) AS rank,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST((max(cnt) * 1000000)
              // ((sum(cnt) + count(*) - 1) // count(*)) AS BIGINT)
           AS skew_ppm
  FROM counts
)
SELECT * FROM top UNION ALL SELECT * FROM summary
"""


# ---------------------------------------------------------------------------
# Bloom semi-join pruning-rate ledger
# ---------------------------------------------------------------------------

def bloom_pruning_report(fact: DataFrame, fact_key: str, dim: DataFrame,
                         dim_key: str, bits: int = 4096,
                         k: int = 2) -> DataFrame:
    """The measurement bloom_semi_reduce promises its callers (review
    r12 depth): ONE row quantifying what the dim's bloom filter buys on
    this fact —

        (n_fact, n_pass_bloom, n_true_match, n_false_pos)

    with n_pass_bloom the fact rows the bits admit, n_true_match the
    exact semi-join survivors, n_false_pos the admitted non-members the
    real join still has to discard.  n_false_pos / (n_pass_bloom) read
    against n_fact is the sizing decision: a saturated filter (pass ~
    fact) says raise ``bits``; a tiny false-positive count says the
    scan-side prune is paying for itself.  No false negatives by
    construction (every true match passes — the bloom_semi_reduce
    guarantee, re-asserted here since n_true_match counts matches
    independent of the bits).

    Exactness/scale: the filter is built from the dim once (bits/64
    BIGINT words via bit_or — KBs whatever the dim size, the same
    collect bloom_build allowlists); the fact pass is ONE scan with
    row-local bucket arithmetic + one broadcast membership join on the
    distinct dim keys; the SQL oracle reproduces the bit array as the
    SET of occupied buckets (same md5 bucket_sql text on both
    engines), which is definitionally the same membership test."""
    from .sketch import bucket_sql

    words = bloom_build(dim, dim_key, bits=bits, k=k)
    lit_words = F.array(*[F.lit(w).cast("long") for w in words])
    key = f"CAST({fact_key} AS STRING)"
    cond = F.lit(True)
    for i in range(k):
        bucket = F.expr(bucket_sql(key, i, bits))
        word = F.element_at(lit_words, (bucket / 64).cast("int") + 1)
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT),"
            f" CAST({bucket_sql(key, i, bits)} % 64 AS INT))"
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    dk = dim.select(F.col(dim_key).alias("_dk")).distinct().withColumn(
        "_m", F.lit(1))
    flagged = (
        fact.select(F.col(fact_key).alias("_fk"), cond.alias("_pass"))
        .join(F.broadcast(dk), F.col("_fk") == F.col("_dk"), "left")
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_fact"),
        F.sum(F.col("_pass").cast("long")).cast("long")
        .alias("n_pass_bloom"),
        F.sum(F.coalesce("_m", F.lit(0))).cast("long")
        .alias("n_true_match"),
        F.sum((F.col("_pass") & F.col("_m").isNull()).cast("long"))
        .cast("long").alias("n_false_pos"),
    )


def BLOOM_PRUNING_SQL(fact_table: str, fact_key: str, dim_sql: str,
                      dim_key: str, bits: int = 4096, k: int = 2) -> str:
    """Oracle for bloom_pruning_report: the bit array re-expressed as
    the SET of occupied buckets — identical membership semantics,
    engine-portable (md5 bucket_sql, no bit words needed)."""
    from .sketch import bucket_sql

    key = f"CAST({fact_key} AS STRING)"
    dkey = f"CAST(dk AS STRING)"
    cells = " UNION ALL ".join(
        f"SELECT {bucket_sql(dkey, i, bits)} AS b FROM dimkeys"
        for i in range(k)
    )
    passes = " AND ".join(
        f"{bucket_sql(key, i, bits)} IN (SELECT b FROM bitset)"
        for i in range(k)
    )
    return f"""
WITH dimkeys AS (SELECT DISTINCT {dim_key} AS dk FROM ({dim_sql})),
bitset AS (SELECT DISTINCT b FROM ({cells})),
probe AS (
  SELECT CASE WHEN {passes} THEN 1 ELSE 0 END AS pass,
         CASE WHEN {fact_key} IN (SELECT dk FROM dimkeys)
              THEN 1 ELSE 0 END AS m
  FROM {fact_table}
)
SELECT CAST(count(*) AS BIGINT) AS n_fact,
       CAST(sum(pass) AS BIGINT) AS n_pass_bloom,
       CAST(sum(m) AS BIGINT) AS n_true_match,
       CAST(sum(CASE WHEN pass = 1 AND m = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos
FROM probe
"""
