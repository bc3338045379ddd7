"""Preference-data and annotation-agreement operators (RLHF data prep).

A modern training-data pipeline feeds not just pretraining corpora but
preference datasets: pairwise comparisons for reward models (fit with
Bradley-Terry, the canonical pairwise-preference likelihood) and
multi-annotator label sets whose reliability is screened with
inter-annotator agreement (Cohen's kappa).  Both are pure keyed
aggregations over pair/contingency frames, so they belong in the engine
next to the evaluation suite.

Plants (the operators/pii.py discipline — the synthetic tables carry no
preference pairs or annotator columns):

* Matches: each order is one comparison between players
  p1 = o_custkey % 16 and p2 = (o_custkey div 16 + o_orderkey) % 16
  (self-matches dropped).  Skill(p) = (p*7 + 3) % 16; the higher-skill
  player wins unless o_orderkey % 5 = 0 (a deterministic 20% upset
  rate), ties in skill go to the LOWER player id.  Real skill signal +
  real noise — the MM round has something to recover.
* Annotators: a1 = n_chars % 3 and a2 = a1 shifted on every 5th doc —
  a deterministic 80%-agreement pair over a real data column.

Exactness: counts are BIGINT; rates are floor-ppm divisions; the one
possibly-negative division (kappa's (po-pe)/(1-pe)) rides the shared
floor text from the engine-gotchas list.  Envelopes documented per
operator.

Scale: the BT pair matrix is |players|^2-sparse and keyed — at millions
of players it is a keyed shuffle like any join; per-player statistics
are one groupBy.  Kappa is a |classes|^2 contingency aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLAYERS = 16


def _fdiv(num: str, den: str) -> str:
    # possibly-negative exact integer division — engine-gotchas floor text
    return (f"CAST(floor(CAST({num} AS DOUBLE)"
            f" / CAST({den} AS DOUBLE)) AS BIGINT)")


# shared match plant (Spark div / DuckDB // both truncate on the
# non-negative operands here)
def _matches(orders: DataFrame) -> DataFrame:
    m = orders.select(
        F.expr(f"o_custkey % {N_PLAYERS}").cast("long").alias("p1"),
        F.expr(f"(o_custkey div 16 + o_orderkey) % {N_PLAYERS}")
        .cast("long").alias("p2"),
        F.col("o_orderkey"),
    ).where("p1 != p2")
    skill = "((%s * 7 + 3) %% 16)"
    fav = (f"CASE WHEN {skill % 'p1'} > {skill % 'p2'} THEN p1"
           f" WHEN {skill % 'p2'} > {skill % 'p1'} THEN p2"
           " ELSE least(p1, p2) END")
    dog = f"CASE WHEN ({fav}) = p1 THEN p2 ELSE p1 END"
    return m.select(
        "p1", "p2",
        F.expr(f"CASE WHEN o_orderkey % 5 = 0 THEN {dog}"
               f" ELSE {fav} END").cast("long").alias("winner"),
    )


def _MATCHES_SQL(table: str = "orders") -> str:
    skill = "((%s * 7 + 3) %% 16)"
    fav = (f"CASE WHEN {skill % 'p1'} > {skill % 'p2'} THEN p1"
           f" WHEN {skill % 'p2'} > {skill % 'p1'} THEN p2"
           " ELSE least(p1, p2) END")
    dog = f"CASE WHEN ({fav}) = p1 THEN p2 ELSE p1 END"
    return f"""
SELECT p1, p2,
       CAST(CASE WHEN o_orderkey % 5 = 0 THEN {dog}
            ELSE {fav} END AS BIGINT) AS winner
FROM (
  SELECT CAST(o_custkey % {N_PLAYERS} AS BIGINT) AS p1,
         CAST((o_custkey // 16 + o_orderkey) % {N_PLAYERS} AS BIGINT)
           AS p2,
         o_orderkey
  FROM {table}
) WHERE p1 != p2
"""


def _bt_rounds(orders: DataFrame, rounds: int,
               cache_out: list | None = None) -> DataFrame:
    """Shared Bradley-Terry MM core (Hunter 2004) — ``rounds`` exact
    minorization-maximization iterations from the smoothed-win-rate
    init:

      w0_i   = (W_i + 1) * 1e6 div (N_i + 2)
      D_i(w) = Σ_j n_ij * 1e12 div (w_i + w_j)   (the MM denominator)
      w_next = W_i * 1e12 div D_i(w)

    Returns (player, n_matches, n_wins, w{r-1}_ppm, w{r}_ppm) — the
    last two strength vectors, which is what both the one-round and
    two-round contract queries report.  Strengths are scale-free per
    iteration, so they stay unnormalized.

    Exactness: pure positive-integer div end to end.  Envelope:
    n_ij * 1e12 and W_i * 1e12 stay int64-exact through 9.2e6 matches
    per pair / wins per player (sf0.1: ~1e4); past that, downscale the
    1e12 to 1e9 with no other change (ONE constant, shared by every
    round on both engines).

    Scale: the raw match stream collapses to the unordered pair matrix
    FIRST (one groupBy with map-side combine) and the pair matrix
    persists — every round's denominator folds the same
    |players|^2-sparse cached frame with two keyed joins, and the
    corpus is scanned once however many rounds run.  ``cache_out``
    collects the persisted handle for sweep callers."""
    assert rounds >= 1
    mt = _matches(orders)
    pairs = mt.select(
        F.least("p1", "p2").alias("a"),
        F.greatest("p1", "p2").alias("b"),
        F.col("winner"),
    ).groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_ab"),
        F.sum(F.when(F.col("winner") == F.col("a"), 1).otherwise(0))
        .cast("long").alias("wins_a"),
    ).persist()
    if cache_out is not None:
        cache_out.append(pairs)
    # r12-opt (the dendrogram eager-leaf lesson, guide §2.1): a lazy
    # persist re-embeds the whole corpus-scan lineage in every
    # consumer's analyzed plan — the two-round denominator chain
    # referenced it 5x (35 scan nodes in the printed plan).  The eager
    # localCheckpoint cuts it to one RDD leaf (materialized once, the
    # same job that fills the cache_out handle); every round then
    # plans against the |players|^2-sparse leaf only.
    pairs = pairs.localCheckpoint(eager=True)
    directed = pairs.select(
        F.col("a").alias("i"), F.col("b").alias("j"),
        F.col("n_ab").alias("n_ij"), F.col("wins_a").alias("wins_i"),
    ).unionByName(pairs.select(
        F.col("b").alias("i"), F.col("a").alias("j"),
        F.col("n_ab").alias("n_ij"),
        (F.col("n_ab") - F.col("wins_a")).alias("wins_i"),
    ))
    per = directed.groupBy("i").agg(
        F.sum("n_ij").cast("long").alias("n_matches"),
        F.sum("wins_i").cast("long").alias("n_wins"),
    ).select(
        "i", "n_matches", "n_wins",
        F.expr("(n_wins + 1) * 1000000 div (n_matches + 2)")
        .cast("long").alias("w_ppm"),
    )

    def mm_round(cur: DataFrame) -> DataFrame:
        wj = cur.select(F.col("i").alias("j"), F.col("w_ppm").alias("w_j"))
        denom = (
            directed.join(cur.select("i", "w_ppm"), "i")
            .join(wj, "j")
            .groupBy("i")
            .agg(F.sum(F.expr("n_ij * 1000000000000 div (w_ppm + w_j)"))
                 .cast("long").alias("d_i"))
        )
        return cur.select("i", "n_matches", "n_wins").join(denom, "i") \
            .select("i", "n_matches", "n_wins",
                    F.expr("n_wins * 1000000000000 div d_i").cast("long")
                    .alias("w_ppm"))

    hist = [per]
    for _ in range(rounds):
        hist.append(mm_round(hist[-1]))
    prev, last = hist[-2], hist[-1]
    return (
        prev.select("i", F.col("w_ppm").alias(f"w{rounds - 1}_ppm"))
        .join(last.select("i", "n_matches", "n_wins",
                          F.col("w_ppm").alias(f"w{rounds}_ppm")), "i")
        .select(F.col("i").alias("player"), "n_matches", "n_wins",
                f"w{rounds - 1}_ppm", f"w{rounds}_ppm")
    )


def bradley_terry_round(orders: DataFrame,
                        cache_out: list | None = None) -> DataFrame:
    """One exact Bradley-Terry MM round: (player, n_matches, n_wins,
    w0_ppm, w1_ppm).  See _bt_rounds for the math, envelope, and the
    persisted-pair-matrix scale shape."""
    return _bt_rounds(orders, rounds=1, cache_out=cache_out)


def bradley_terry_two_rounds(orders: DataFrame,
                             cache_out: list | None = None) -> DataFrame:
    """TWO exact Bradley-Terry MM rounds — round 2's denominator
    factor-joins the ROUND-1 strengths back onto the persisted pair
    matrix (the plsa_two_rounds discipline): (player, n_matches,
    n_wins, w1_ppm, w2_ppm).  See _bt_rounds."""
    return _bt_rounds(orders, rounds=2, cache_out=cache_out)


def _BT_ROUNDS_SQL(rounds: int, table: str) -> str:
    """Shared oracle builder: the same CTE chain for any round count —
    one text, so the Spark/SQL pair cannot drift between the one-round
    and two-round contract queries."""
    assert rounds >= 1
    ctes = [f"mt AS ({_MATCHES_SQL(table)})", """pairs AS (
  SELECT least(p1, p2) AS a, greatest(p1, p2) AS b,
         CAST(count(*) AS BIGINT) AS n_ab,
         CAST(sum(CASE WHEN winner = least(p1, p2) THEN 1 ELSE 0 END)
              AS BIGINT) AS wins_a
  FROM mt GROUP BY 1, 2
)""", """directed AS (
  SELECT a AS i, b AS j, n_ab AS n_ij, wins_a AS wins_i FROM pairs
  UNION ALL
  SELECT b AS i, a AS j, n_ab AS n_ij, n_ab - wins_a AS wins_i FROM pairs
)""", """r0 AS (
  SELECT i, CAST(sum(n_ij) AS BIGINT) AS n_matches,
         CAST(sum(wins_i) AS BIGINT) AS n_wins,
         CAST((sum(wins_i) + 1) * 1000000 // (sum(n_ij) + 2) AS BIGINT)
           AS w_ppm
  FROM directed GROUP BY 1
)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""d{r} AS (
  SELECT d.i,
         CAST(sum(d.n_ij * 1000000000000 // (pi.w_ppm + pj.w_ppm))
              AS BIGINT) AS d_i
  FROM directed d
  JOIN r{r - 1} pi ON pi.i = d.i
  JOIN r{r - 1} pj ON pj.i = d.j
  GROUP BY 1
)""")
        ctes.append(f"""r{r} AS (
  SELECT p.i, p.n_matches, p.n_wins,
         CAST(p.n_wins * 1000000000000 // d{r}.d_i AS BIGINT) AS w_ppm
  FROM r{r - 1} p JOIN d{r} ON d{r}.i = p.i
)""")
    return f"""
WITH {', '.join(ctes)}
SELECT last.i AS player, last.n_matches, last.n_wins,
       prev.w_ppm AS w{rounds - 1}_ppm,
       last.w_ppm AS w{rounds}_ppm
FROM r{rounds} last JOIN r{rounds - 1} prev ON prev.i = last.i
"""


def BRADLEY_TERRY_SQL(table: str = "orders") -> str:
    return _BT_ROUNDS_SQL(1, table)


def BRADLEY_TERRY_TWO_SQL(table: str = "orders") -> str:
    return _BT_ROUNDS_SQL(2, table)


def cohens_kappa(docs: DataFrame,
                 cache_out: list | None = None) -> DataFrame:
    """Cohen's kappa between the two planted annotators: one row
    (n, n_agree, po_ppm, pe_ppm, kappa_ppm).

    po and the per-class marginal shares are floor-ppm; pe is the
    quantize-then-sum of per-class (share1 * share2) products (each
    term <= 1e6, summed exactly); kappa's possibly-negative numerator
    rides the shared floor text.  The whole statistic reduces from ONE
    |classes|^2 contingency groupBy — at 100 TB that is a 9-row frame
    after the map-side combine."""
    lab = docs.select(
        F.expr("n_chars % 3").cast("long").alias("a1"),
        F.expr("CASE WHEN doc_id % 5 = 0 THEN (n_chars + 1) % 3"
               " ELSE n_chars % 3 END").cast("long").alias("a2"),
    )
    # the |classes|^2 contingency persists (one bounded entry referenced
    # by the lazy output — the accepted single-shot pattern): four
    # consumers (both marginals, totals, pe) otherwise each re-run the
    # corpus scan
    cont = lab.groupBy("a1", "a2").agg(
        F.count(F.lit(1)).cast("long").alias("c")).persist()
    if cache_out is not None:
        cache_out.append(cont)
    # marginals as proper per-class frames (a diagonal-cell shortcut
    # would silently drop any class that never self-agrees), full-outer
    # joined so a class one annotator never uses still contributes its
    # zero term exactly
    m1 = cont.groupBy(F.col("a1").alias("k")).agg(
        F.sum("c").cast("long").alias("n1"))
    m2 = cont.groupBy(F.col("a2").alias("k")).agg(
        F.sum("c").cast("long").alias("n2"))
    marg = m1.join(m2, "k", "full_outer").select(
        "k",
        F.coalesce("n1", F.lit(0)).cast("long").alias("n1"),
        F.coalesce("n2", F.lit(0)).cast("long").alias("n2"),
    )
    tot = cont.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("a1") == F.col("a2"), F.col("c"))
              .otherwise(0)).cast("long").alias("n_agree"),
    )
    pe = marg.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.expr("(n1 * 1000000 div n) * (n2 * 1000000 div n)"
                     " div 1000000")).cast("long").alias("pe_ppm"))
    return tot.crossJoin(F.broadcast(pe)).select(
        F.col("n").cast("long").alias("n"),
        "n_agree",
        F.expr("n_agree * 1000000 div n").cast("long").alias("po_ppm"),
        "pe_ppm",
        F.expr(_fdiv("(n_agree * 1000000 div n - pe_ppm) * 1000000",
                     "1000000 - pe_ppm")).alias("kappa_ppm"),
    )


def COHENS_KAPPA_SQL(table: str = "documents") -> str:
    return f"""
WITH lab AS (
  SELECT CAST(n_chars % 3 AS BIGINT) AS a1,
         CAST(CASE WHEN doc_id % 5 = 0 THEN (n_chars + 1) % 3
              ELSE n_chars % 3 END AS BIGINT) AS a2
  FROM {table}
),
cont AS (
  SELECT a1, a2, CAST(count(*) AS BIGINT) AS c FROM lab GROUP BY 1, 2
),
m1 AS (SELECT a1 AS k, CAST(sum(c) AS BIGINT) AS n1 FROM cont GROUP BY 1),
m2 AS (SELECT a2 AS k, CAST(sum(c) AS BIGINT) AS n2 FROM cont GROUP BY 1),
marg AS (
  SELECT coalesce(m1.k, m2.k) AS k,
         coalesce(n1, 0) AS n1, coalesce(n2, 0) AS n2
  FROM m1 FULL OUTER JOIN m2 ON m1.k = m2.k
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a1 = a2 THEN c ELSE 0 END) AS BIGINT)
           AS n_agree
  FROM cont
),
pe AS (
  SELECT CAST(sum((n1 * 1000000 // n) * (n2 * 1000000 // n) // 1000000)
              AS BIGINT) AS pe_ppm
  FROM marg CROSS JOIN tot
)
SELECT n, n_agree,
       CAST(n_agree * 1000000 // n AS BIGINT) AS po_ppm,
       pe_ppm,
       {_fdiv('(n_agree * 1000000 // n - pe_ppm) * 1000000',
              '1000000 - pe_ppm')} AS kappa_ppm
FROM tot CROSS JOIN pe
"""


N_BON = (1, 2, 4, 8)


def best_of_n_curve(docs: DataFrame) -> DataFrame:
    """Best-of-n selection curve (the BoN / rejection-sampling yield
    analysis of RLHF data prep): if each (lang, source) cell is a
    prompt and its documents — in doc_id order, the deterministic
    "generation order" — are candidate completions scored by a reward
    proxy, how does the mean selected reward grow with the candidate
    budget n?  The curve's flattening point is the standard answer to
    "how many samples per prompt are worth paying for".

    Reward proxy: the type-token ratio in floor-ppm (distinct / total
    whitespace tokens — a real, deterministic text-quality signal; 0
    for an empty candidate).  best(n) = max proxy among the first
    min(n, group size) candidates, exactly what max-over-rn<=n gives.

    Output: one row per n in {1,2,4,8} — (n, n_groups, sum_best_ppm,
    mean_best_ppm), mean as exact floor division of BIGINT sums.

    Scale: row-local scoring, ONE (lang, source)-keyed window for the
    candidate rank (group-bounded frames, never global), one groupBy
    per cell, then a |cells|-scale 4-way stack + rollup.  No joins."""
    return best_of_n_from_candidates(bon_scored(docs))


def bon_scored(docs: DataFrame) -> DataFrame:
    """(lang, source, doc_id, s): the scored candidate pool.  Because
    best(n) depends only on each cell's max(N_BON) SMALLEST doc_ids,
    the streaming twin's state is this frame truncated to the first 8
    per cell — a BOUNDED keyed top-k that folds by union + re-rank,
    exact under any arrival order."""
    from .dedup import tokens_col

    return docs.select(
        "lang", "source", "doc_id", tokens_col("text").alias("_toks")
    ).select(
        "lang", "source", "doc_id",
        F.expr("CASE WHEN size(_toks) = 0 THEN CAST(0 AS BIGINT)"
               " ELSE CAST(size(array_distinct(_toks)) * 1000000"
               " div size(_toks) AS BIGINT) END").alias("s"),
    )


def bon_truncate(cand: DataFrame, keep: int = 8) -> DataFrame:
    """First ``keep`` candidates per cell in doc_id order — the
    streaming twin's fold step (state rows <= 8 per (lang, source))."""
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    return cand.select(
        "lang", "source", "doc_id", "s",
        F.row_number().over(w).alias("_rn"),
    ).where(f"_rn <= {keep}").drop("_rn")


def best_of_n_from_candidates(cand: DataFrame) -> DataFrame:
    """The BoN report from a (lang, source, doc_id, s) candidate frame."""
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    rn = cand.select(
        "lang", "source", "s", F.row_number().over(w).alias("rn"))
    grp = rn.groupBy("lang", "source").agg(*[
        F.max(F.when(F.col("rn") <= n, F.col("s"))).cast("long")
        .alias(f"b{n}") for n in N_BON])
    stacked = grp.select(F.expr(
        "stack({k}, {cells}) AS (n, best)".format(
            k=len(N_BON),
            cells=", ".join(f"CAST({n} AS BIGINT), b{n}" for n in N_BON))))
    return stacked.groupBy("n").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("best").cast("long").alias("sum_best_ppm"),
    ).select(
        "n", "n_groups", "sum_best_ppm",
        F.expr("sum_best_ppm div n_groups").cast("long")
        .alias("mean_best_ppm"),
    )


def BEST_OF_N_SQL(table: str = "documents") -> str:
    from .dedup import TOKENS_SQL

    # HAVING keeps the empty-corpus shape identical to the Spark twin
    # (an ungrouped aggregate emits one row even over zero input; the
    # Spark side groups by n and emits none)
    branches = "\n  UNION ALL\n".join(
        f"  SELECT CAST({n} AS BIGINT) AS n,"
        f" CAST(count(*) AS BIGINT) AS n_groups,"
        f" CAST(sum(b{n}) AS BIGINT) AS sum_best_ppm FROM grp"
        f" HAVING count(*) > 0"
        for n in N_BON)
    bcols = ",\n         ".join(
        f"CAST(max(CASE WHEN rn <= {n} THEN s END) AS BIGINT) AS b{n}"
        for n in N_BON)
    return f"""
WITH toks AS (
  SELECT lang, source, doc_id, {TOKENS_SQL('text')} AS t FROM {table}
),
scored AS (
  SELECT lang, source, doc_id,
         CASE WHEN len(t) = 0 THEN CAST(0 AS BIGINT)
         ELSE CAST(len(list_distinct(t)) * 1000000 // len(t) AS BIGINT)
         END AS s
  FROM toks
),
rn AS (
  SELECT lang, source, s,
         row_number() OVER (PARTITION BY lang, source ORDER BY doc_id)
           AS rn
  FROM scored
),
grp AS (
  SELECT lang, source,
         {bcols}
  FROM rn GROUP BY 1, 2
),
stacked AS (
{branches}
)
SELECT n, n_groups, sum_best_ppm,
       CAST(sum_best_ppm // n_groups AS BIGINT) AS mean_best_ppm
FROM stacked
"""
