"""Corpus-preparation operators for LLM training-data pipelines.

Beyond-reference surface (same charter as operators/dedup.py): the three
ops every large-scale pretraining pipeline runs between raw documents and
tokenized shards — chunking, quality filtering, and stratified sampling —
expressed as pure Catalyst plans with exact DuckDB oracles.

Scale design:

* chunk_documents    one projection + one explode: rows out = Σ n_chunks,
                     no shuffle at all (chunking is embarrassingly
                     parallel); the token array materializes ONCE per doc
                     in its own projection (array-lambda re-evaluation
                     trap, see NOTES_r1).
* corpus_clean       dedup keeper-join is the only shuffle (hash-groupBy on
                     md5); language/quality gates are scan-side column
                     predicates that pushdown keeps next to the parquet
                     reader.
* stratified_sample  ZERO shuffle: the keep/drop decision is a pure
                     function of md5(group|id) compared against a hex
                     threshold — per-group rates hold by hash uniformity,
                     no per-group counting pass. The same row set is
                     selected on any engine (md5 + lexicographic compare
                     are engine-identical; no floats anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import TOKENS_SQL, tokens_col


# ---------------------------------------------------------------------------
# Token-window chunking
# ---------------------------------------------------------------------------

def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding token-window chunks: starts at 0, stride = chunk_size-overlap,
    last window may be short; a doc shorter than the stride yields one
    chunk. Output: doc_id, chunk_idx, chunk_start, n_chunk_tokens,
    chunk_hash (md5 of the space-joined window — stable identity for
    downstream dedup/sharding)."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    toked = docs.select(
        F.col(id_col), tokens_col(text_col).alias("toks")
    ).withColumn("n_tokens", F.size("toks")).filter(F.col("n_tokens") > 0)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_tokens") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    exploded = toked.select(
        id_col, "toks", "n_tokens",
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    )
    window = F.slice(F.col("toks"), F.col("chunk_start") + 1, chunk_size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(window).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(window, " ")).alias("chunk_hash"),
    )


def CHUNK_SQL(
    chunk_size: int = 64,
    overlap: int = 16,
    table: str = "documents",
    text_expr: str = "text",
    id_col: str = "doc_id",
) -> str:
    stride = chunk_size - overlap
    return f"""
WITH toked AS (
  SELECT {id_col}, {TOKENS_SQL(text_expr)} AS toks,
         CAST(len({TOKENS_SQL(text_expr)}) AS BIGINT) AS n_tokens
  FROM {table}
),
starts AS (
  SELECT {id_col}, toks, n_tokens,
         generate_subscripts(range(0, greatest(n_tokens - {overlap} - 1, 0) + 1, {stride}), 1) - 1 AS chunk_idx,
         unnest(range(0, greatest(n_tokens - {overlap} - 1, 0) + 1, {stride})) AS chunk_start
  FROM toked WHERE n_tokens > 0
)
SELECT {id_col},
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_start AS BIGINT) AS chunk_start,
       CAST(len(list_slice(toks, chunk_start + 1, chunk_start + {chunk_size})) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, chunk_start + 1, chunk_start + {chunk_size}), ' ')) AS chunk_hash
FROM starts
"""


# ---------------------------------------------------------------------------
# Composed cleaning pipeline: dedup keeper ∧ language ∧ quality gates
# ---------------------------------------------------------------------------

def corpus_clean(
    docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 5,
    min_stopword_ratio_num: int = 1,
    min_stopword_ratio_den: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The standard pretraining filter chain in ONE plan: exact-dup keeper
    (min id per md5(text)), heuristic language gate, token-count and
    stopword-ratio quality gates (integer cross-multiplication — no float
    thresholds). Returns kept doc ids + the gate metrics."""
    from ..functions.text import STOPWORDS, lang_scores

    toks = tokens_col(text_col)
    en = STOPWORDS[lang]
    base = docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("text_hash"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: t.isin(en))).cast("long").alias("n_stop"),
    )
    keepers = (
        base.groupBy("text_hash").agg(F.min(id_col).alias("keeper_id"))
    )
    langs = lang_scores(docs, text_col, id_col).select(id_col, "lang_pred")
    return (
        base.join(keepers, "text_hash")
        .filter(F.col(id_col) == F.col("keeper_id"))
        .join(langs, id_col)
        .filter(
            (F.col("lang_pred") == lang)
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("n_stop") * min_stopword_ratio_den
               >= F.col("n_tokens") * min_stopword_ratio_num)
        )
        .select(id_col, "n_tokens", "n_stop", "lang_pred")
    )


def CORPUS_CLEAN_SQL(
    lang: str = "en",
    min_tokens: int = 5,
    min_stopword_ratio_num: int = 1,
    min_stopword_ratio_den: int = 20,
    table: str = "documents",
    text_expr: str = "text",
    id_col: str = "doc_id",
) -> str:
    from ..functions.text import STOPWORDS, lang_scores_sql

    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"""
WITH base AS (
  SELECT {id_col}, md5({text_expr}) AS text_hash,
         CAST(len({TOKENS_SQL(text_expr)}) AS BIGINT) AS n_tokens,
         CAST(len(list_filter({TOKENS_SQL(text_expr)}, t -> t IN ({words}))) AS BIGINT) AS n_stop
  FROM {table}
),
keepers AS (
  SELECT text_hash, min({id_col}) AS keeper_id FROM base GROUP BY text_hash
),
langs AS ({lang_scores_sql(table, text_expr, id_col)})
SELECT b.{id_col}, b.n_tokens, b.n_stop, l.lang_pred
FROM base b
JOIN keepers k ON b.text_hash = k.text_hash AND b.{id_col} = k.keeper_id
JOIN langs l ON l.{id_col} = b.{id_col}
WHERE l.lang_pred = '{lang}'
  AND b.n_tokens >= {min_tokens}
  AND b.n_stop * {min_stopword_ratio_den} >= b.n_tokens * {min_stopword_ratio_num}
"""


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

def stratified_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    rate_num: int = 64,
    rate_den: int = 256,
) -> DataFrame:
    """Keep ~rate_num/rate_den of the rows of EVERY group, deterministically:
    a row stays iff the first two hex chars of md5(group|id) fall below the
    threshold — a pure row-local predicate (no shuffle, no RNG state, no
    per-group pass), reproducible bit-for-bit on any engine and any
    partitioning. rate granularity is 1/256."""
    if not (0 < rate_num <= rate_den == 256):
        raise ValueError("rate must be num/256 with 0 < num <= 256")
    thr = format(rate_num, "02x")
    key = F.md5(F.concat_ws("|", F.col(group_col).cast("string"),
                            F.col(id_col).cast("string")))
    return df.filter(F.substring(key, 1, 2) < F.lit(thr))


def STRATIFIED_SAMPLE_SQL(
    inner_sql: str,
    group_col: str,
    id_col: str,
    rate_num: int = 64,
    rate_den: int = 256,
) -> str:
    thr = format(rate_num, "02x")
    return f"""
SELECT * FROM ({inner_sql})
WHERE substring(md5(concat(CAST({group_col} AS VARCHAR), '|',
                           CAST({id_col} AS VARCHAR))), 1, 2) < '{thr}'
"""


def sequence_packing(docs: DataFrame, budget: int = 512,
                     text_col: str = "text", id_col: str = "doc_id",
                     shard_col: str | None = None) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences
    (prefix-sum binning): docs in deterministic id order are assigned to
    bin floor(tokens_before / budget) — the standard approximate packing
    for pretraining shards (documents never split; a bin may overshoot by
    at most one doc, which the trainer's truncation absorbs).

    This shape is chosen over exact first-fit because a reset-on-overflow
    running sum is inherently sequential; prefix-sum binning is ONE window
    cumsum + ONE groupBy — both keyed shuffles — and gives within-2x-of-
    optimal occupancy for doc << budget.

    ``shard_col`` (e.g. ``lang`` or ``source``) partitions the cumsum so no
    single-partition global window exists — the 100 TB shape, and what real
    packing wants anyway (shards are per-domain/per-language). Bin ids are
    then (shard, local bin). ``shard_col=None`` keeps the single global
    sequence for small corpora.
    """
    from pyspark.sql import Window

    cols = [F.col(id_col)] + ([F.col(shard_col)] if shard_col else [])
    toks = docs.select(
        *cols,
        F.size(F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                        lambda t: t != F.lit(""))).cast("long").alias("n_tokens"),
    )
    w = (Window.partitionBy(shard_col) if shard_col else Window.partitionBy())
    w = w.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    binned = toks.withColumn(
        "tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).withColumn(
        "bin_id", F.floor(F.col("tokens_before") / F.lit(budget)).cast("long")
    )
    keys = ([shard_col] if shard_col else []) + ["bin_id"]
    return binned.groupBy(*keys).agg(
        F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


def SEQUENCE_PACKING_SQL(budget: int = 512, table: str = "documents",
                         text_expr: str = "text", id_col: str = "doc_id",
                         shard_col: str | None = None) -> str:
    toks = (f"list_filter(regexp_split_to_array(lower({text_expr}), '\\s+'), "
            "t -> t != '')")
    shard_sel = f"{shard_col}, " if shard_col else ""
    part = f"PARTITION BY {shard_col} " if shard_col else ""
    group = f"{shard_col}, bin_id" if shard_col else "bin_id"
    return f"""
WITH t AS (
  SELECT {shard_sel}{id_col}, CAST(len({toks}) AS BIGINT) AS n_tokens FROM {table}
),
b AS (
  SELECT {shard_sel}{id_col}, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER ({part}ORDER BY {id_col}
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tokens_before
  FROM t
)
SELECT {shard_sel}CAST(floor(tokens_before / {budget}.0) AS BIGINT) AS bin_id,
       list_sort(list({id_col})) AS doc_ids,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM b GROUP BY {group}
"""


def SEQUENCE_PACKING_FLAT_SQL(budget: int = 512, table: str = "documents",
                              text_expr: str = "text", id_col: str = "doc_id",
                              shard_col: str | None = None) -> str:
    """Driver-canonicalizable twin of SEQUENCE_PACKING_SQL: the
    ``doc_ids`` array is unnested to one (shard, bin_id, doc_id) row per
    member, per-bin stats repeated per row — scalar cells only, so the
    driver's pandas sort canonicalizer can handle the result
    (VERDICT r5 item 1)."""
    inner = SEQUENCE_PACKING_SQL(budget=budget, table=table,
                                 text_expr=text_expr, id_col=id_col,
                                 shard_col=shard_col)
    shard_sel = f"{shard_col}, " if shard_col else ""
    return f"""
SELECT {shard_sel}bin_id, unnest(doc_ids) AS {id_col}, n_docs, total_tokens
FROM ({inner}) base
"""


def quantize_embeddings(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization per vector: q_i = round(127 * x_i /
    max|x|), carried with the double scale so dot products are
    reconstructable — the storage/bandwidth step before ANN serving
    (4x smaller vectors, SIMD-friendly int math). Zero shuffle: pure
    per-row column arithmetic; zero vectors quantize to all-zero with
    scale 0."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(
        mx > 0,
        F.transform(v, lambda x: F.round(x * 127.0 / mx, 0).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return emb.select(
        F.col(id_col).cast("long").alias(id_col),
        q.alias("qvec"),
        F.when(mx > 0, mx / 127.0).otherwise(F.lit(0.0)).alias("scale"),
    )


def QUANTIZE_EMBEDDINGS_SQL(table: str = "embeddings", id_col: str = "vec_id",
                            vec_col: str = "embedding") -> str:
    return f"""
WITH v AS (
  SELECT {id_col},
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS vec
  FROM {table}
),
m AS (
  SELECT {id_col}, vec,
         list_max(list_transform(vec, x -> abs(x))) AS mx
  FROM v
)
SELECT CAST({id_col} AS BIGINT) AS {id_col},
       CASE WHEN mx > 0
            THEN list_transform(vec, x -> CAST(round(x * 127.0 / mx, 0) AS INTEGER))
            ELSE list_transform(vec, x -> 0) END AS qvec,
       CASE WHEN mx > 0 THEN mx / 127.0 ELSE 0.0 END AS scale
FROM m
"""


def temperature_sample(docs: DataFrame, id_col: str = "doc_id",
                       source_col: str = "source") -> DataFrame:
    """Temperature-based domain mixing (alpha = 0.5): sample source s at a
    rate proportional to count(s)^alpha / count(s) — flattening the domain
    distribution toward uniform, the standard mixing step before
    pretraining (cf. multilingual sampling in public LM pipelines).

    Exactness: NO float appears anywhere. Per-source weight w_s =
    isqrt(n_s) (floor of the IEEE-exact sqrt — exact for n_s < 2^52),
    W = Σ w_s (integer), and the keep decision is the cross-multiplied
    integer comparison  u * W < w_s * 2^32  with u the first 8 md5 hex
    digits of the doc id as an integer — i.e. keep with probability
    w_s / W per source, bit-identical on any engine. Bounds: u < 2^32,
    so products stay in BIGINT while W < 2^31 and w_s < 2^31.

    Scale shape: ONE tiny per-source count aggregation broadcast back onto
    the corpus (sources are few); the keep predicate is row-local — the
    scan-side filter a 100 TB mixing pass needs. Output keeps every row
    with its verdict so downstream stages choose filter vs stratify.
    """
    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_s")
    ).withColumn("w", F.floor(F.sqrt(F.col("n_s"))).cast("long"))
    w_total = counts.agg(F.sum("w").cast("long").alias("w_total"))
    u = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10) \
         .cast("long")
    return (
        docs.join(F.broadcast(counts), source_col)
        .crossJoin(F.broadcast(w_total))
        .select(
            F.col(id_col).cast("long").alias(id_col),
            F.col(source_col),
            F.col("w"),
            F.col("w_total"),
            (u * F.col("w_total") < F.col("w") * F.lit(2 ** 32)).alias("kept"),
        )
    )


def TEMPERATURE_SAMPLE_SQL(table: str = "documents", id_col: str = "doc_id",
                           source_col: str = "source") -> str:
    return f"""
WITH counts AS (
  SELECT {source_col}, CAST(count(*) AS BIGINT) AS n_s,
         CAST(floor(sqrt(count(*))) AS BIGINT) AS w
  FROM {table} GROUP BY 1
),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS w_total FROM counts)
SELECT CAST(d.{id_col} AS BIGINT) AS {id_col}, d.{source_col}, c.w, t.w_total,
       (CAST(('0x' || substring(md5(CAST(d.{id_col} AS VARCHAR)), 1, 8))
             AS BIGINT) * t.w_total < c.w * 4294967296) AS kept
FROM {table} d JOIN counts c ON d.{source_col} = c.{source_col}, tot t
"""


def corpus_pipeline(docs: DataFrame, budget: int = 512,
                    text_col: str = "text", id_col: str = "doc_id",
                    source_col: str = "source",
                    shard_col: str = "lang") -> DataFrame:
    """The composed corpus-prep pipeline in ONE plan: clean (exact-dup
    keeper + language + quality gates) -> temperature domain mixing over
    the survivors -> sharded sequence packing of the sample. What an
    actual pretraining data job runs end-to-end — demonstrating that the
    stages compose into a single Catalyst plan (each stage is itself
    exact, so the composition carries an exact chained oracle).

    Shuffle ledger at 100 TB: clean = one md5 groupBy; mixing = one tiny
    per-source count + row-local predicate; packing = one per-shard window
    cumsum + one groupBy. Nothing quadratic, nothing driver-side.
    """
    kept = corpus_clean(docs, text_col=text_col, id_col=id_col).select(id_col)
    cleaned = docs.join(kept, id_col)
    sampled_ids = (
        temperature_sample(cleaned, id_col=id_col, source_col=source_col)
        .filter(F.col("kept"))
        .select(id_col)
    )
    final = docs.join(sampled_ids, id_col)
    return sequence_packing(
        final, budget=budget, text_col=text_col, id_col=id_col,
        shard_col=shard_col,
    )


def CORPUS_PIPELINE_SQL(budget: int = 512, table: str = "documents",
                        text_expr: str = "text", id_col: str = "doc_id",
                        source_col: str = "source",
                        shard_col: str = "lang") -> str:
    cleaned = (
        f"SELECT d.* FROM {table} d JOIN ({CORPUS_CLEAN_SQL(table=table, text_expr=text_expr, id_col=id_col)}) c "
        f"ON d.{id_col} = c.{id_col}"
    )
    sampled = (
        f"SELECT d.* FROM {table} d JOIN "
        f"({TEMPERATURE_SAMPLE_SQL(table=f'({cleaned})', id_col=id_col, source_col=source_col)}) s "
        f"ON d.{id_col} = s.{id_col} WHERE s.kept"
    )
    return SEQUENCE_PACKING_SQL(
        budget=budget, table=f"({sampled})", text_expr=text_expr,
        id_col=id_col, shard_col=shard_col,
    )


def shared_chunk_stats(docs: DataFrame, chunk_size: int = 64,
                       overlap: int = 16, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Cross-document chunk-level duplication stats — the line-level-dedup
    shape of CCNet/RefinedWeb applied to token-window chunks (the synthetic
    corpus has no newlines; swap chunker for a line splitter on real text):
    per doc, how many of its chunks also appear verbatim in OTHER docs.

    Output: (doc_id, n_chunks, n_shared) — n_shared counts chunk positions
    whose hash occurs in >= 2 distinct docs. Downstream policy (drop doc,
    drop chunks, keep) stays with the caller; the integer pair is the exact
    decision input.

    Scale shape: chunking is shuffle-free (one explode); the shared flag is
    a WINDOW over chunk_hash — "appears in >= 2 distinct docs" reduces to
    min(doc) != max(doc) within the hash partition, two constant-memory
    window aggregates (no collect_set, no self-join: the explode lineage is
    evaluated ONCE) — then one per-doc groupBy. Two keyed shuffles total;
    duplication is resolved through the hash partition, never doc x doc.
    """
    from pyspark.sql import Window

    ch = chunk_documents(docs, chunk_size=chunk_size, overlap=overlap,
                         text_col=text_col, id_col=id_col)
    w = Window.partitionBy("chunk_hash")
    flagged = ch.withColumn(
        "_shared",
        (F.min(id_col).over(w) != F.max(id_col).over(w)).cast("long"),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("_shared").cast("long").alias("n_shared"),
        )
        .select(F.col(id_col).cast("long").alias(id_col), "n_chunks", "n_shared")
    )


def SHARED_CHUNK_SQL(chunk_size: int = 64, overlap: int = 16,
                     table: str = "documents", text_expr: str = "text",
                     id_col: str = "doc_id") -> str:
    return f"""
WITH ch AS ({CHUNK_SQL(chunk_size, overlap, table, text_expr, id_col)}),
counts AS (
  SELECT chunk_hash, count(DISTINCT {id_col}) AS nd FROM ch GROUP BY 1
)
SELECT CAST(ch.{id_col} AS BIGINT) AS {id_col},
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
FROM ch JOIN counts c ON ch.chunk_hash = c.chunk_hash
GROUP BY ch.{id_col}
"""


# ---------------------------------------------------------------------------
# Curriculum ordering: distributed global rank by quality
# ---------------------------------------------------------------------------

def curriculum_order(docs: DataFrame, num_ranges: int = 32,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Global curriculum rank: order the corpus by a quality key (stopword
    density here — any integer key works) and assign each doc its exact
    global position, without ever sorting on one node.

    Scale design — the two-phase distributed global rank:

    1. ``repartitionByRange`` on (quality DESC, id) — Spark's sample-based
       RangePartitioner puts each doc in a contiguous, non-overlapping key
       range (boundaries are sampled, but with the unique id in the range
       key the assignment of ranks is total and deterministic).
    2. per-partition ``row_number`` (local sort inside each range) plus the
       cumulative count of all earlier ranges — the offsets are
       ``num_ranges`` tiny rows collected to the driver, the only
       driver-side data regardless of corpus size.

    A single-partition ``Window.orderBy`` global row_number — the naive
    spelling — funnels 100 TB through one task; this plan's largest
    single-node obligation is one range partition (~corpus/num_ranges).

    Quality key: floor(1e6 * stopword_hits / tokens) — integer-exact on
    every engine (< 2^53, floor(double) both sides).
    """
    from pyspark.sql import Window

    from ..functions.text import STOPWORDS

    toks = tokens_col(text_col)
    en = STOPWORDS["en"]
    metrics = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("_nt"),
        F.size(F.filter(toks, lambda t: t.isin(en))).cast("long").alias("_ns"),
    ).filter(F.col("_nt") > 0)
    keyed = metrics.select(
        id_col,
        F.floor(F.col("_ns") * 1000000 / F.col("_nt")).cast("long")
        .alias("quality_q"),
    )
    # persist BEFORE counting: the offsets job and the final rank job must
    # see the SAME range assignment, and RangePartitioner boundaries are
    # sample-based — re-executing the exchange could move boundary rows
    ranged = keyed.repartitionByRange(
        num_ranges, F.col("quality_q").desc(), F.col(id_col)
    ).withColumn("_pid", F.spark_partition_id()).persist()
    # offsets: one tiny row per range partition — the ONLY driver collect
    counts = {
        r["_pid"]: r["c"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(*[
            x for pid in sorted(offsets)
            for x in (F.lit(pid), F.lit(offsets[pid]))
        ]),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(
        F.col("quality_q").desc(), F.col(id_col)
    )
    return ranged.select(
        id_col,
        "quality_q",
        (F.row_number().over(w) + off_expr).cast("long").alias("rank"),
    )


def CURRICULUM_SQL(table: str = "documents", text_expr: str = "text",
                   id_col: str = "doc_id") -> str:
    from ..functions.text import STOPWORDS

    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
WITH m AS (
  SELECT {id_col},
         CAST(floor(len(list_filter(toks, t -> t IN ({en}))) * 1000000
                    / (len(toks) * 1.0)) AS BIGINT) AS quality_q
  FROM (SELECT {id_col}, {TOKENS_SQL(text_expr)} AS toks FROM {table})
  WHERE len(toks) > 0
)
SELECT {id_col}, quality_q,
       CAST(row_number() OVER (ORDER BY quality_q DESC, {id_col}) AS BIGINT)
         AS rank
FROM m
"""


# ---------------------------------------------------------------------------
# Cross-corpus duplicate-span removal (Lee et al. 2022 / C4-style)
# ---------------------------------------------------------------------------

def dup_span_removal(docs: DataFrame, span: int = 32,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Remove every fixed-boundary ``span``-token window whose text appears
    verbatim in at least one OTHER document, and reassemble the surviving
    windows into a cleaned document — the "deduplicating training data"
    operation (Lee et al. 2022 ExactSubstr; C4's duplicate-span rule),
    restricted to non-overlapping aligned windows so the result is exact
    and engine-independent (the synthetic corpus has no newlines; on real
    text the window splitter swaps for a line/sentence splitter).

    Output: (doc_id, n_spans, n_dropped, clean_text) — clean_text is ""
    when every window of the doc is cross-document duplicated (the doc row
    is KEPT so the caller sees the drop decision; filtering is policy).

    Scale shape (3 keyed shuffles, no doc x doc anywhere):
      1. window explode is shuffle-free (rows out = sum n/span per doc);
      2. the shared flag is min(doc)!=max(doc) WINDOW over span_hash —
         constant-memory per group, duplication resolved through the hash
         partition exactly like shared_chunk_stats;
      3. reassembly is one per-doc groupBy; collect_list holds at most
         n/span short strings per doc (bounded by the doc itself, the
         same memory the raw row already costs).
    Exactness: pure string ops + md5 end-to-end — no floats, so the
    cleaned text hash-matches DuckDB bit-for-bit.
    """
    from pyspark.sql import Window

    toked = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        tokens_col(text_col).alias("toks"),
    ).withColumn("_n", F.size("toks")).filter(F.col("_n") > 0)
    sp = toked.select(
        id_col,
        F.posexplode(
            F.sequence(F.lit(0), F.col("_n") - 1, F.lit(span))
        ).alias("widx", "_start"),
        F.col("toks"),
    ).select(
        id_col,
        F.col("widx").cast("long").alias("widx"),
        F.array_join(
            F.slice(F.col("toks"), F.col("_start") + 1, F.lit(span)), " "
        ).alias("span_text"),
    ).withColumn("span_hash", F.md5("span_text"))
    w = Window.partitionBy("span_hash")
    flagged = sp.withColumn(
        "_shared",
        F.min(id_col).over(w) != F.max(id_col).over(w),
    )
    kept_struct = F.when(
        ~F.col("_shared"), F.struct(F.col("widx"), F.col("span_text"))
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.col("_shared").cast("long")).cast("long")
             .alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s.getField("span_text"),
                ),
                " ",
            ).alias("clean_text"),
        )
        .select(id_col, "n_spans", "n_dropped", "clean_text")
    )


def DUP_SPAN_SQL(span: int = 32, table: str = "documents",
                 text_expr: str = "text", id_col: str = "doc_id") -> str:
    return f"""
WITH t AS (
  SELECT CAST({id_col} AS BIGINT) AS {id_col}, toks, len(toks) AS n
  FROM (SELECT {id_col}, {TOKENS_SQL(text_expr)} AS toks FROM {table})
  WHERE len(toks) > 0
),
sp AS (
  SELECT {id_col},
         CAST(floor(u.s / {span}.0) AS BIGINT) AS widx,
         array_to_string(toks[u.s + 1 : u.s + {span}], ' ') AS span_text
  FROM t, unnest(range(0, CAST(n AS BIGINT), {span})) AS u(s)
),
flagged AS (
  SELECT {id_col}, widx, span_text,
         min({id_col}) OVER (PARTITION BY md5(span_text))
           <> max({id_col}) OVER (PARTITION BY md5(span_text)) AS shared
  FROM sp
)
SELECT {id_col},
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN shared THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       coalesce(
         string_agg(CASE WHEN NOT shared THEN span_text END, ' '
                    ORDER BY widx),
         '') AS clean_text
FROM flagged
GROUP BY {id_col}
"""


# ---------------------------------------------------------------------------
# Token-budget domain mixing
# ---------------------------------------------------------------------------

def token_budget_mix(docs: DataFrame, budget_tokens: int,
                     weights: dict[str, int] | None = None,
                     text_col: str = "text", id_col: str = "doc_id",
                     source_col: str = "source") -> DataFrame:
    """Budget-aware domain mixing: sample each source so the KEPT corpus
    lands (in expectation, exactly in rate) on ``budget_tokens`` split
    across sources proportional to integer ``weights`` (default: equal).
    The planning step every pretraining run does between "we have T_s
    tokens per domain" and "the run consumes B tokens at mix w".

    Per source: target_s = B * w_s // W, rate_s = min(1, target_s / T_s).
    The rate is quantized to parts-per-million ONCE in the tiny per-source
    frame — rate_ppm = min(1e6, target_s * 1e6 // T_s) — so the per-row
    keep decision is the small-integer compare  u_ppm < rate_ppm  with
    u_ppm = (first 8 md5 hex digits of doc id) mod 1e6. No row-side
    product can overflow regardless of corpus size; the only wide
    arithmetic (target_s * 1e6, up to ~2^64 at 100 TB) happens on
    |sources| rows and is done in DECIMAL(38,0) / HUGEINT with floor
    division mirrored on both engines.

    Scale shape: one token-count aggregation per source (map-side sums),
    broadcast back; the verdict is row-local. Output keeps every row with
    (n_tokens, rate_ppm, kept) so downstream picks filter vs audit.

    Determinism note: u_ppm = u mod 1e6 has the usual modulo bias
    (~0.02%); it is engine-identical and rate-exact to the quantization,
    which is what the oracle asserts.
    """
    weights = weights or {}
    toked = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(source_col),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
    )
    wmap = F.create_map(*[
        x for s, w in weights.items() for x in (F.lit(s), F.lit(int(w)))
    ]) if weights else None
    counts = toked.groupBy(source_col).agg(
        F.sum("n_tokens").cast("long").alias("t_s")
    )
    counts = counts.withColumn(
        "w_s",
        F.coalesce(wmap[F.col(source_col)], F.lit(1)).cast("long")
        if weights else F.lit(1).cast("long"),
    )
    wtot = counts.agg(F.sum("w_s").cast("long").alias("w_tot"))
    rates = (
        counts.crossJoin(F.broadcast(wtot))
        .withColumn(
            "target_s",
            # `div` = exact integral division (truncation; == floor for the
            # all-positive operands here) — decimal `/` would round at
            # scale 6 BEFORE a floor and can disagree with DuckDB's `//`
            F.expr(
                f"(CAST(w_s AS DECIMAL(38,0)) * {int(budget_tokens)})"
                " div w_tot"
            ).cast("long"),
        )
        .withColumn(
            "rate_ppm",
            F.least(
                F.lit(1000000).cast("long"),
                F.expr(
                    "(CAST(target_s AS DECIMAL(38,0)) * 1000000) div t_s"
                ).cast("long"),
            ),
        )
        .select(source_col, "t_s", "target_s", "rate_ppm")
    )
    u_ppm = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
         .cast("long"),
        F.lit(1000000),
    )
    return (
        toked.join(F.broadcast(rates), source_col)
        .select(
            id_col, source_col, "n_tokens", "rate_ppm",
            (u_ppm < F.col("rate_ppm")).alias("kept"),
        )
    )


def TOKEN_BUDGET_MIX_SQL(budget_tokens: int,
                         weights: dict[str, int] | None = None,
                         table: str = "documents", text_expr: str = "text",
                         id_col: str = "doc_id",
                         source_col: str = "source") -> str:
    if weights:
        wexpr = "CASE " + " ".join(
            f"WHEN {source_col} = '{s}' THEN {int(w)}"
            for s, w in weights.items()
        ) + " ELSE 1 END"
    else:
        wexpr = "1"
    return f"""
WITH toked AS (
  SELECT CAST({id_col} AS BIGINT) AS {id_col}, {source_col},
         CAST(len({TOKENS_SQL(text_expr)}) AS BIGINT) AS n_tokens
  FROM {table}
),
counts AS (
  SELECT {source_col}, CAST(sum(n_tokens) AS BIGINT) AS t_s,
         CAST({wexpr} AS BIGINT) AS w_s
  FROM toked GROUP BY {source_col}
),
wtot AS (SELECT CAST(sum(w_s) AS BIGINT) AS w_tot FROM counts),
rates AS (
  SELECT {source_col}, t_s,
         CAST((CAST(w_s AS HUGEINT) * {int(budget_tokens)}) // w_tot
              AS BIGINT) AS target_s
  FROM counts, wtot
),
rates2 AS (
  SELECT {source_col},
         least(CAST(1000000 AS BIGINT),
               CAST((CAST(target_s AS HUGEINT) * 1000000) // t_s AS BIGINT))
           AS rate_ppm
  FROM rates
)
SELECT t.{id_col}, t.{source_col}, t.n_tokens, r.rate_ppm,
       (CAST(('0x' || substr(md5(CAST(t.{id_col} AS VARCHAR)), 1, 8))
             AS BIGINT) % 1000000) < r.rate_ppm AS kept
FROM toked t JOIN rates2 r ON t.{source_col} = r.{source_col}
"""


# ---------------------------------------------------------------------------
# Exact-k deterministic sample per group
# ---------------------------------------------------------------------------

def sample_k_per_group(docs: DataFrame, k: int,
                       group_col: str = "source",
                       id_col: str = "doc_id") -> DataFrame:
    """EXACTLY min(k, |group|) rows per group, deterministically: rank rows
    inside each group by (md5(id), id) — a uniform, engine-identical
    pseudo-random order — and keep the first k. The fixed-quota
    complement of stratified_sample's rate-based keep (rates can't
    promise exact counts; quotas can't be row-local — you need one or the
    other, so both are operators).

    Scale note: the rank is a window partitioned by group — per-group
    work lands on one task, so this is the right tool when groups are
    bounded (sources, languages, shards). For huge groups, prefilter with
    stratified_sample at a generous rate (k * safety / |group|) first and
    quota-rank the survivors; the two-stage composition keeps the sorted
    partition small without changing the selected-set determinism.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        docs.select(
            F.col(id_col).cast("long").alias(id_col), F.col(group_col)
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


def SAMPLE_K_SQL(k: int, table: str = "documents",
                 group_col: str = "source", id_col: str = "doc_id") -> str:
    return f"""
SELECT {id_col}, {group_col}, rk FROM (
  SELECT CAST({id_col} AS BIGINT) AS {id_col}, {group_col},
         CAST(row_number() OVER (
           PARTITION BY {group_col}
           ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}
         ) AS BIGINT) AS rk
  FROM {table}
)
WHERE rk <= {k}
"""


def cap_key_degree(df: DataFrame, cap: int, key_col: str = "u",
                   item_col: str = "item") -> DataFrame:
    """Deterministic per-key degree cap: keep at most ``cap`` items per
    key, selected by the engine-identical pseudo-random order
    (md5(key:item), item) — the sample_k_per_group discipline applied
    to graph degree.  THE standard skew mitigation before any
    within-key self-join (co-occurrence, item-item similarity, wedge
    generation): the join cost is sum(deg^2), and one power-law hub
    key — a crawler account touching 1e6 items — otherwise contributes
    1e12 pairs on its own.  Capping introduces a DOCUMENTED sampling
    bias (hyperactive keys are subsampled uniformly, not truncated by
    recency or id); every consumer mirrors the cap in its oracle, so
    exactness is preserved by construction.  Keyed window, map-side
    prunable, no driver state.

    NULL keys/items coalesce to '' BEFORE hashing: Spark's concat_ws
    SKIPS null arguments (dropping the separator) while DuckDB's ||
    propagates NULL through md5, and Spark sorts NULLS FIRST ascending
    where DuckDB defaults NULLS LAST — either would let the two engines
    keep a different subsample of a >cap key containing NULLs (ADVICE
    r8).  The '' sentinel can collide with a real empty string, which
    is fine: the hash order is then shared, deterministic, and
    identical on both engines, and the item tie-break still
    disambiguates."""
    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.concat_ws(
            ":",
            F.coalesce(F.col(key_col).cast("string"), F.lit("")),
            F.coalesce(F.col(item_col).cast("string"), F.lit("")))),
        F.col(item_col).asc_nulls_last())
    return (
        df.withColumn("_kr", F.row_number().over(w))
        .filter(F.col("_kr") <= cap)
        .drop("_kr")
    )


def CAP_DEGREE_SQL(cap: int, src: str, key: str = "u",
                   item: str = "item") -> str:
    """DuckDB mirror of cap_key_degree as a subquery body over CTE
    ``src``: same md5 order (NULLs coalesced to the '' sentinel, see
    cap_key_degree), same NULLS-LAST item tie-break, same cap."""
    return f"""SELECT {key}, {item} FROM (
  SELECT {key}, {item},
         row_number() OVER (PARTITION BY {key}
           ORDER BY md5(coalesce(CAST({key} AS VARCHAR), '') || ':'
                        || coalesce(CAST({item} AS VARCHAR), '')),
                    {item} NULLS LAST) AS _kr
  FROM {src}
) WHERE _kr <= {cap}"""


def dup_line_removal(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", sep: str = "\n") -> DataFrame:
    """dup_span_removal at natural-boundary granularity: the dedup unit is
    a LINE/PARAGRAPH (split on ``sep``) instead of a fixed token window —
    the C4 rule as published (drop any line occurring in another document:
    boilerplate headers, cookie banners, license footers).

    Same 100 TB shape as the window variant (explode -> one window over
    the unit hash -> one per-doc reassembly groupBy; no doc x doc): only
    the splitter changed, which is why the synthetic no-newline corpus
    keeps the window variant as its contract query and this one is pinned
    by tests/test_streaming_corpus.py on real multi-paragraph text.

    Output: (doc_id, n_units, n_dropped, clean_text); a unit repeated
    WITHIN one doc is not 'shared' — only cross-document repetition
    drops it (min!=max over doc ids), matching the window variant."""
    from pyspark.sql import Window

    units = (
        docs.select(
            F.col(id_col).cast("long").alias(id_col),
            F.posexplode(F.split(F.col(text_col), F.lit(sep)))
             .alias("uidx", "unit_text"),
        )
        .filter(F.col("unit_text") != "")
        .withColumn("uidx", F.col("uidx").cast("long"))
        .withColumn("unit_hash", F.md5("unit_text"))
    )
    w = Window.partitionBy("unit_hash")
    flagged = units.withColumn(
        "_shared", F.min(id_col).over(w) != F.max(id_col).over(w)
    )
    kept = F.when(~F.col("_shared"),
                  F.struct(F.col("uidx"), F.col("unit_text")))
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.sum(F.col("_shared").cast("long")).cast("long")
             .alias("n_dropped"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list(kept)),
                            lambda s: s.getField("unit_text")),
                sep,
            ).alias("clean_text"),
        )
        .select(id_col, "n_units", "n_dropped", "clean_text")
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (A-ES / Efraimidis-Spirakis)
# ---------------------------------------------------------------------------

_HEX16 = "0123456789abcdef"


def u48_fold_sql(id_expr: str) -> str:
    """48-bit integer from the first 12 hex digits of md5(id) — the
    engine-shared instr-fold text (same idiom as operators/sketch.py)."""
    # CAST each term to BIGINT: instr returns INT, and INT * 16^11
    # overflows under Spark ANSI (the generated-fold-term trap, NOTES_r4)
    return "(" + " + ".join(
        f"CAST(instr('{_HEX16}', substr(md5(CAST({id_expr} AS STRING)), {j}, 1))"
        f" - 1 AS BIGINT) * {16 ** (12 - j)}"
        for j in range(1, 13)
    ) + ")"


def aes_key_sql(id_expr: str, weight_expr: str) -> str:
    """Quantized Efraimidis-Spirakis sort key: round(1e6 * ln(u)/w) with
    u = (u48 + 0.5) / 2^48 derived from md5(id).  Bigger is better (all
    values negative, approaching 0 as u -> 1 or w -> inf).  Shared text in
    both engines; every literal CAST to DOUBLE (DuckDB parses bare
    decimals as DECIMAL — the token_budget_mix pitfall)."""
    u = (
        f"(CAST({u48_fold_sql(id_expr)} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        f" / CAST(281474976710656.0 AS DOUBLE)"
    )
    return (
        f"CAST(round(ln({u}) / CAST({weight_expr} AS DOUBLE)"
        f" * CAST(1000000.0 AS DOUBLE), 0) AS BIGINT)"
    )


def weighted_sample(
    docs: DataFrame,
    k: int = 20,
    group_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per group —
    the importance-weighted corpus picker (P(select) proportional to the
    weight, e.g. doc length or a quality score).  Efraimidis-Spirakis:
    rank by key = u^(1/w) — order-equivalent to ln(u)/w, which is what we
    compute — with u a pure function of md5(id): row-local key, ONE
    group-keyed window shuffle, reproducible on any engine/partitioning.

    The float ln is quantized at 1e6 before ranking (BM25 precedent);
    ties break by id, so the selected set is a deterministic function of
    the table."""
    key_q = F.expr(aes_key_sql(id_col, weight_col))
    w = Window.partitionBy(group_col).orderBy(
        F.col("aes_key_q").desc(), F.col(id_col).asc()
    )
    return (
        docs.filter(F.col(weight_col) > 0)
        .withColumn("aes_key_q", key_q)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def WEIGHTED_SAMPLE_SQL(
    k: int = 20,
    table: str = "documents",
    group_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> str:
    return f"""
SELECT * FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY {group_col}
                 ORDER BY aes_key_q DESC, {id_col} ASC) AS BIGINT) AS rank
  FROM (
    SELECT *, {aes_key_sql(id_col, weight_col)} AS aes_key_q
    FROM {table} WHERE {weight_col} > 0
  )
) WHERE rank <= {k}
"""


def distributed_global_rank(df: DataFrame, sort_cols: list,
                            num_ranges: int = 32):
    """Two-phase exact global rank without a single-node sort (the
    curriculum_order plan, generalized): repartitionByRange on the
    (total-order) ``sort_cols``, per-partition row_number, plus the
    cumulative counts of earlier ranges — ``num_ranges`` tiny offset
    rows are the only driver-side data at any corpus size, and the
    largest single-node obligation is one range (~corpus/num_ranges).

    ``sort_cols`` MUST be a total order (include a unique id last) or
    ranks are partition-dependent.  Returns (ranked_df, total_rows);
    the input is persisted so the offsets job and the rank job see the
    SAME sampled range boundaries — callers should unpersist via
    ranked_df.unpersist() when done."""
    from pyspark.sql import Window

    ranged = df.repartitionByRange(num_ranges, *sort_cols).withColumn(
        "_pid", F.spark_partition_id()
    ).persist()
    counts = {
        r["_pid"]: r["c"]
        for r in ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(*[
            x for pid in sorted(offsets)
            for x in (F.lit(pid), F.lit(offsets[pid]))
        ]),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    ranked = ranged.select(
        *[c for c in df.columns],
        (F.row_number().over(w) + off_expr).cast("long").alias("rank"),
    )
    return ranked, acc


def distributed_running_sum(df: DataFrame, sort_cols: list,
                            val_col: str, num_ranges: int = 32) -> DataFrame:
    """Two-phase exact global PREFIX SUM without a single-partition sort —
    the distributed_global_rank pattern generalized from row counting to an
    integer value column (the sweep-line / cumulative-balance primitive).

    Phase 1 repartitionByRange on the (total-order) ``sort_cols`` and takes
    per-range totals of ``val_col``; phase 2 adds each row's within-range
    running sum to the cumulative total of every EARLIER range.  Only
    ``num_ranges`` offset rows ever reach the driver, and the largest
    single-node obligation is one range's sort (~rows/num_ranges) — the
    global-ORDER-BY window that a naive running sum needs collapses every
    row onto one task and is exactly what this avoids at 100 TB.

    ``sort_cols`` MUST be a total order (include a unique id last) or the
    prefix at ties is partition-dependent.  ``val_col`` must be integral
    (BIGINT running sums are exact; float prefix sums would re-associate).
    The input is persisted so the offsets job and the output job see the
    same sampled range boundaries; callers unpersist via the result."""
    ranged = df.repartitionByRange(num_ranges, *sort_cols).withColumn(
        "_pid", F.spark_partition_id()
    ).persist()
    sums = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid")
        .agg(F.sum(val_col).cast("long").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    off_expr = F.element_at(
        F.create_map(*[
            x for pid in sorted(offsets)
            for x in (F.lit(pid), F.lit(offsets[pid]))
        ]),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*sort_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ranged.select(
        *[c for c in df.columns],
        (F.sum(val_col).over(w) + off_expr).cast("long").alias("running"),
    )


DOREMI_ETA_PPM = 1_000_000   # η = 1.0 in the linear MW update
DOREMI_EPS_PPM = 10_000      # ε = 1% uniform smoothing (DoReMi App. A)


def doremi_weight_round(docs: DataFrame, source_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """One DoReMi-style domain-reweighting round (Xie et al., NeurIPS
    2023): multiplicative-weights update of the pretraining mixture
    from per-domain excess loss, then uniform smoothing — the step that
    turns "which domains are under-learned" into next epoch's sampling
    weights.

    Deliberate, documented variants for oracle-grade exactness:

    * The update is the LINEAR multiplicative-weights form
      w'_k ∝ w_k · (1 + η·λ_k) rather than DoReMi's exponentiated
      w_k · exp(η·λ_k) — same MW family and regret guarantee (Arora,
      Hazan, Kale 2012 §2), but free of exp(), which IEEE-754 does not
      require correctly rounded and which therefore cannot sit behind a
      bit-exact cross-engine gate.  For the per-round magnitudes here
      (η·λ <= 1) the two updates agree to first order.
    * The excess-loss signal λ_k is a deterministic per-doc proxy — the
      repetition mass 1 − TTR (type/token ratio) in floor-ppm, averaged
      per domain — standing in for the proxy-minus-reference loss gap a
      production run logs per domain; swap the column, keep the round.

    Output per domain: (source, n_docs, lam_ppm, w1_ppm, w_ppm) — the
    normalized post-update weight and its ε-smoothed final (both
    floor-ppm; Σ w1_ppm ∈ [1e6 − K, 1e6] by floor rounding).

    Exactness envelope: raw_k = w0·(1e6+λ) <= 2e12; raw·1e6 <= 2e18 <
    2^63 — safe for any domain count that fits the ppm grid (K <= 1e6).

    Scale: ONE corpus scan with row-local scoring into a
    |domains|-keyed aggregate; the normalization window runs over the
    |domains| frame.  Map-side combine collapses each partition to K
    partial rows — the 100 TB cost is the scan, as it must be."""
    from .dedup import tokens_col

    per_doc = docs.select(
        F.col(source_col).alias("source"), tokens_col(text_col).alias("_t")
    ).select(
        "source",
        F.expr("CASE WHEN size(_t) = 0 THEN CAST(0 AS BIGINT)"
               " ELSE 1000000 - CAST(size(array_distinct(_t)) * 1000000"
               " div size(_t) AS BIGINT) END").alias("rep_ppm"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("sum(rep_ppm) div count(*)").cast("long").alias("lam_ppm"),
    )
    w = Window.partitionBy()
    sized = per_src.select(
        "source", "n_docs", "lam_ppm",
        F.count(F.lit(1)).over(w).cast("long").alias("k"),
        F.expr(f"(1000000 div count(*) OVER ())"
               f" * (1000000 + {DOREMI_ETA_PPM} * lam_ppm div 1000000)")
        .cast("long").alias("raw"),
    )
    return sized.select(
        "source", "n_docs", "lam_ppm",
        F.expr("CAST(raw * 1000000 div sum(raw) OVER () AS BIGINT)")
        .alias("w1_ppm"),
        F.expr(
            f"CAST(((1000000 - {DOREMI_EPS_PPM})"
            f" * (raw * 1000000 div sum(raw) OVER ())"
            f" + {DOREMI_EPS_PPM} * (1000000 div k)) div 1000000"
            " AS BIGINT)").alias("w_ppm"),
    )


def DOREMI_SQL(table: str = "documents", source_col: str = "source",
               text_expr: str = "text") -> str:
    return f"""
WITH per_doc AS (
  SELECT {source_col} AS source,
         CASE WHEN len(t) = 0 THEN CAST(0 AS BIGINT)
         ELSE 1000000 - CAST(len(list_distinct(t)) * 1000000 // len(t)
                             AS BIGINT) END AS rep_ppm
  FROM (SELECT {source_col}, {TOKENS_SQL(text_expr)} AS t FROM {table})
),
per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(rep_ppm) // count(*) AS BIGINT) AS lam_ppm
  FROM per_doc GROUP BY 1
),
sized AS (
  SELECT source, n_docs, lam_ppm,
         CAST(count(*) OVER () AS BIGINT) AS k,
         CAST((1000000 // count(*) OVER ())
              * (1000000 + {DOREMI_ETA_PPM} * lam_ppm // 1000000)
              AS BIGINT) AS raw
  FROM per_src
)
SELECT source, n_docs, lam_ppm,
       CAST(raw * 1000000 // sum(raw) OVER () AS BIGINT) AS w1_ppm,
       CAST(((1000000 - {DOREMI_EPS_PPM})
             * (raw * 1000000 // sum(raw) OVER ())
             + {DOREMI_EPS_PPM} * (1000000 // k)) // 1000000
            AS BIGINT) AS w_ppm
FROM sized
"""


# ---------------------------------------------------------------------------
# UniMax epoch-capped budget allocation (water-filling closed form)
# ---------------------------------------------------------------------------


def unimax_mixture_plan(docs: DataFrame, budget_tokens: int | None = None,
                        epoch_cap: int = 4, text_col: str = "text",
                        source_col: str = "source") -> DataFrame:
    """UniMax language/source sampling (Chung et al., ICLR 2023
    "UniMax: Fairer and More Effective Language Sampling for
    Large-Scale Multilingual Pretraining"): allocate a token budget B
    across sources so that no source repeats more than ``epoch_cap``
    epochs — visiting sources SMALLEST FIRST, each takes
    min(cap * T_s, remaining_budget / remaining_sources) and the
    leftover re-spreads over the rest.  The published algorithm is the
    sequential loop; this operator computes its WATER-FILLING closed
    form entirely with window functions: because sizes ascend, the
    epoch-capped prefix is exactly the maximal prefix where
    cap * T_i * (k - i + 1) <= B - cap * S_{i-1} (all int64 — no
    division, no sequential state; envelope: the triple product stays
    exact through cap·T_i·k < 9.2e18, i.e. ~5.7e16 tokens in ONE
    source at cap 4, k 40 — ~50 PB of text, far past the 100 TB
    design point; past that, lift the predicate to DECIMAL(38,0) on
    both engines), and every source after the
    threshold splits the leftover evenly (floor; the largest source
    absorbs the remainder, a stated deterministic convention).

    Default budget = the corpus's own total token count (so the plan
    answers "re-spend the same compute fairly"); epoch_cap = 4 is the
    paper's sweet spot.

    Output per source: (source, n_tokens, alloc_tokens, epochs_ppm,
    capped) with epochs_ppm = alloc * 1e6 div n_tokens, in
    DECIMAL(38,0)/HUGEINT (alloc * 1e6 crosses int64 at ~1e13 tokens
    — exactly the 100 TB corpus this plans for).

    Scale: one corpus-linear token-count aggregation; everything after
    lives on the |sources|-row frame (windows over k rows).  The
    referee test replays the paper's sequential loop in Python and
    pins this closed form against it.  Reference scope:
    beyond-reference LLM-pipeline charter (SURVEY.md §2 has no corpus
    surface)."""
    counts = (
        docs.select(
            F.col(source_col),
            F.size(tokens_col(text_col)).cast("long").alias("nt"),
        )
        .groupBy(source_col)
        .agg(F.sum("nt").cast("long").alias("n_tokens"))
    )
    return unimax_from_counts(counts, budget_tokens, epoch_cap, source_col)


def unimax_from_counts(counts: DataFrame,
                       budget_tokens: int | None = None,
                       epoch_cap: int = 4,
                       source_col: str = "source") -> DataFrame:
    """The water-filling half, from a (source, n_tokens) frame — shared
    by the batch operator and the streaming twin (token counts are the
    plan's ADDITIVE sufficient statistic: keyed sums merge under any
    arrival order, so the twin folds counts and derives the allocation
    from state at report time)."""
    from pyspark.sql import Window

    counts = counts.where(F.col("n_tokens") > 0)
    budget = (
        F.lit(int(budget_tokens)).cast("long")
        if budget_tokens is not None
        else F.sum("n_tokens").over(Window.partitionBy()).cast("long")
    )
    asc = Window.partitionBy().orderBy("n_tokens", source_col)
    frame = Window.partitionBy()
    c = int(epoch_cap)
    with_idx = counts.select(
        source_col, "n_tokens",
        budget.alias("b"),
        F.row_number().over(asc).alias("idx"),
        F.count(F.lit(1)).over(frame).alias("k"),
        F.coalesce(
            F.sum("n_tokens").over(asc.rowsBetween(
                Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long").alias("s_prev"),
    )
    flagged = with_idx.select(
        "*",
        (F.lit(c) * F.col("n_tokens") * (F.col("k") - F.col("idx") + 1)
         <= F.col("b") - F.lit(c) * F.col("s_prev")).alias("cap_ok"),
    )
    # t = maximal prefix with cap_ok everywhere: max idx such that
    # min(cap_ok over 1..idx) is true — computed as a running AND.
    run = Window.partitionBy().orderBy("idx")
    with_t = flagged.select(
        "*",
        F.min(F.when(F.col("cap_ok"), F.lit(1)).otherwise(F.lit(0)))
        .over(run.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_prefix_ok"),
    ).select(
        "*",
        F.max(F.when(F.col("_prefix_ok") == 1, F.col("idx"))
              .otherwise(F.lit(0)))
        .over(frame.rowsBetween(Window.unboundedPreceding,
                                Window.unboundedFollowing))
        .alias("t"),
    ).select(
        "*",
        F.coalesce(
            F.max(F.when(F.col("idx") == F.col("t"),
                         F.col("s_prev") + F.col("n_tokens")))
            .over(frame.rowsBetween(Window.unboundedPreceding,
                                    Window.unboundedFollowing)),
            F.lit(0),
        ).cast("long").alias("s_t"),
    )
    # leftover div n_rest: both non-negative int64 (leftover >= 0 by the
    # prefix construction — the first uncapped source's fair share was
    # affordable), so floor == truncation; `div` mirrors DuckDB's `//`.
    alloc = (
        F.when(F.col("idx") <= F.col("t"), F.lit(c) * F.col("n_tokens"))
        .otherwise(
            F.expr(f"CAST((b - {c}L * s_t) div (k - t) AS BIGINT)")
            + F.when(F.col("idx") == F.col("k"),
                     F.expr(f"CAST((b - {c}L * s_t) % (k - t) AS BIGINT)"))
            .otherwise(F.lit(0))
        )
    )
    return with_t.select(
        source_col, "n_tokens",
        alloc.cast("long").alias("alloc_tokens"),
        (F.col("idx") <= F.col("t")).alias("capped"),
    ).select(
        source_col, "n_tokens", "alloc_tokens",
        F.expr(
            "CAST((CAST(alloc_tokens AS DECIMAL(38,0)) * 1000000) "
            "div n_tokens AS BIGINT)"
        ).alias("epochs_ppm"),
        "capped",
    )


def UNIMAX_SQL(budget_tokens: int | None = None, epoch_cap: int = 4,
               table: str = "documents", text_expr: str = "text",
               source_col: str = "source") -> str:
    c = int(epoch_cap)
    budget_expr = (
        str(int(budget_tokens)) if budget_tokens is not None
        else "(SELECT CAST(sum(n_tokens) AS BIGINT) FROM counts)"
    )
    return f"""
WITH counts AS (
  SELECT {source_col}, CAST(sum(nt) AS BIGINT) AS n_tokens
  FROM (
    SELECT {source_col},
           CAST(len({TOKENS_SQL(text_expr)}) AS BIGINT) AS nt
    FROM {table}
  )
  GROUP BY {source_col}
  HAVING sum(nt) > 0
),
idxed AS (
  SELECT {source_col}, n_tokens,
         CAST({budget_expr} AS BIGINT) AS b,
         row_number() OVER (ORDER BY n_tokens, {source_col}) AS idx,
         CAST(count(*) OVER () AS BIGINT) AS k,
         CAST(coalesce(sum(n_tokens) OVER (
           ORDER BY n_tokens, {source_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS s_prev
  FROM counts
),
flagged AS (
  SELECT *,
         ({c} * n_tokens * (k - idx + 1) <= b - {c} * s_prev) AS cap_ok
  FROM idxed
),
pref AS (
  SELECT *,
         min(CASE WHEN cap_ok THEN 1 ELSE 0 END) OVER (
           ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prefix_ok
  FROM flagged
),
witht AS (
  SELECT *,
         max(CASE WHEN prefix_ok = 1 THEN idx ELSE 0 END) OVER () AS t
  FROM pref
),
withst AS (
  SELECT *,
         CAST(coalesce(max(CASE WHEN idx = t THEN s_prev + n_tokens END)
                       OVER (), 0) AS BIGINT) AS s_t
  FROM witht
),
alloc AS (
  SELECT {source_col}, n_tokens,
         CAST(CASE WHEN idx <= t THEN {c} * n_tokens
              ELSE (b - {c} * s_t) // (k - t)
                   + CASE WHEN idx = k THEN (b - {c} * s_t) % (k - t)
                     ELSE 0 END
              END AS BIGINT) AS alloc_tokens,
         idx <= t AS capped
  FROM withst
)
SELECT {source_col}, n_tokens, alloc_tokens,
       CAST((CAST(alloc_tokens AS HUGEINT) * 1000000) // n_tokens
            AS BIGINT) AS epochs_ppm,
       capped
FROM alloc"""
