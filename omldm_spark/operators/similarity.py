"""Similarity search over embedding columns (beyond-reference surface).

* ``cosine_topk`` — brute-force cosine top-k: broadcast the (small) query
  set against the full embedding table; the dot product is a JVM-side
  zip_with/aggregate fold (no Python, whole-stage codegen), ranking is a
  window partitioned by query. At 100 TB the scan dominates — which is the
  optimal brute-force plan. The *candidates* never shuffle: only
  (query, id, score) triples do.
* ``anchor_lsh_topk`` — the scale path: sign-random-projection LSH where
  the hyperplanes are the first ``h`` embedding vectors themselves
  (deterministic, data-derived anchors — no RNG, replayable). Vectors join
  on bucket signature first, cutting the candidate set by ~2^h before exact
  cosine re-ranking. Recall < 1 by design; pair it with multi-probe or more
  tables when recall matters.

Determinism: cosine is rounded to 6 decimals on BOTH engines before
ranking, so rank ties resolve on identical values (tie-break: neighbor id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot, to_double_array


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int | None = 10,
) -> DataFrame:
    """Top-k cosine neighbors for each query vector (excluding self).

    Output: query_id, neighbor_id, cos_sim (round 6), rank.
    """
    emb = embeddings.select(
        F.col(id_col).cast("long").alias(id_col),
        to_double_array(vec_col).alias(vec_col),
    )
    if query_ids is not None:
        queries = emb.filter(F.col(id_col).isin([int(q) for q in query_ids]))
    else:
        queries = emb.filter(F.col(id_col) < max_query_id)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = emb.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def hard_negative_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_query_id: int | None = 10,
) -> DataFrame:
    """Hard-negative mining: for each query vector, the top-k cosine
    neighbors carrying a DIFFERENT label — the metric-learning /
    contrastive-training curation step (the nearest wrong-class points
    are the gradients that matter, cf. FaceNet semi-hard mining,
    Schroff CVPR 2015).  Identical plan shape to :func:`cosine_topk`
    (broadcast query set against the full scan; candidates never
    shuffle, only (query, neighbor, score) triples do) plus one
    row-local label-inequality predicate — the optimal brute-force
    plan at any scale; swap the scan side for the LSH/IVF variants
    when the corpus outgrows it.

    Output: query_id, query_label, neighbor_id, neighbor_label,
    cos_sim (round 6), rank.
    """
    emb = embeddings.select(
        F.col(id_col).cast("long").alias(id_col),
        to_double_array(vec_col).alias(vec_col),
        F.col(label_col).cast("long").alias("lbl"),
    )
    q = emb.filter(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        F.col("lbl").alias("query_label"),
    )
    joined = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("lbl") != F.col("query_label"))
    )
    scored = joined.select(
        "query_id", "query_label",
        F.col(id_col).alias("neighbor_id"),
        F.col("lbl").alias("neighbor_label"),
        F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def hard_negative_topk_sql(
    table: str = "embeddings",
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_query_id: int = 10,
) -> str:
    return f"""
WITH emb AS (
  SELECT CAST({id_col} AS BIGINT) AS {id_col},
         CAST({vec_col} AS DOUBLE[]) AS v,
         CAST({label_col} AS BIGINT) AS lbl,
         sqrt(list_inner_product(CAST({vec_col} AS DOUBLE[]),
                                 CAST({vec_col} AS DOUBLE[]))) AS nrm
  FROM {table}
),
q AS (SELECT {id_col} AS query_id, v AS qv, nrm AS qnrm, lbl AS qlbl
      FROM emb WHERE {id_col} < {max_query_id}),
scored AS (
  SELECT q.query_id, q.qlbl AS query_label, e.{id_col} AS neighbor_id,
         e.lbl AS neighbor_label,
         round(CASE WHEN e.nrm * q.qnrm > 0
                    THEN list_inner_product(e.v, q.qv) / (e.nrm * q.qnrm)
                    ELSE 0.0 END, 6) AS cos_sim
  FROM emb e, q WHERE e.lbl != q.qlbl
)
SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def cosine_topk_sql(
    table: str = "embeddings",
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int = 10,
) -> str:
    """DuckDB oracle: double-cast lists + list_inner_product, identical
    round-then-rank ordering."""
    return f"""
WITH emb AS (
  SELECT CAST({id_col} AS BIGINT) AS {id_col},
         CAST({vec_col} AS DOUBLE[]) AS v,
         sqrt(list_inner_product(CAST({vec_col} AS DOUBLE[]),
                                 CAST({vec_col} AS DOUBLE[]))) AS nrm
  FROM {table}
),
q AS (SELECT {id_col} AS query_id, v AS qv, nrm AS qnrm FROM emb
      WHERE {id_col} < {max_query_id}),
scored AS (
  SELECT q.query_id, e.{id_col} AS neighbor_id,
         round(CASE WHEN e.nrm * q.qnrm > 0
                    THEN list_inner_product(e.v, q.qv) / (e.nrm * q.qnrm)
                    ELSE 0.0 END, 6) AS cos_sim
  FROM emb e, q WHERE e.{id_col} != q.query_id
)
SELECT query_id, neighbor_id, cos_sim,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def anchor_lsh_topk(
    embeddings: DataFrame,
    n_anchors: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int = 10,
    flip_bits: int = 0,
) -> DataFrame:
    """Bucketed ANN: sign-of-dot-product signature against the first
    ``n_anchors`` vectors; exact cosine re-rank within matching buckets.

    ``flip_bits=1`` enables multi-probe (Lv et al., VLDB 2007): each query
    additionally probes every bucket at Hamming distance 1 from its own
    signature (n_anchors extra probes), recovering the neighbors that a
    single near-boundary hyperplane sign flip would otherwise lose. The
    probe expansion is QUERY-side only — the data table is still scanned
    once and joined on the bucket key, so the candidate set grows by
    ~(1 + n_anchors) x bucket size while the shuffle stays keyed and
    balanced. Recall < 1 by design; raise flip_bits or n_anchors tables
    when recall matters.

    Returns the same schema as cosine_topk (rank may have < k rows per
    query when a bucket is small — that's the recall trade)."""
    if flip_bits not in (0, 1):
        raise ValueError("flip_bits must be 0 (single probe) or 1 (multi-probe)")
    emb = embeddings.select(
        F.col(id_col).cast("long").alias(id_col),
        to_double_array(vec_col).alias(vec_col),
    )
    anchors = [
        r[vec_col]
        for r in emb.filter(F.col(id_col) < n_anchors).orderBy(id_col).collect()
    ]
    sig = None
    for i, a in enumerate(anchors):
        avec = F.array(*[F.lit(float(x)) for x in a])
        bit = (dot(F.col(vec_col), avec) >= 0).cast("int")
        sig = bit if sig is None else sig * 2 + bit
    bucketed = emb.withColumn("bucket", sig)
    q = bucketed.filter(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    if flip_bits == 1:
        probe_set = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_anchors)
            ],
        )
        q = q.select(
            "query_id", "qvec", F.explode(probe_set).alias("qbucket")
        )
    joined = bucketed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col(id_col) != F.col("query_id")),
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    spark,
    embeddings: DataFrame,
    n_centroids: int = 8,
    n_probe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int = 10,
    init: str = "kmeans||",
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize vectors to K-means centroids,
    search only the ``n_probe`` nearest cells per query.

    The scale path for 100 TB: the cell assignment is one broadcast-centroid
    scan (no shuffle); the candidate join touches ~n_probe/n_centroids of the
    data. Uses the engine's own K-means learner as the coarse quantizer,
    seeded deterministically: ``init="kmeans||"`` (default) runs the
    Bahmani K-means|| oversampling seed over the bounded sample for
    better-balanced cells; ``init="first-k"`` is the legacy first-k-points
    seed. Recall < 1 by design; raise n_probe for recall, n_centroids for
    speed.
    """
    import numpy as np

    from ..learners import trainer
    from ..learners.kmeans import kmeans_parallel_init

    emb = embeddings.select(
        F.col(id_col).cast("long").alias(id_col),
        to_double_array(vec_col).alias(vec_col),
    )
    dim = len(emb.select(vec_col).first()[0])
    # coarse quantizer: mini-batch K-means on an id-ordered sample
    sample = (
        emb.orderBy(id_col).limit(1024)
        .select(F.col(vec_col).alias("features"), F.lit(0.0).alias("label"))
    )
    hyper = {"k": n_centroids}
    if init == "kmeans||":
        Xs = np.asarray([r[0] for r in sample.select("features").collect()])
        hyper["init_centroids"] = [
            [float(v) for v in c]
            for c in kmeans_parallel_init(Xs, n_centroids, seed=0)
        ]
    state = trainer.fit(
        sample, "K-means", dim=dim, hyper=hyper,
        num_partitions=1, order_cols=None,
    )
    cents = np.asarray(state["centroids"])

    cent_rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)]
    cent_df = spark.createDataFrame(cent_rows, "cell int, cvec array<double>")

    # cell assignment: argmin distance over broadcast centroids (JVM-side:
    # cross join with tiny centroid table + window min)
    from pyspark.sql import Window

    scored_cells = emb.crossJoin(F.broadcast(cent_df)).select(
        id_col, vec_col, "cell",
        (dot(vec_col, "cvec") * (-2)
         + dot("cvec", "cvec")).alias("dist_part"),  # ||x||^2 constant per row
    )
    w_assign = Window.partitionBy(id_col).orderBy("dist_part", "cell")
    assigned = (
        scored_cells.withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select(id_col, vec_col, "cell")
    )
    # per-query probe cells: the n_probe nearest centroids
    q = assigned.filter(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    q_cells = q.crossJoin(F.broadcast(cent_df)).select(
        "query_id", "qvec", "cell",
        (dot("qvec", "cvec") * (-2) + dot("cvec", "cvec")).alias("dist_part"),
    )
    w_probe = Window.partitionBy("query_id").orderBy("dist_part", "cell")
    probes = (
        q_cells.withColumn("rk", F.row_number().over(w_probe))
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "qvec", "cell")
    )
    # candidate search only within probed cells
    cand = assigned.join(F.broadcast(probes), "cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rank") <= k)
    )


def quantized_cosine_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k over the int8-QUANTIZED vectors
    (operators/corpus.quantize_embeddings) — the serving-path variant: 4x
    less scan bandwidth and an integer dot-product kernel, the reason the
    quantization step exists.

    Exactness: for symmetric per-vector quantization the scales cancel in
    the cosine — cos_q = dot_int(qa, qb) / (sqrt(ssq_a) * sqrt(ssq_b)) —
    so the score is integer sums (exact on any engine; every partial stays
    < 2^53) through ONE exact-rounded sqrt/divide sequence, rounded to 6
    decimals before ranking like cosine_topk. The top-k is a deterministic
    function of the table on any engine, making the approximation error of
    quantized-vs-float search *measurable* (compare against cosine_topk).

    Plan shape matches cosine_topk: broadcast queries, JVM-side fold, only
    (query, neighbor, score) shuffles into the per-query top-k window.
    """
    from .corpus import quantize_embeddings

    qe = quantize_embeddings(embeddings, id_col=id_col, vec_col=vec_col)
    zero = F.lit(0).cast("long")
    ssq = F.aggregate(
        F.col("qvec"), zero, lambda acc, x: acc + x.cast("long") * x.cast("long")
    )
    emb = qe.select(id_col, "qvec", ssq.alias("ssq"))
    q = emb.filter(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("qq"),
        F.col("ssq").alias("qssq"),
    )
    joined = emb.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    dot_int = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("qq"),
                   lambda x, y: x.cast("long") * y.cast("long")),
        zero, lambda acc, v: acc + v,
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            F.when(
                (F.col("ssq") > 0) & (F.col("qssq") > 0),
                dot_int.cast("double")
                / (F.sqrt(F.col("ssq").cast("double"))
                   * F.sqrt(F.col("qssq").cast("double"))),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def QUANTIZED_COSINE_TOPK_SQL(
    table: str = "embeddings",
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int = 10,
) -> str:
    from .corpus import QUANTIZE_EMBEDDINGS_SQL

    return f"""
WITH qe AS ({QUANTIZE_EMBEDDINGS_SQL(table, id_col, vec_col)}),
emb AS (
  SELECT {id_col}, qvec,
         list_inner_product(CAST(qvec AS DOUBLE[]),
                            CAST(qvec AS DOUBLE[])) AS ssq
  FROM qe
),
q AS (SELECT {id_col} AS query_id, qvec AS qq, ssq AS qssq FROM emb
      WHERE {id_col} < {max_query_id}),
scored AS (
  SELECT q.query_id, e.{id_col} AS neighbor_id,
         round(CASE WHEN e.ssq > 0 AND q.qssq > 0
                    THEN list_inner_product(CAST(e.qvec AS DOUBLE[]),
                                            CAST(q.qq AS DOUBLE[]))
                         / (sqrt(e.ssq) * sqrt(q.qssq))
                    ELSE 0.0 END, 6) AS cos_sim
  FROM emb e, q WHERE e.{id_col} != q.query_id
)
SELECT query_id, neighbor_id, cos_sim,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {k}
"""


# ---------------------------------------------------------------------------
# Exact Lloyd round over integer-quantized embeddings
# ---------------------------------------------------------------------------

def kmeans_assign_quantized(
    emb: DataFrame,
    k: int = 8,
    quant: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cluster ASSIGNMENT half of ``kmeans_round_quantized``:
    (vid, qv, cid) rows where cid is the integer-distance argmin over the
    k seed centroids with (dist, cid) tiebreak. Zero shuffle — per-row
    Catalyst over literal-folded centroids."""
    dim = len(emb.select(vec_col).first()[0])
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * quant, 0).cast("long"),
    )
    qe = emb.select(F.col(id_col).cast("long").alias("vid"), qv.alias("qv"))
    cents = sorted(
        qe.filter(F.col("vid") < k).collect(), key=lambda r: r["vid"]
    )
    dists = F.array(*[
        F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("qv"),
                    F.array(*[F.lit(int(c["qv"][i])) for i in range(dim)]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
            F.lit(int(c["vid"])).cast("long").alias("cid"),
        )
        for c in cents
    ])
    return qe.select(
        "vid", "qv", F.array_min(dists).getField("cid").alias("cid")
    )


def kmeans_round_quantized(
    emb: DataFrame,
    k: int = 8,
    quant: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ONE exact Lloyd iteration in integer space: the distributed k-means
    step every diversity-clustering / IVF-training pipeline runs, made
    hash-exact so it can be oracle-checked (float k-means never is —
    summation order changes centroids).

    * quantize: q_i = round(quant * x_i) — a global scale, so squared
      distances are plain BIGINT sums (commutative: any partial-agg order
      gives the same result, unlike float Lloyd).
    * seed centroids: the k lowest ids (deterministic, no RNG) — collected
      to the driver (k rows) and folded into the plan as literals, so
      assignment is a zero-join broadcast argmin with (dist, cid) tiebreak.
    * update: groupBy(cid) with per-dimension integer sums + count — the
      new centroid is sums/n, but the EXACT integers are what ships so the
      caller (and the oracle) can derive identical doubles.

    Scale: one shuffle total (the k-group agg, map-side combined); the
    argmin is per-row Catalyst over k×dim literals. For k beyond literal
    comfort (~thousands) switch the centroid side to a broadcast join.
    """
    dim = len(emb.select(vec_col).first()[0])
    assigned = kmeans_assign_quantized(
        emb, k=k, quant=quant, id_col=id_col, vec_col=vec_col
    )
    sums = [
        F.sum(F.element_at("qv", i + 1)).cast("long").alias(f"s{i}")
        for i in range(dim)
    ]
    agg = (
        assigned.groupBy("cid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_assigned"), *sums)
    )
    return agg.select(
        "cid",
        "n_assigned",
        F.array(*[F.col(f"s{i}") for i in range(dim)]).alias("centroid_sums_q"),
    )


def KMEANS_ASSIGN_CTES(k: int = 8, dim: int = 64, quant: int = 1_000_000,
                       table: str = "embeddings", id_col: str = "vec_id",
                       vec_col: str = "embedding") -> str:
    """WITH-clause body producing the exact assignment CTE (`assign`):
    shared between the Lloyd-round and cluster-profile oracles."""
    return f"""qe AS (
  SELECT CAST({id_col} AS BIGINT) AS vid,
         list_transform({vec_col},
                        x -> CAST(round(CAST(x AS DOUBLE) * {quant}, 0)
                                  AS BIGINT)) AS qv
  FROM {table}
),
cent AS (SELECT vid AS cid, qv AS cv FROM qe WHERE vid < {k}),
assign AS (
  SELECT e.vid, e.qv, c.cid
  FROM qe e CROSS JOIN cent c
  QUALIFY row_number() OVER (
    PARTITION BY e.vid
    ORDER BY list_sum(list_transform(range(1, {dim} + 1),
                      i -> (e.qv[i] - c.cv[i]) * (e.qv[i] - c.cv[i]))), c.cid
  ) = 1
)"""


def KMEANS_ROUND_SQL(k: int = 8, dim: int = 64, quant: int = 1_000_000,
                     table: str = "embeddings", id_col: str = "vec_id",
                     vec_col: str = "embedding") -> str:
    ctes = KMEANS_ASSIGN_CTES(k, dim, quant, table, id_col, vec_col)
    return f"""
WITH {ctes}
SELECT cid, CAST(count(*) AS BIGINT) AS n_assigned,
       [{", ".join(f"CAST(sum(qv[{i + 1}]) AS BIGINT)" for i in range(dim))}]
         AS centroid_sums_q
FROM assign GROUP BY cid
"""


def _kmeans_assign_to(qe: DataFrame, cents: dict[int, list[int]],
                      dim: int) -> DataFrame:
    """(vid, qv, cid) argmin assignment against explicit integer centroids
    (literal-folded; same (dist, cid) tiebreak as kmeans_assign_quantized)."""
    dists = F.array(*[
        F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("qv"),
                    F.array(*[F.lit(int(cv[i])) for i in range(dim)]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
            F.lit(int(cid)).cast("long").alias("cid"),
        )
        for cid, cv in sorted(cents.items())
    ])
    return qe.select("vid", "qv", F.array_min(dists).getField("cid").alias("cid"))


def kmeans_train_quantized(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 3,
    quant: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's algorithm to ``rounds`` iterations, EXACT: centroids are
    re-quantized to the integer grid every round with the floor-midpoint
    rule c' = floor((2*sum + n) / (2n)) — round-half-up in pure integer
    arithmetic — so every round's state is integers and any partial-agg
    order produces identical clusters (float Lloyd is summation-order
    chaos; quantized Lloyd is oracle-checkable end-to-end).

    Driver loop = BPE-trainer pattern (bpe_train_merges): each round is
    one distributed assign (zero-join broadcast argmin over k x dim
    literals) + ONE map-side-combined k-group agg; only k centroid rows
    (k*dim ints) ever reach the driver. The FINAL round stays in-plan:
    the update expression runs in Catalyst and empty clusters keep their
    previous centroid via a broadcast left join from the centroid table.

    Output: (cid, n_assigned, centroid_q) after ``rounds`` updates.

    floor((2s+n)/(2.0n)) in SQL doubles is exact here: fractional parts
    of the true rational are multiples of 1/(2n) >> double ulp at these
    magnitudes, so correct rounding can never cross the floor boundary —
    mirrored by Python's (2s+n)//(2n) on exact ints in the driver loop."""
    dim = len(emb.select(vec_col).first()[0])
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * quant, 0).cast("long"),
    )
    qe = emb.select(F.col(id_col).cast("long").alias("vid"), qv.alias("qv"))
    return kmeans_train_core(qe, k=k, rounds=rounds, dim=dim)


def kmeans_train_core(qe: DataFrame, k: int = 8, rounds: int = 3,
                      dim: int = 64) -> DataFrame:
    """The integer Lloyd's recurrence over an ALREADY-quantized
    (vid, qv bigint-array) frame — factored out so residual quantization
    can train its second level on integer residuals directly (the input
    needn't come from the float->grid quantizer)."""
    spark = qe.sparkSession
    seed_rows = sorted(
        qe.filter(F.col("vid") < k).collect(), key=lambda r: r["vid"]
    )
    cents = {int(r["vid"]): [int(x) for x in r["qv"]] for r in seed_rows}

    sums = [
        F.sum(F.element_at("qv", i + 1)).cast("long").alias(f"s{i}")
        for i in range(dim)
    ]
    for _ in range(rounds - 1):
        agg = (
            _kmeans_assign_to(qe, cents, dim)
            .groupBy("cid")
            .agg(F.count(F.lit(1)).cast("long").alias("n"), *sums)
        )
        stats = {
            int(r["cid"]): (int(r["n"]), [int(r[f"s{i}"]) for i in range(dim)])
            for r in agg.collect()
        }
        cents = {
            cid: (
                [(2 * s + stats[cid][0]) // (2 * stats[cid][0])
                 for s in stats[cid][1]]
                if cid in stats else cv
            )
            for cid, cv in cents.items()
        }

    agg = (
        _kmeans_assign_to(qe, cents, dim)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), *sums)
    )
    cent_df = spark.createDataFrame(
        [(cid, cv) for cid, cv in sorted(cents.items())],
        "cid long, prev_cv array<long>",
    )
    upd = F.transform(
        F.col("sv"),
        lambda s: F.floor(
            (F.lit(2).cast("long") * s + F.col("n"))
            / (F.lit(2.0) * F.col("n"))
        ).cast("long"),
    )
    return (
        cent_df.join(F.broadcast(agg), "cid", "left")
        .withColumn("sv", F.array(*[F.col(f"s{i}") for i in range(dim)]))
        .select(
            "cid",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_assigned"),
            F.when(F.col("n").isNull(), F.col("prev_cv"))
             .otherwise(upd).alias("centroid_q"),
        )
    )


def KMEANS_CORE_CTES(src: str, k: int = 8, rounds: int = 3, dim: int = 64,
                     prefix: str = "") -> list[str]:
    """The r-round integer k-means recurrence as flat CTEs over ANY
    source CTE ``src`` exposing (vid, qv) — the SQL twin of
    kmeans_train_core.  ``prefix`` namespaces the chain
    ({prefix}c0, {prefix}a0, ...) so two levels (residual quantization)
    can coexist in one WITH list."""
    p = prefix

    def assign(r):
        return f"""{p}a{r} AS (
  SELECT e.vid, e.qv, c.cid
  FROM {src} e CROSS JOIN {p}c{r} c
  QUALIFY row_number() OVER (
    PARTITION BY e.vid
    ORDER BY list_sum(list_transform(range(1, {dim} + 1),
                      i -> (e.qv[i] - c.cv[i]) * (e.qv[i] - c.cv[i]))), c.cid
  ) = 1
)"""

    def stats(r):
        return f"""{p}s{r} AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS n,
         [{", ".join(f"CAST(sum(qv[{i + 1}]) AS BIGINT)" for i in range(dim))}]
           AS sv
  FROM {p}a{r} GROUP BY cid
)"""

    def update(r):
        return f"""{p}c{r + 1} AS (
  SELECT p.cid,
         CASE WHEN s.n IS NULL THEN p.cv
              ELSE list_transform(range(1, {dim} + 1),
                     i -> CAST(floor((2 * s.sv[i] + s.n) / (2.0 * s.n))
                               AS BIGINT))
         END AS cv
  FROM {p}c{r} p LEFT JOIN {p}s{r} s ON s.cid = p.cid
)"""

    parts = [
        f"{p}c0 AS (SELECT vid AS cid, qv AS cv FROM {src} WHERE vid < {k})"
    ]
    for r in range(rounds):
        parts += [assign(r), stats(r), update(r)]
    return parts


def KMEANS_TRAIN_CTES(k: int = 8, rounds: int = 3, dim: int = 64,
                      quant: int = 1_000_000, table: str = "embeddings",
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> list[str]:
    """The r-round k-means recurrence as a FLAT ``name AS (body)`` CTE
    list (qe, c0, a0, s0, c1, ...) ending with the trained centroid
    table ``c{rounds}`` — flat so composed oracles (ANN_IVF_TRAINED_SQL)
    can splice it into one WITH list; the DuckDB binder mis-handles a
    nested WITH inside another statement's CTE member."""
    parts = [f"""qe AS (
  SELECT CAST({id_col} AS BIGINT) AS vid,
         list_transform({vec_col},
                        x -> CAST(round(CAST(x AS DOUBLE) * {quant}, 0)
                                  AS BIGINT)) AS qv
  FROM {table}
)"""]
    return parts + KMEANS_CORE_CTES("qe", k=k, rounds=rounds, dim=dim)


def KMEANS_TRAIN_SQL(k: int = 8, rounds: int = 3, dim: int = 64,
                     quant: int = 1_000_000, table: str = "embeddings",
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> str:
    """Generated r-round oracle: chained assign/stats/update CTEs, same
    floor-midpoint integer centroid rule."""
    parts = KMEANS_TRAIN_CTES(k=k, rounds=rounds, dim=dim, quant=quant,
                              table=table, id_col=id_col, vec_col=vec_col)
    joined = ",\n".join(parts)
    return f"""
WITH {joined}
SELECT c.cid, coalesce(s.n, CAST(0 AS BIGINT)) AS n_assigned,
       c.cv AS centroid_q
FROM c{rounds} c LEFT JOIN s{rounds - 1} s ON s.cid = c.cid
"""


def ivf_search_quantized(qe: DataFrame, cents: DataFrame,
                         n_probe: int = 4, topk: int = 5,
                         n_queries: int = 10) -> DataFrame:
    """The IVF restricted search over ANY integer centroid table — shared
    by the seed-centroid twin (ann_ivf_exact_topk) and the TRAINED-
    quantizer twin (ann_ivf_trained_topk): exact integer cell assignment
    (broadcast-centroid crossJoin + per-vector argmin window), each query
    probes its ``n_probe`` nearest cells, and the top-k squared-L2 search
    runs over probed cells only.  ``qe``: (vid, qv bigint-array);
    ``cents``: (cid, cv bigint-array), assumed tiny (broadcast).

    Scale shape: assignment cost is |corpus| x |cells| integer distance
    evals inside codegen; the candidate join touches ~n_probe/n_cells of
    the corpus — never all-pairs."""
    from pyspark.sql import Window

    d2 = F.expr(
        "aggregate(zip_with(qv, cv, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    scored = qe.crossJoin(F.broadcast(cents)).select(
        "vid", "qv", "cid", d2.alias("dc"))
    wv = Window.partitionBy("vid").orderBy("dc", "cid")
    assigned = (
        scored.withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") == 1).select("vid", "qv", "cid")
    )
    probes = (
        scored.filter(F.col("vid") < n_queries)
        .withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") <= n_probe)
        .select(F.col("vid").alias("query_id"), "cid",
                F.col("qv").alias("q_qv"))
    )
    dq = F.expr(
        "aggregate(zip_with(q_qv, qv, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    cand = (
        probes.join(assigned, "cid")
        .filter(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("neighbor_id"),
                dq.alias("d2"))
    )
    wq = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(wq).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id",
                F.col("d2").cast("long").alias("d2"), "rank")
    )


def ANN_IVF_TRAINED_SQL(n_cells: int = 16, rounds: int = 2,
                        n_probe: int = 4, topk: int = 5,
                        n_queries: int = 10, dim: int = 64,
                        quant: int = 1_000_000,
                        table: str = "embeddings", id_col: str = "vec_id",
                        vec_col: str = "embedding") -> str:
    """Oracle for IVF over TRAINED centroids: the full chained k-means
    recurrence (KMEANS_TRAIN_SQL) feeds the cell table, then the identical
    restricted search as _IVF_EXACT_SQL runs over it — index training and
    search plumbing pinned end-to-end in one query.  The trained-centroid
    CTE is MATERIALIZED (NOTES_r5: DuckDB inlines CTEs by default and a
    3x-referenced chained-round CTE explodes the plan)."""
    kparts = KMEANS_TRAIN_CTES(k=n_cells, rounds=rounds, dim=dim,
                               quant=quant, table=table, id_col=id_col,
                               vec_col=vec_col)
    # qe is re-referenced by every training round AND the search CTEs:
    # materialize it once (NOTES_r5: DuckDB inlines CTEs by default)
    kparts[0] = kparts[0].replace("qe AS (", "qe AS MATERIALIZED (", 1)
    joined = ",\n".join(kparts)  # defines qe + the chain ending in c{rounds}
    return f"""
WITH {joined},
tc AS MATERIALIZED (
  SELECT cid, cv FROM c{rounds}
),
assigned AS MATERIALIZED (
  SELECT e.vid, e.qv, c.cid
  FROM qe e CROSS JOIN tc c
  QUALIFY row_number() OVER (
    PARTITION BY e.vid
    ORDER BY list_sum(list_transform(range(1, {dim} + 1),
                      i -> (e.qv[i] - c.cv[i]) * (e.qv[i] - c.cv[i]))), c.cid
  ) = 1
),
probes AS MATERIALIZED (
  SELECT q.vid AS query_id, c.cid
  FROM (SELECT vid, qv FROM qe WHERE vid < {n_queries}) q
  CROSS JOIN tc c
  QUALIFY row_number() OVER (
    PARTITION BY q.vid
    ORDER BY list_sum(list_transform(range(1, {dim} + 1),
                      i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))), c.cid
  ) <= {n_probe}
),
cand AS (
  SELECT p.query_id, a.vid AS neighbor_id,
         list_sum(list_transform(range(1, {dim} + 1),
                  i -> (q.qv[i] - a.qv[i]) * (q.qv[i] - a.qv[i]))) AS d2
  FROM probes p
  JOIN assigned a ON a.cid = p.cid AND a.vid != p.query_id
  JOIN qe q ON q.vid = p.query_id
)
SELECT query_id, neighbor_id, CAST(d2 AS BIGINT) AS d2,
       CAST(rk AS BIGINT) AS rank
FROM (
  SELECT query_id, neighbor_id, d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY d2, neighbor_id) AS rk
  FROM cand
) WHERE rk <= {topk}
"""


def KMEANS_TRAIN_FLAT_SQL(k: int = 8, rounds: int = 3, dim: int = 64,
                          quant: int = 1_000_000, table: str = "embeddings",
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> str:
    """Driver-canonicalizable twin of KMEANS_TRAIN_SQL: the array
    ``centroid_q`` is exploded to one (cid, n_assigned, dim, q) row per
    coordinate — array cells are unsortable/unhashable in the driver's
    pandas canonicalizer, scalar rows are not (VERDICT r5 item 1)."""
    inner = KMEANS_TRAIN_SQL(k=k, rounds=rounds, dim=dim, quant=quant,
                             table=table, id_col=id_col, vec_col=vec_col)
    return f"""
SELECT base.cid, base.n_assigned, CAST(u.i AS BIGINT) AS dim,
       base.centroid_q[u.i + 1] AS q
FROM ({inner}) base
CROSS JOIN (SELECT unnest(range({dim})) AS i) u
"""


# ---------------------------------------------------------------------------
# Product quantization: subspace codebooks + ADC lookup-table search —
# the memory-bound scale path for embedding retrieval (Jegou et al.,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011).  A
# 64-dim float vector compresses to m single-byte codes; search never
# touches the raw vectors, only the code table joined against a tiny
# per-query distance LUT.  All state rides the same integer grid +
# floor-midpoint k-means recurrence as kmeans_train_quantized, so
# training AND search are hash-exact against generated DuckDB oracles.
# ---------------------------------------------------------------------------

def pq_subvectors(emb: DataFrame, m: int = 4, dim: int = 64,
                  quant: int = 1_000_000, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(vid, sub, sv): the quantized vector split into ``m`` contiguous
    subspaces of dim/m ints — one explode, no shuffle."""
    d = dim // m
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * quant, 0).cast("long"),
    )
    subs = F.array(*[
        F.struct(
            F.lit(s).cast("long").alias("sub"),
            F.slice(qv, s * d + 1, d).alias("sv"),
        )
        for s in range(m)
    ])
    return emb.select(
        F.col(id_col).cast("long").alias("vid"),
        F.explode(subs).alias("e"),
    ).select("vid", "e.sub", "e.sv")


def opq_dim_assignment(emb: DataFrame, m: int = 4, dim: int = 64,
                       quant: int = 1_000_000, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Variance-balanced dimension-to-subspace permutation — the
    eigenvalue-allocation baseline of OPQ (Ge et al., CVPR 2013 §4:
    balancing variance across subspaces is what the learned rotation
    buys; the free version is a permutation).  Per-dim variance is the
    EXACT integer proxy n*sum(q^2) - (sum q)^2 (= n^2 * var), dims are
    ranked by it, and rank r snakes into subspace r%m (even pass) /
    m-1-r%m (odd pass) at position r div m — so every subspace gets one
    dim per pass, alternating pick order, and total variance splits as
    evenly as a permutation can.

    Scale shape: one posexplode + a dim-keyed agg (map-side combined;
    key space = dim, not rows) + a window over the `dim` aggregate rows
    only.  Integer bound: n * sum(q^2) must stay under 2^63 — with
    |q| <= quant = 1e6 that is n^2 * 1e12 < 9.2e18, i.e. exact to ~3M
    vectors per training sample; beyond that, train the permutation on
    a fixed-size sample (the assignment is 64 rows either way).

    Output: (dim, sub, pos, var_q), all BIGINT, dim/pos 0-based."""
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * quant, 0).cast("long"),
    )
    st = (
        emb.select(F.posexplode(qv).alias("dim", "q"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("q").cast("long").alias("s1"),
            F.sum(F.col("q") * F.col("q")).cast("long").alias("s2"),
        )
    )
    w = Window.orderBy(F.desc("var_q"), "dim")
    r = F.row_number().over(w) - 1
    ranked = (
        st.select(
            F.col("dim").cast("long").alias("dim"),
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
            .alias("var_q"),
        )
        .withColumn("r", r)
    )
    p, j = F.floor(F.col("r") / m), F.col("r") % m
    return ranked.select(
        "dim",
        F.when(p % 2 == 0, j).otherwise(m - 1 - j)
         .cast("long").alias("sub"),
        p.cast("long").alias("pos"),
        "var_q",
    )


def opq_subvectors(emb: DataFrame, m: int = 4, dim: int = 64,
                   quant: int = 1_000_000, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   assign: DataFrame | None = None) -> DataFrame:
    """(vid, sub, sv) with the variance-balanced PERMUTED subspaces:
    the melt joins the broadcast 64-row dim->(sub, pos) map and gathers
    each subvector in pos order (array_sort over (pos, q) structs —
    pos is unique per (vid, sub), so the gather is deterministic
    regardless of collect_list order).  One explode + one keyed agg."""
    if assign is None:
        assign = opq_dim_assignment(emb, m=m, dim=dim, quant=quant,
                                    id_col=id_col, vec_col=vec_col)
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * quant, 0).cast("long"),
    )
    md = emb.select(
        F.col(id_col).cast("long").alias("vid"),
        F.posexplode(qv).alias("dim", "q"),
    )
    gathered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "q"))), lambda s: s.q
    )
    return (
        md.join(F.broadcast(assign.select("dim", "sub", "pos")), "dim")
        .groupBy("vid", "sub")
        .agg(gathered.alias("sv"))
    )


def pq_train_quantized(emb: DataFrame, m: int = 4, k: int = 16,
                       rounds: int = 2, dim: int = 64,
                       quant: int = 1_000_000, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       subvec: DataFrame | None = None) -> DataFrame:
    """Per-subspace Lloyd's to ``rounds`` iterations, EXACT: every
    subspace trains its own k codewords with the identical integer
    floor-midpoint rule as kmeans_train_quantized, but ALL m subspaces
    ride ONE DataFrame keyed (sub, cid) — one assignment join + one
    map-side-combined (sub, cid) agg per round, never m separate jobs.
    Seeds: vector s of the first k vectors per subspace.  Only m*k
    codeword rows reach the driver per round (m=4, k=16 -> 64 rows).

    Output: (sub, cid, n_assigned, codeword_q) after ``rounds`` updates
    (final update in-plan, empty cells keep their previous codeword).
    ``subvec`` overrides the contiguous-slice melt with a caller-built
    (vid, sub, sv) frame — the OPQ permuted-subspace hook."""
    spark = emb.sparkSession
    d = dim // m
    sv = (pq_subvectors(emb, m=m, dim=dim, quant=quant, id_col=id_col,
                        vec_col=vec_col)
          if subvec is None else subvec).localCheckpoint()

    def assign_to(cent_df):
        d2 = F.expr(
            "aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)),"
            " 0L, (acc, x) -> acc + x)"
        )
        w = Window.partitionBy("vid", "sub").orderBy("d2", "cid")
        return (
            sv.join(F.broadcast(cent_df), "sub")
            .select("vid", "sub", "sv", "cid", d2.alias("d2"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vid", "sub", "sv", "cid")
        )

    def cent_frame(cents):
        return spark.createDataFrame(
            [(s, c, v) for (s, c), v in sorted(cents.items())],
            "sub long, cid long, cv array<long>",
        )

    seed_rows = sv.filter(F.col("vid") < k).collect()
    cents = {(int(r["sub"]), int(r["vid"])): [int(x) for x in r["sv"]]
             for r in seed_rows}

    sums = [
        F.sum(F.element_at("sv", i + 1)).cast("long").alias(f"s{i}")
        for i in range(d)
    ]
    for _ in range(rounds - 1):
        agg = (
            assign_to(cent_frame(cents))
            .groupBy("sub", "cid")
            .agg(F.count(F.lit(1)).cast("long").alias("n"), *sums)
        )
        stats = {
            (int(r["sub"]), int(r["cid"])): (
                int(r["n"]), [int(r[f"s{i}"]) for i in range(d)]
            )
            for r in agg.collect()
        }
        cents = {
            key: (
                [(2 * s + stats[key][0]) // (2 * stats[key][0])
                 for s in stats[key][1]]
                if key in stats else cv
            )
            for key, cv in cents.items()
        }

    agg = (
        assign_to(cent_frame(cents))
        .groupBy("sub", "cid")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), *sums)
    )
    prev = cent_frame(cents).withColumnRenamed("cv", "prev_cv")
    upd = F.transform(
        F.col("svec"),
        lambda s: F.floor(
            (F.lit(2).cast("long") * s + F.col("n"))
            / (F.lit(2.0) * F.col("n"))
        ).cast("long"),
    )
    return (
        prev.join(F.broadcast(agg), ["sub", "cid"], "left")
        .withColumn("svec", F.array(*[F.col(f"s{i}") for i in range(d)]))
        .select(
            "sub", "cid",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_assigned"),
            F.when(F.col("n").isNull(), F.col("prev_cv"))
             .otherwise(upd).alias("codeword_q"),
        )
    )


def ann_pq_adc_topk(emb: DataFrame, m: int = 4, k: int = 16,
                    rounds: int = 2, n_queries: int = 10, topk: int = 5,
                    dim: int = 64, quant: int = 1_000_000,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    subvec: DataFrame | None = None) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the corpus is
    ENCODED once (argmin codeword per (vector, subspace) — N*m small
    ints), each query precomputes its distance to every codeword (an
    n_queries x m x k LUT — 640 rows here), and the search is the code
    table joined against the BROADCAST LUT + a (query, neighbor) sum —
    linear in N, zero access to raw vectors at query time.  This is the
    shape that serves 100 TB of embeddings from RAM: 64B codes instead
    of 256B floats, and the scan is an integer add per (code, query).

    Distances are exact integer sums, so ranking (tie-break neighbor_id)
    is engine-identical; the oracle chains training + encoding + the LUT
    join in one flattened CTE pipeline (ANN_PQ_ADC_SQL)."""
    d2 = F.expr(
        "aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    sv = (pq_subvectors(emb, m=m, dim=dim, quant=quant, id_col=id_col,
                        vec_col=vec_col)
          if subvec is None else subvec).localCheckpoint()
    books = (
        pq_train_quantized(emb, m=m, k=k, rounds=rounds, dim=dim,
                           quant=quant, id_col=id_col, vec_col=vec_col,
                           subvec=sv)
        .select("sub", "cid", F.col("codeword_q").alias("cv"))
        .localCheckpoint()
    )
    w = Window.partitionBy("vid", "sub").orderBy("d2", "cid")
    codes = (
        sv.join(F.broadcast(books), "sub")
        .select("vid", "sub", "cid", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vid", "sub", "cid")
    )
    lut = (
        sv.filter(F.col("vid") < n_queries)
        .join(F.broadcast(books), "sub")
        .select(F.col("vid").alias("query_id"), "sub", "cid",
                d2.alias("d2"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["sub", "cid"])
        .filter(F.col("vid") != F.col("query_id"))
        .groupBy("query_id", F.col("vid").alias("neighbor_id"))
        .agg(F.sum("d2").cast("long").alias("adc_d2"))
    )
    wq = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(wq).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "adc_d2", "rank")
    )


def OPQ_ASSIGN_PARTS(m: int = 4) -> list[str]:
    """Flat CTE parts for the variance-balanced snake permutation over
    the quantized melt: opq_md (vid, dim, q), opq_st (per-dim integer
    moment sums), opq_map (dim -> sub, pos, var_q).  Expects pq_qe in
    scope (the quantized-vector CTE from PQ_TRAIN_CTES)."""
    return [
        """opq_md AS MATERIALIZED (
  SELECT vid, gs - 1 AS dim, q
  FROM (SELECT vid, unnest(qv) AS q, generate_subscripts(qv, 1) AS gs
        FROM pq_qe)
)""",
        """opq_st AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS s1,
         CAST(sum(q * q) AS BIGINT) AS s2
  FROM opq_md GROUP BY dim
)""",
        f"""opq_map AS (
  SELECT CAST(dim AS BIGINT) AS dim, var_q,
         CAST(CASE WHEN (r // {m}) % 2 = 0 THEN r % {m}
              ELSE {m} - 1 - (r % {m}) END AS BIGINT) AS sub,
         CAST(r // {m} AS BIGINT) AS pos
  FROM (
    SELECT dim, n * s2 - s1 * s1 AS var_q,
           row_number() OVER (ORDER BY n * s2 - s1 * s1 DESC, dim) - 1 AS r
    FROM opq_st
  )
)""",
    ]


def OPQ_ASSIGN_SQL(m: int = 4, quant: int = 1_000_000,
                   table: str = "embeddings", id_col: str = "vec_id",
                   vec_col: str = "embedding") -> str:
    """Standalone (dim, sub, pos, var_q) oracle for opq_dim_assignment."""
    qe = f"""pq_qe AS (
  SELECT CAST({id_col} AS BIGINT) AS vid,
         list_transform({vec_col},
                        x -> CAST(round(CAST(x AS DOUBLE) * {quant}, 0)
                                  AS BIGINT)) AS qv
  FROM {table}
)"""
    joined = ",\n".join([qe] + OPQ_ASSIGN_PARTS(m))
    return f"""
WITH {joined}
SELECT dim, sub, pos, var_q FROM opq_map
"""


def PQ_TRAIN_CTES(m: int = 4, k: int = 16, rounds: int = 2,
                  dim: int = 64, quant: int = 1_000_000,
                  table: str = "embeddings", id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  opq: bool = False) -> list[str]:
    """Flat CTE list for the per-subspace codebook recurrence: pv (the
    subvector melt), p0, pa0, ps0, p1, ... ending in p{rounds} =
    (sub, cid, cv).  Same flattening rationale as KMEANS_TRAIN_CTES.
    ``opq=True`` swaps the contiguous-slice melt for the
    variance-balanced snake permutation (OPQ_ASSIGN_PARTS), gathering
    each subvector in pos order."""
    d = dim // m
    melt = " UNION ALL ".join(
        f"SELECT vid, CAST({s} AS BIGINT) AS sub,"
        f" qv[{s * d + 1}:{(s + 1) * d}] AS sv FROM pq_qe"
        for s in range(m)
    )
    if opq:
        melt = """SELECT md.vid, mp.sub, list(md.q ORDER BY mp.pos) AS sv
  FROM opq_md md JOIN opq_map mp ON mp.dim = md.dim
  GROUP BY md.vid, mp.sub"""

    def dist(e, c):
        return (f"list_sum(list_transform(range(1, {d} + 1),"
                f" i -> ({e}.sv[i] - {c}.cv[i]) * ({e}.sv[i] - {c}.cv[i])))")

    def assign(r):
        return f"""pa{r} AS (
  SELECT e.vid, e.sub, e.sv, c.cid
  FROM pv e JOIN p{r} c ON c.sub = e.sub
  QUALIFY row_number() OVER (
    PARTITION BY e.vid, e.sub ORDER BY {dist('e', 'c')}, c.cid
  ) = 1
)"""

    def stats(r):
        return f"""ps{r} AS (
  SELECT sub, cid, CAST(count(*) AS BIGINT) AS n,
         [{", ".join(f"CAST(sum(sv[{i + 1}]) AS BIGINT)" for i in range(d))}]
           AS svec
  FROM pa{r} GROUP BY sub, cid
)"""

    def update(r):
        return f"""p{r + 1} AS (
  SELECT p.sub, p.cid,
         CASE WHEN s.n IS NULL THEN p.cv
              ELSE list_transform(range(1, {d} + 1),
                     i -> CAST(floor((2 * s.svec[i] + s.n) / (2.0 * s.n))
                               AS BIGINT))
         END AS cv
  FROM p{r} p LEFT JOIN ps{r} s ON s.sub = p.sub AND s.cid = p.cid
)"""

    parts = [f"""pq_qe AS MATERIALIZED (
  SELECT CAST({id_col} AS BIGINT) AS vid,
         list_transform({vec_col},
                        x -> CAST(round(CAST(x AS DOUBLE) * {quant}, 0)
                                  AS BIGINT)) AS qv
  FROM {table}
)"""]
    if opq:
        parts += OPQ_ASSIGN_PARTS(m)
    parts += [
        f"pv AS MATERIALIZED ({melt})",
        f"p0 AS (SELECT sub, vid AS cid, sv AS cv FROM pv WHERE vid < {k})"]
    for r in range(rounds):
        parts += [assign(r), stats(r), update(r)]
    return parts


def PQ_TRAIN_FLAT_SQL(m: int = 4, k: int = 16, rounds: int = 2,
                      dim: int = 64, quant: int = 1_000_000,
                      table: str = "embeddings", id_col: str = "vec_id",
                      vec_col: str = "embedding", opq: bool = False) -> str:
    """Codebook training oracle in driver-canonicalizable shape: one
    (sub, cid, n_assigned, dim, q) row per codeword coordinate."""
    d = dim // m
    parts = PQ_TRAIN_CTES(m=m, k=k, rounds=rounds, dim=dim, quant=quant,
                          table=table, id_col=id_col, vec_col=vec_col,
                          opq=opq)
    joined = ",\n".join(parts)
    return f"""
WITH {joined}
SELECT c.sub, c.cid,
       coalesce(s.n, CAST(0 AS BIGINT)) AS n_assigned,
       CAST(u.i AS BIGINT) AS dim, c.cv[u.i + 1] AS q
FROM p{rounds} c
LEFT JOIN ps{rounds - 1} s ON s.sub = c.sub AND s.cid = c.cid
CROSS JOIN (SELECT unnest(range({d})) AS i) u
"""


def ANN_PQ_ADC_SQL(m: int = 4, k: int = 16, rounds: int = 2,
                   n_queries: int = 10, topk: int = 5, dim: int = 64,
                   quant: int = 1_000_000, table: str = "embeddings",
                   id_col: str = "vec_id",
                   vec_col: str = "embedding", opq: bool = False) -> str:
    """Training -> encoding -> LUT -> ADC ranking as ONE flattened CTE
    pipeline (the search twin of PQ_TRAIN_FLAT_SQL)."""
    d = dim // m
    parts = PQ_TRAIN_CTES(m=m, k=k, rounds=rounds, dim=dim, quant=quant,
                          table=table, id_col=id_col, vec_col=vec_col,
                          opq=opq)
    joined = ",\n".join(parts)

    def dist(e, c):
        return (f"list_sum(list_transform(range(1, {d} + 1),"
                f" i -> ({e}.sv[i] - {c}.cv[i]) * ({e}.sv[i] - {c}.cv[i])))")

    return f"""
WITH {joined},
codes AS MATERIALIZED (
  SELECT e.vid, e.sub, c.cid
  FROM pv e JOIN p{rounds} c ON c.sub = e.sub
  QUALIFY row_number() OVER (
    PARTITION BY e.vid, e.sub ORDER BY {dist('e', 'c')}, c.cid
  ) = 1
),
lut AS MATERIALIZED (
  SELECT q.vid AS query_id, c.sub, c.cid, {dist('q', 'c')} AS d2
  FROM pv q JOIN p{rounds} c ON c.sub = q.sub
  WHERE q.vid < {n_queries}
),
adc AS (
  SELECT l.query_id, co.vid AS neighbor_id,
         CAST(sum(l.d2) AS BIGINT) AS adc_d2
  FROM codes co JOIN lut l ON l.sub = co.sub AND l.cid = co.cid
  WHERE co.vid != l.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_d2, CAST(rk AS BIGINT) AS rank
FROM (
  SELECT query_id, neighbor_id, adc_d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_d2, neighbor_id) AS rk
  FROM adc
) WHERE rk <= {topk}
"""


def pq_distortion_report(emb: DataFrame, m: int = 4, k: int = 16,
                         rounds: int = 2, dim: int = 64,
                         quant: int = 1_000_000, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         subvec: DataFrame | None = None) -> DataFrame:
    """Per-subspace quantization distortion — the index-quality report
    that tells you whether PQ's compression is costing recall BEFORE you
    serve it: for every (vector, subspace) the distance to its nearest
    codeword, aggregated per subspace.  Two keyed aggs after the
    broadcast assignment join (min per (vid, sub), then the sub rollup)
    — no window, no shuffle of raw vectors.  avg is integer
    floor-division so the report is engine-exact at any scale (a double
    mean would exceed 2^53 exactness on large corpora)."""
    sv = (pq_subvectors(emb, m=m, dim=dim, quant=quant, id_col=id_col,
                        vec_col=vec_col)
          if subvec is None else subvec)
    books = (
        pq_train_quantized(emb, m=m, k=k, rounds=rounds, dim=dim,
                           quant=quant, id_col=id_col, vec_col=vec_col,
                           subvec=sv)
        .select("sub", "cid", F.col("codeword_q").alias("cv"))
        .localCheckpoint()
    )
    d2 = F.expr(
        "aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    best = (
        sv.join(F.broadcast(books), "sub")
        .select("vid", "sub", d2.alias("d2"))
        .groupBy("vid", "sub")
        .agg(F.min("d2").alias("best_d2"))
    )
    return (
        best.groupBy("sub")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.sum("best_d2").cast("long").alias("total_d2"),
        )
        .select(
            "sub", "n_vectors", "total_d2",
            F.expr("total_d2 div n_vectors").alias("avg_d2"),
        )
    )


def PQ_DISTORTION_SQL(m: int = 4, k: int = 16, rounds: int = 2,
                      dim: int = 64, quant: int = 1_000_000,
                      table: str = "embeddings", id_col: str = "vec_id",
                      vec_col: str = "embedding") -> str:
    d = dim // m
    parts = PQ_TRAIN_CTES(m=m, k=k, rounds=rounds, dim=dim, quant=quant,
                          table=table, id_col=id_col, vec_col=vec_col)
    joined = ",\n".join(parts)
    return f"""
WITH {joined},
pbest AS (
  SELECT e.vid, e.sub,
         min(list_sum(list_transform(range(1, {d} + 1),
             i -> (e.sv[i] - c.cv[i]) * (e.sv[i] - c.cv[i])))) AS best_d2
  FROM pv e JOIN p{rounds} c ON c.sub = e.sub
  GROUP BY 1, 2
)
SELECT sub, CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(best_d2) AS BIGINT) AS total_d2,
       CAST(sum(best_d2) AS BIGINT) // CAST(count(*) AS BIGINT) AS avg_d2
FROM pbest GROUP BY sub
"""


def opq_vs_pq_distortion(emb: DataFrame, m: int = 4, k: int = 16,
                         rounds: int = 2, dim: int = 64,
                         quant: int = 1_000_000, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Head-to-head quantization-error ledger (review r12 depth — the
    Ge et al. CVPR 2013 comparison the OPQ family exists to win): the
    SAME corpus, codebook budget, and training recurrence, once over
    contiguous PQ subspaces and once over the variance-balanced snake
    permutation; one row per variant with

        (variant, n_vectors, total_d2, avg_d2)

    where total_d2 is the exact integer SSE to the nearest codeword
    summed over every (vector, subspace).  avg_d2(opq) vs avg_d2(pq)
    IS the decision to pay the permutation at ingest — the companion
    number to ivf_recall_report's recall@k.  Everything integer-exact
    (same envelope as pq_distortion_report); scale shape is two runs
    of the same broadcast-assignment + keyed-min aggregation."""
    frames = []
    for variant in ("pq", "opq"):
        sv = (opq_subvectors(emb, m=m, dim=dim, quant=quant, id_col=id_col,
                             vec_col=vec_col)
              if variant == "opq" else None)
        rep = pq_distortion_report(emb, m=m, k=k, rounds=rounds, dim=dim,
                                   quant=quant, id_col=id_col,
                                   vec_col=vec_col, subvec=sv)
        frames.append(
            rep.agg(
                F.max("n_vectors").cast("long").alias("n_vectors"),
                F.sum("total_d2").cast("long").alias("total_d2"),
            ).select(
                F.lit(variant).alias("variant"), "n_vectors", "total_d2",
                F.expr("CAST(total_d2 div n_vectors AS BIGINT)")
                .alias("avg_d2"),
            )
        )
    return frames[0].unionByName(frames[1])


def OPQ_VS_PQ_SQL(m: int = 4, k: int = 16, rounds: int = 2,
                  dim: int = 64, quant: int = 1_000_000,
                  table: str = "embeddings", id_col: str = "vec_id",
                  vec_col: str = "embedding") -> str:
    """Oracle for opq_vs_pq_distortion: each variant's full
    train+assign chain lives in its own subquery-scoped WITH (the CTE
    names collide otherwise), rolled up to one row and unioned."""
    d = dim // m

    def one(variant: str, opq: bool) -> str:
        parts = PQ_TRAIN_CTES(m=m, k=k, rounds=rounds, dim=dim,
                              quant=quant, table=table, id_col=id_col,
                              vec_col=vec_col, opq=opq)
        joined = ",\n".join(parts)
        return f"""SELECT '{variant}' AS variant, n_vectors, total_d2,
       CAST(total_d2 // n_vectors AS BIGINT) AS avg_d2
FROM (
  WITH {joined},
  pbest AS (
    SELECT e.vid, e.sub,
           min(list_sum(list_transform(range(1, {d} + 1),
               i -> (e.sv[i] - c.cv[i]) * (e.sv[i] - c.cv[i])))) AS best_d2
    FROM pv e JOIN p{rounds} c ON c.sub = e.sub
    GROUP BY 1, 2
  )
  SELECT CAST(count(DISTINCT vid) AS BIGINT) AS n_vectors,
         CAST(sum(best_d2) AS BIGINT) AS total_d2
  FROM pbest
) t"""

    return one("pq", False) + "\nUNION ALL\n" + one("opq", True)


def dedup_pq_block_pairs(emb: DataFrame, m: int = 4, k: int = 16,
                         rounds: int = 2, block_subs: int = 2,
                         dim: int = 64, quant: int = 1_000_000,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup CANDIDATE GENERATION by PQ-code collision —
    the coarse-quantizer blocking scheme (FAISS-style): two vectors are
    candidates iff their first ``block_subs`` PQ codes agree (k^b cells,
    so the self-join is quadratic only within a cell, like LSH bands but
    with TRAINED, data-adaptive cells), then every candidate pair is
    verified with the exact integer squared-L2 on the full vectors.
    Output: (id_a, id_b, d2) per colliding pair.

    Scale shape: encode is the broadcast codebook join; the pair join is
    an equi-join on the code signature; exact verification touches only
    survivors.  Everything integer -> the oracle chains training +
    encoding + blocking + verification in one CTE pipeline."""
    sv = pq_subvectors(emb, m=m, dim=dim, quant=quant, id_col=id_col,
                       vec_col=vec_col).localCheckpoint()
    books = (
        pq_train_quantized(emb, m=m, k=k, rounds=rounds, dim=dim,
                           quant=quant, id_col=id_col, vec_col=vec_col)
        .select("sub", "cid", F.col("codeword_q").alias("cv"))
        .localCheckpoint()
    )
    d2c = F.expr(
        "aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("vid", "sub").orderBy("d2", "cid")
    codes = (
        sv.filter(F.col("sub") < block_subs)
        .join(F.broadcast(books), "sub")
        .select("vid", "sub", "cid", d2c.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("vid")
        .agg(F.concat_ws(
            ",", *[F.max(F.when(F.col("sub") == s, F.col("cid")))
                   for s in range(block_subs)]).alias("sig"))
    )
    qe = emb.select(
        F.col(id_col).cast("long").alias("vid"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * quant, 0).cast("long"),
        ).alias("qv"),
    )
    a = codes.join(qe, "vid").select(
        F.col("vid").alias("id_a"), F.col("qv").alias("qa"), "sig")
    b = codes.join(qe, "vid").select(
        F.col("vid").alias("id_b"), F.col("qv").alias("qb"), "sig")
    pair_d2 = F.expr(
        "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, x) -> acc + x)"
    )
    return (
        a.join(b, "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", pair_d2.alias("d2"))
    )


def DEDUP_PQ_BLOCK_SQL(m: int = 4, k: int = 16, rounds: int = 2,
                       block_subs: int = 2, dim: int = 64,
                       quant: int = 1_000_000, table: str = "embeddings",
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> str:
    d = dim // m
    parts = PQ_TRAIN_CTES(m=m, k=k, rounds=rounds, dim=dim, quant=quant,
                          table=table, id_col=id_col, vec_col=vec_col)
    joined = ",\n".join(parts)

    def dist(e, c):
        return (f"list_sum(list_transform(range(1, {d} + 1),"
                f" i -> ({e}.sv[i] - {c}.cv[i]) * ({e}.sv[i] - {c}.cv[i])))")

    sig = " || ',' || ".join(
        f"CAST(max(CASE WHEN sub = {s} THEN cid END) AS VARCHAR)"
        for s in range(block_subs)
    )
    return f"""
WITH {joined},
bcodes AS MATERIALIZED (
  SELECT e.vid, e.sub, c.cid
  FROM pv e JOIN p{rounds} c ON c.sub = e.sub
  WHERE e.sub < {block_subs}
  QUALIFY row_number() OVER (
    PARTITION BY e.vid, e.sub ORDER BY {dist('e', 'c')}, c.cid
  ) = 1
),
sigs AS MATERIALIZED (
  SELECT vid, {sig} AS sig FROM bcodes GROUP BY vid
)
SELECT a.vid AS id_a, b.vid AS id_b,
       CAST(list_sum(list_transform(range(1, {dim} + 1),
            i -> (qa.qv[i] - qb.qv[i]) * (qa.qv[i] - qb.qv[i])))
            AS BIGINT) AS d2
FROM sigs a
JOIN sigs b ON a.sig = b.sig AND a.vid < b.vid
JOIN pq_qe qa ON qa.vid = a.vid
JOIN pq_qe qb ON qb.vid = b.vid
"""


def pq_encode_wide(vectors: DataFrame, books: DataFrame, m: int = 4,
                   dim: int = 64, quant: int = 1_000_000,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Encode vectors against FIXED codebooks -> one wide row per vector
    (vec_id, c0..c{m-1}): the steady-state ingest shape — codebooks are a
    static broadcast index, encoding is stateless per vector, so the same
    call serves batch backfill and per-micro-batch streaming ingest."""
    sv = pq_subvectors(vectors, m=m, dim=dim, quant=quant, id_col=id_col,
                       vec_col=vec_col)
    d2 = F.expr(
        "aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("vid", "sub").orderBy("d2", "cid")
    codes = (
        sv.join(F.broadcast(books), "sub")
        .select("vid", "sub", "cid", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return codes.groupBy(F.col("vid").alias(id_col)).agg(*[
        F.max(F.when(F.col("sub") == s, F.col("cid"))).cast("long")
        .alias(f"c{s}")
        for s in range(m)
    ])


def PQ_ENCODE_WIDE_SQL(m: int = 4, k: int = 16, rounds: int = 2,
                       dim: int = 64, quant: int = 1_000_000,
                       table: str = "embeddings", id_col: str = "vec_id",
                       vec_col: str = "embedding") -> str:
    """Batch oracle for the wide encode: training CTEs + argmin codes +
    the per-vector pivot."""
    d = dim // m
    parts = PQ_TRAIN_CTES(m=m, k=k, rounds=rounds, dim=dim, quant=quant,
                          table=table, id_col=id_col, vec_col=vec_col)
    joined = ",\n".join(parts)

    def dist(e, c):
        return (f"list_sum(list_transform(range(1, {d} + 1),"
                f" i -> ({e}.sv[i] - {c}.cv[i]) * ({e}.sv[i] - {c}.cv[i])))")

    wide = ", ".join(
        f"CAST(max(CASE WHEN sub = {s} THEN cid END) AS BIGINT) AS c{s}"
        for s in range(m)
    )
    return f"""
WITH {joined},
codes AS (
  SELECT e.vid, e.sub, c.cid
  FROM pv e JOIN p{rounds} c ON c.sub = e.sub
  QUALIFY row_number() OVER (
    PARTITION BY e.vid, e.sub ORDER BY {dist('e', 'c')}, c.cid
  ) = 1
)
SELECT vid AS {id_col}, {wide} FROM codes GROUP BY vid
"""


# ---------------------------------------------------------------------------
# Residual quantization (two-level): the additive-codebook alternative to
# product quantization (Chen et al., "Approximate Nearest Neighbor Search
# by Residual Vector Quantization", Sensors 2010; the RQ/IVFADC family) —
# level 1 coarsely quantizes the vector, level 2 quantizes what level 1
# missed, and reconstruction is the SUM of one codeword per level.  Both
# levels ride the same integer floor-midpoint recurrence, so training,
# encoding, and the ADC search are hash-exact end-to-end.
# ---------------------------------------------------------------------------

def rq_train_encode(emb: DataFrame, k1: int = 16, k2: int = 16,
                    rounds: int = 2, dim: int = 64,
                    quant: int = 1_000_000, id_col: str = "vec_id",
                    vec_col: str = "embedding"):
    """Train both RQ levels and encode the corpus.  Returns
    (codes, cents1, cents2): codes = (vid, cid1, cid2); cents1/cents2 =
    (cid, cv) integer codebooks (localCheckpointed — tiny).

    Level 2 trains on the integer residuals qv - cv1 of each vector's
    level-1 assignment (seeds: residuals of the first k2 vids), via the
    factored kmeans_train_core — no float path anywhere after the
    initial grid quantization."""
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * quant, 0).cast("long"),
    )
    qe = emb.select(
        F.col(id_col).cast("long").alias("vid"), qv.alias("qv")
    ).localCheckpoint()
    cents1 = (
        kmeans_train_core(qe, k=k1, rounds=rounds, dim=dim)
        .select("cid", F.col("centroid_q").alias("cv"))
        .localCheckpoint()
    )
    d2 = F.expr(
        "aggregate(zip_with(qv, cv, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("vid").orderBy("d2", "cid")
    a1 = (
        qe.crossJoin(F.broadcast(cents1))
        .select("vid", "qv", "cid", "cv", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    resid = a1.select(
        "vid",
        F.expr("zip_with(qv, cv, (a, b) -> a - b)").alias("qv"),
        F.col("cid").alias("cid1"),
    ).localCheckpoint()
    cents2 = (
        kmeans_train_core(resid.select("vid", "qv"), k=k2, rounds=rounds,
                          dim=dim)
        .select("cid", F.col("centroid_q").alias("cv"))
        .localCheckpoint()
    )
    a2 = (
        resid.crossJoin(F.broadcast(cents2))
        .select("vid", "cid1", F.col("cid"), d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    codes = a2.select("vid", "cid1", F.col("cid").alias("cid2"))
    return codes, cents1, cents2, qe


def ann_rq_adc_topk(emb: DataFrame, k1: int = 16, k2: int = 16,
                    rounds: int = 2, n_queries: int = 10, topk: int = 5,
                    dim: int = 64, quant: int = 1_000_000,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """ADC top-k over two-level RQ codes: each query precomputes its
    distance to every RECONSTRUCTION c1+c2 (an n_queries x k1 x k2 LUT —
    2560 rows here), and the search is the (vid, cid1, cid2) code table
    joined against the BROADCAST LUT — one integer lookup per corpus
    vector, raw vectors untouched at query time.  Versus PQ the codes
    are coupled (additive, full-dimension), so at equal bits RQ spends
    them on the vector's actual error direction instead of fixed
    subspaces.  Ranking ties break on neighbor_id; the oracle chains
    both training levels + encoding + the LUT join (ANN_RQ_ADC_SQL)."""
    codes, cents1, cents2, qe = rq_train_encode(
        emb, k1=k1, k2=k2, rounds=rounds, dim=dim, quant=quant,
        id_col=id_col, vec_col=vec_col)
    recon_d2 = F.expr(
        "aggregate(zip_with(qv, recon, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    lut = (
        qe.filter(F.col("vid") < n_queries)
        .crossJoin(F.broadcast(
            cents1.select(F.col("cid").alias("cid1"),
                          F.col("cv").alias("cv1"))))
        .crossJoin(F.broadcast(
            cents2.select(F.col("cid").alias("cid2"),
                          F.col("cv").alias("cv2"))))
        .select(
            F.col("vid").alias("query_id"), "cid1", "cid2",
            F.expr("zip_with(cv1, cv2, (a, b) -> a + b)").alias("recon"),
            "qv",
        )
        .select("query_id", "cid1", "cid2", recon_d2.alias("d2"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["cid1", "cid2"])
        .filter(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("neighbor_id"),
                F.col("d2").alias("adc_d2"))
    )
    wq = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(wq).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id",
                F.col("adc_d2").cast("long").alias("adc_d2"), "rank")
    )


def ANN_RQ_ADC_SQL(k1: int = 16, k2: int = 16, rounds: int = 2,
                   n_queries: int = 10, topk: int = 5, dim: int = 64,
                   quant: int = 1_000_000, table: str = "embeddings",
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> str:
    """Both RQ levels + encoding + LUT ranking as ONE flattened CTE
    pipeline (level 2's chain rides KMEANS_CORE_CTES with prefix 'r'
    over the residual CTE)."""
    def dist(a, b):
        return (f"list_sum(list_transform(range(1, {dim} + 1),"
                f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")

    l1 = KMEANS_CORE_CTES("qe", k=k1, rounds=rounds, dim=dim)
    l2 = KMEANS_CORE_CTES("resid", k=k2, rounds=rounds, dim=dim,
                          prefix="r")
    joined1 = ",\n".join(l1)
    joined2 = ",\n".join(l2)
    return f"""
WITH qe AS MATERIALIZED (
  SELECT CAST({id_col} AS BIGINT) AS vid,
         list_transform({vec_col},
                        x -> CAST(round(CAST(x AS DOUBLE) * {quant}, 0)
                                  AS BIGINT)) AS qv
  FROM {table}
),
{joined1},
fa1 AS MATERIALIZED (
  SELECT e.vid, e.qv, c.cid AS cid1, c.cv
  FROM qe e CROSS JOIN c{rounds} c
  QUALIFY row_number() OVER (
    PARTITION BY e.vid ORDER BY {dist('e.qv', 'c.cv')}, c.cid
  ) = 1
),
resid AS MATERIALIZED (
  SELECT vid, list_transform(range(1, {dim} + 1),
                             i -> qv[i] - cv[i]) AS qv, cid1
  FROM fa1
),
{joined2},
codes AS MATERIALIZED (
  SELECT e.vid, e.cid1, c.cid AS cid2
  FROM resid e CROSS JOIN rc{rounds} c
  QUALIFY row_number() OVER (
    PARTITION BY e.vid ORDER BY {dist('e.qv', 'c.cv')}, c.cid
  ) = 1
),
lut AS MATERIALIZED (
  SELECT q.vid AS query_id, c1.cid AS cid1, c2.cid AS cid2,
         list_sum(list_transform(range(1, {dim} + 1),
           i -> (q.qv[i] - (c1.cv[i] + c2.cv[i]))
              * (q.qv[i] - (c1.cv[i] + c2.cv[i])))) AS d2
  FROM (SELECT vid, qv FROM qe WHERE vid < {n_queries}) q
  CROSS JOIN c{rounds} c1
  CROSS JOIN rc{rounds} c2
),
adc AS (
  SELECT l.query_id, co.vid AS neighbor_id, CAST(l.d2 AS BIGINT) AS adc_d2
  FROM codes co
  JOIN lut l ON l.cid1 = co.cid1 AND l.cid2 = co.cid2
  WHERE co.vid != l.query_id
)
SELECT query_id, neighbor_id, adc_d2, CAST(rk AS BIGINT) AS rank
FROM (
  SELECT query_id, neighbor_id, adc_d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_d2, neighbor_id) AS rk
  FROM adc
) WHERE rk <= {topk}
"""


def ann_ivfadc_topk(emb: DataFrame, k1: int = 16, k2: int = 16,
                    rounds: int = 2, n_probe: int = 4,
                    n_queries: int = 10, topk: int = 5, dim: int = 64,
                    quant: int = 1_000_000, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """IVFADC — the canonical billion-scale serving architecture (Jegou
    et al. TPAMI 2011 §V): the level-1 codebook doubles as the IVF
    coarse quantizer (cells = inverted lists), each query probes only
    its ``n_probe`` nearest cells, and within probed cells distances
    come from the level-2 residual codes via the ADC LUT.  Implemented
    as the RQ search with the per-query LUT RESTRICTED to the probed
    cid1 rows — the candidate join then touches ~n_probe/k1 of the code
    table, and because the join key is (cid1, cid2) the pruning is free
    (codes in unprobed cells simply find no LUT row).  Training,
    routing, and ranking all integer-exact; the oracle performs the
    identical restricted search."""
    codes, cents1, cents2, qe = rq_train_encode(
        emb, k1=k1, k2=k2, rounds=rounds, dim=dim, quant=quant,
        id_col=id_col, vec_col=vec_col)
    d2c = F.expr(
        "aggregate(zip_with(qv, cv, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    wq1 = Window.partitionBy("vid").orderBy("d2", "cid")
    probed = (
        qe.filter(F.col("vid") < n_queries)
        .crossJoin(F.broadcast(cents1))
        .select("vid", "qv", "cid", "cv", d2c.alias("d2"))
        .withColumn("rk", F.row_number().over(wq1))
        .filter(F.col("rk") <= n_probe)
        .select(F.col("vid").alias("query_id"), F.col("qv").alias("q_qv"),
                F.col("cid").alias("cid1"),
                F.col("cv").alias("cv1"))
    )
    recon_d2 = F.expr(
        "aggregate(zip_with(q_qv, recon, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    lut = (
        probed.crossJoin(F.broadcast(
            cents2.select(F.col("cid").alias("cid2"),
                          F.col("cv").alias("cv2"))))
        .select(
            "query_id", "cid1", "cid2",
            F.expr("zip_with(cv1, cv2, (a, b) -> a + b)").alias("recon"),
            "q_qv",
        )
        .select("query_id", "cid1", "cid2", recon_d2.alias("d2"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["cid1", "cid2"])
        .filter(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("neighbor_id"),
                F.col("d2").alias("adc_d2"))
    )
    wq = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(wq).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id",
                F.col("adc_d2").cast("long").alias("adc_d2"), "rank")
    )


def ANN_IVFADC_SQL(k1: int = 16, k2: int = 16, rounds: int = 2,
                   n_probe: int = 4, n_queries: int = 10, topk: int = 5,
                   dim: int = 64, quant: int = 1_000_000,
                   table: str = "embeddings", id_col: str = "vec_id",
                   vec_col: str = "embedding") -> str:
    def dist(a, b):
        return (f"list_sum(list_transform(range(1, {dim} + 1),"
                f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")

    l1 = KMEANS_CORE_CTES("qe", k=k1, rounds=rounds, dim=dim)
    l2 = KMEANS_CORE_CTES("resid", k=k2, rounds=rounds, dim=dim,
                          prefix="r")
    joined1 = ",\n".join(l1)
    joined2 = ",\n".join(l2)
    return f"""
WITH qe AS MATERIALIZED (
  SELECT CAST({id_col} AS BIGINT) AS vid,
         list_transform({vec_col},
                        x -> CAST(round(CAST(x AS DOUBLE) * {quant}, 0)
                                  AS BIGINT)) AS qv
  FROM {table}
),
{joined1},
fa1 AS MATERIALIZED (
  SELECT e.vid, e.qv, c.cid AS cid1, c.cv
  FROM qe e CROSS JOIN c{rounds} c
  QUALIFY row_number() OVER (
    PARTITION BY e.vid ORDER BY {dist('e.qv', 'c.cv')}, c.cid
  ) = 1
),
resid AS MATERIALIZED (
  SELECT vid, list_transform(range(1, {dim} + 1),
                             i -> qv[i] - cv[i]) AS qv, cid1
  FROM fa1
),
{joined2},
codes AS MATERIALIZED (
  SELECT e.vid, e.cid1, c.cid AS cid2
  FROM resid e CROSS JOIN rc{rounds} c
  QUALIFY row_number() OVER (
    PARTITION BY e.vid ORDER BY {dist('e.qv', 'c.cv')}, c.cid
  ) = 1
),
probed AS MATERIALIZED (
  SELECT q.vid AS query_id, q.qv AS q_qv, c.cid AS cid1, c.cv AS cv1
  FROM (SELECT vid, qv FROM qe WHERE vid < {n_queries}) q
  CROSS JOIN c{rounds} c
  QUALIFY row_number() OVER (
    PARTITION BY q.vid ORDER BY {dist('q.qv', 'c.cv')}, c.cid
  ) <= {n_probe}
),
lut AS MATERIALIZED (
  SELECT p.query_id, p.cid1, c2.cid AS cid2,
         list_sum(list_transform(range(1, {dim} + 1),
           i -> (p.q_qv[i] - (p.cv1[i] + c2.cv[i]))
              * (p.q_qv[i] - (p.cv1[i] + c2.cv[i])))) AS d2
  FROM probed p CROSS JOIN rc{rounds} c2
),
adc AS (
  SELECT l.query_id, co.vid AS neighbor_id, CAST(l.d2 AS BIGINT) AS adc_d2
  FROM codes co
  JOIN lut l ON l.cid1 = co.cid1 AND l.cid2 = co.cid2
  WHERE co.vid != l.query_id
)
SELECT query_id, neighbor_id, adc_d2, CAST(rk AS BIGINT) AS rank
FROM (
  SELECT query_id, neighbor_id, adc_d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_d2, neighbor_id) AS rk
  FROM adc
) WHERE rk <= {topk}
"""


# ---------------------------------------------------------------------------
# Optimized Product Quantization with a LEARNED rotation (OPQ-NP, Ge et
# al., CVPR 2013 §5): alternate (a) PQ codebook training in the rotated
# space with (b) an orthogonal-Procrustes update of the rotation from the
# cross-covariance between ORIGINAL vectors and their rotated-space
# reconstructions.  The distributed statistic (the d x d cross-Gram) is
# EXACT integers — only the 64 x 64 SVD runs on the driver (numpy), the
# same driver/executor split as the k-means centroid solve.  The
# permutation baseline (opq_dim_assignment) remains the oracle-exact
# variant; the learned rotation is float-SVD-dependent and is pinned by
# tests (orthogonality, distortion non-increase, determinism) instead.
# ---------------------------------------------------------------------------

def pq_reconstructions(emb: DataFrame, books: DataFrame, m: int = 4,
                       dim: int = 64, quant: int = 1_000_000,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """(vid, rv): each vector's PQ reconstruction under FIXED codebooks —
    argmin codeword per subspace, codewords concatenated in sub order
    (array_sort over (sub, cv) structs; sub is unique per vid).  One
    broadcast join + one keyed agg; never touches the driver."""
    sv = pq_subvectors(emb, m=m, dim=dim, quant=quant, id_col=id_col,
                       vec_col=vec_col)
    d2 = F.expr(
        "aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)),"
        " 0L, (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("vid", "sub").orderBy("d2", "cid")
    codes = (
        sv.join(F.broadcast(books), "sub")
        .select("vid", "sub", "cid", "cv", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return codes.groupBy("vid").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "cv"))),
                lambda s: s["cv"],
            )
        ).alias("rv")
    )


def pq_cross_gram(emb: DataFrame, books: DataFrame, m: int = 4,
                  dim: int = 64, quant: int = 1_000_000,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  recon: DataFrame | None = None) -> DataFrame:
    """(j, k, a): the d x d cross-Gram A[j][k] = sum_i recon_i[j] *
    q_i[k] between each vector's PQ reconstruction (rows ``j``) and its
    original quantized coordinates (columns ``k``) — the sufficient
    statistic of the orthogonal-Procrustes rotation update.

    Scale shape: mapInPandas computes ONE d x d integer partial per
    Arrow batch (numpy int64 matmul — exact, no BLAS float path for
    integer dtypes), so the shuffle is (#batches x d^2) tiny rows into
    a map-side-combined (j, k) sum — the treeAggregate pattern, never
    an N x d^2 explode.  Exactness envelope: |recon*q| <= quant^2 =
    1e12 per term; int64 holds to ~9.2e6 summed rows per batch and the
    cross-batch sum is Spark BIGINT — same envelope as
    opq_dim_assignment, train on a bounded sample past ~3M vectors.
    The DuckDB oracle is the naive quadratic unnest of the same
    product (OPQ_GRAM_SQL) — engine does the partial-aggregate shape,
    oracle does the definition."""
    import pandas as pd

    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * quant, 0).cast("long"),
    )
    if recon is None:
        recon = pq_reconstructions(emb, books, m=m, dim=dim, quant=quant,
                                   id_col=id_col, vec_col=vec_col)
    joined = (
        emb.select(F.col(id_col).cast("long").alias("vid"), qv.alias("qv"))
        .join(recon, "vid")
        .select("qv", "rv")
    )

    def partials(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array([list(v) for v in pdf["qv"]], dtype=np.int64)
            r = np.array([list(v) for v in pdf["rv"]], dtype=np.int64)
            a = r.T @ q          # exact: numpy integer matmul never BLAS
            jj, kk = np.meshgrid(np.arange(a.shape[0]),
                                 np.arange(a.shape[1]), indexing="ij")
            yield pd.DataFrame({
                "j": jj.ravel().astype("int64"),
                "k": kk.ravel().astype("int64"),
                "a": a.ravel(),
            })

    return (
        joined.mapInPandas(partials, schema="j long, k long, a long")
        .groupBy("j", "k")
        .agg(F.sum("a").cast("long").alias("a"))
    )


def OPQ_GRAM_SQL(m: int = 4, k: int = 16, rounds: int = 2,
                 dim: int = 64, quant: int = 1_000_000,
                 table: str = "embeddings", id_col: str = "vec_id",
                 vec_col: str = "embedding") -> str:
    """DuckDB oracle for pq_cross_gram at identity rotation: the PQ
    training chain, the argmin encode, then the DEFINITIONAL quadratic
    unnest sum(recon[j] * q[k]) — losslessness of the engine's
    partial-aggregate shape IS the gate."""
    d = dim // m
    parts = PQ_TRAIN_CTES(m=m, k=k, rounds=rounds, dim=dim, quant=quant,
                          table=table, id_col=id_col, vec_col=vec_col)
    joined = ",\n".join(parts)

    def dist(e, c):
        return (f"list_sum(list_transform(range(1, {d} + 1),"
                f" i -> ({e}.sv[i] - {c}.cv[i]) * ({e}.sv[i] - {c}.cv[i])))")

    return f"""
WITH {joined},
codes AS (
  SELECT e.vid, e.sub, c.cv
  FROM pv e JOIN p{rounds} c ON c.sub = e.sub
  QUALIFY row_number() OVER (
    PARTITION BY e.vid, e.sub ORDER BY {dist('e', 'c')}, c.cid
  ) = 1
),
recon AS (
  SELECT co.vid, CAST(co.sub * {d} + t.i - 1 AS BIGINT) AS j,
         co.cv[t.i] AS rq
  FROM codes co CROSS JOIN range(1, {d} + 1) t(i)
),
xq AS (
  SELECT vid, CAST(t.i - 1 AS BIGINT) AS k, qv[t.i] AS q
  FROM pq_qe CROSS JOIN range(1, {dim} + 1) t(i)
)
SELECT r.j, x.k, CAST(sum(r.rq * x.q) AS BIGINT) AS a
FROM recon r JOIN xq x ON x.vid = r.vid
GROUP BY r.j, x.k
"""


def rotate_embeddings(emb: DataFrame, rot, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """(vec_id, embedding): each vector premultiplied by the d x d
    rotation — one Arrow-batched numpy matmul per batch, no shuffle;
    the rotation rides the task closure (64 x 64 floats)."""
    import pandas as pd

    rows = [[float(x) for x in r] for r in rot]

    def run(batches):
        import numpy as np

        rm = np.array(rows, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            y = x @ rm.T
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                vec_col: list(y),
            })

    return emb.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, {vec_col} array<double>")


def opq_rotation_train(emb: DataFrame, m: int = 4, k: int = 16,
                       rounds: int = 2, alternations: int = 2,
                       dim: int = 64, quant: int = 1_000_000,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding"):
    """Alternating-minimization OPQ: returns (rot, books) — the learned
    d x d orthogonal rotation (numpy float64) and the final integer
    codebooks trained in the rotated space.

    Each alternation: (a) rotate the corpus (Arrow-batched matmul, no
    shuffle), (b) train PQ codebooks on the rotated integer grid (the
    exact floor-midpoint recurrence), (c) aggregate the EXACT integer
    cross-Gram between original coordinates and rotated-space
    reconstructions (pq_cross_gram — d^2 bounded rows to the driver),
    (d) solve orthogonal Procrustes R = V U^T from the 64 x 64 SVD.
    Driver work per alternation is O(d^3) on a d x d matrix — the same
    tiny-solve/big-aggregate split as the ORR normal equations.  The
    rotated reconstruction must be compared against R-rotated originals,
    so the Procrustes target uses the CURRENT rotation's gram; R is
    composed fresh each alternation from the identity-space gram."""
    import numpy as np

    rot = np.eye(dim)
    books = None
    for _ in range(alternations):
        src = emb if np.allclose(rot, np.eye(dim)) else rotate_embeddings(
            emb, rot, id_col=id_col, vec_col=vec_col)
        books = pq_train_quantized(
            src, m=m, k=k, rounds=rounds, dim=dim, quant=quant,
            id_col=id_col, vec_col=vec_col,
        ).select("sub", "cid", F.col("codeword_q").alias("cv")) \
         .localCheckpoint()
        recon = pq_reconstructions(src, books, m=m, dim=dim, quant=quant,
                                   id_col=id_col, vec_col=vec_col)
        gram_rows = pq_cross_gram(
            emb, books, m=m, dim=dim, quant=quant, id_col=id_col,
            vec_col=vec_col, recon=recon,
        ).collect()   # bounded: d^2 rows (4096 at dim=64)
        a = np.zeros((dim, dim))
        for r in gram_rows:
            a[int(r["j"])][int(r["k"])] = float(r["a"])
        # minimize sum ||R x - y||^2 = const - 2 tr(R M), M = sum x y^T
        # = a.T; with M = U S V^T the maximizer is R = V U^T
        u, _, vt = np.linalg.svd(a.T)
        rot = vt.T @ u.T
    return rot, books


SEMDEDUP_TAU_NUM2 = 289      # τ = 0.85: τ² = 289/400 exactly
SEMDEDUP_TAU_DEN2 = 400
SEMDEDUP_TARGET_CLUSTER = 64  # target vectors per cluster (k grows with n)


def semdedup_keep_list(emb: DataFrame, k: int = 8, quant: int = 1000,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       target_cluster: int = SEMDEDUP_TARGET_CLUSTER,
                       cache_out: list | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication that first CLUSTERS the embedding space, then finds
    cosine near-duplicates only WITHIN each cluster — the published
    fix for embedding dedup's all-pairs blowup, and the cluster-blocked
    sibling of dedup_embedding_lsh (random-hyperplane blocking).

    Variants, documented: centroids are the k lowest-id vectors (the
    kmeans_round_quantized seeding discipline — deterministic, no RNG;
    swap in trained centroids for production), and the keep rule is
    keep-min: a vector is pruned iff some SMALLER-id vector in its
    cluster sits above the cosine threshold (SemDeDup keeps one random
    representative; min-id is the exact-dedup keeper discipline).

    Exactness: the cosine threshold never computes a cosine — with
    globally-quantized integer vectors,  cos(a,b) >= 0.85  iff
    dot > 0 AND 400·dot² >= 289·|a|²·|b|²  (τ² = 289/400 exactly), all
    in DECIMAL(38,0)/HUGEINT integer arithmetic: no sqrt, no division,
    no float anywhere.  Envelope at quant=1000, dim 64, |x| <= ~4:
    dot² · 400 <= ~1e20 << 10^38.

    Output: (vec_id, cid, kept) for EVERY vector.

    Scale: the assignment is a broadcast k×dim join + a vid-keyed
    argmin window; the pair search joins on (cid, pos) so the
    quadratic is bounded per cluster — and k GROWS with the corpus
    (kval = max(k, n_vectors div target_cluster), computed in-plan
    from the same scan on both engines) so clusters stay
    constant-sized, which is exactly the SemDeDup recipe (Abbas et
    al. run k = 11k clusters over LAION; VERDICT r10 item 3 — the
    fixed-k variant's within-cluster pair count grew quadratically).
    The pruned-id set is |duplicates|-sized and joins back keyed."""
    kk = emb.agg(F.expr(
        f"greatest(CAST({int(k)} AS BIGINT),"
        f" count(1) div {int(target_cluster)})").alias("kval"))
    # r12-opt: quantization, |x|², per-seed distances, and per-pair dots
    # are all ROW-LOCAL array folds — the coordinate explode shuffled
    # n·dim (and n·dim·k through the assignment join) rows for integer
    # sums that never needed to leave the row.  The coalesce(z, 0) in
    # each fold reproduces the old inner-join-on-pos semantics exactly
    # (a missing coordinate contributes nothing) should vectors ever be
    # ragged.  Exchanges: the vid-keyed argmin agg, the cid-keyed pair
    # join, the dup distinct, and the report join — the (vid, cid)
    # dist exchange, the vid argmin window+sort, the n·dim n2 exchange,
    # and both |n2|-frame joins are gone.
    qdoc = emb.select(
        F.col(id_col).cast("long").alias("vid"),
        F.expr(
            f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE)"
            f" * {quant}, 0) AS BIGINT))").alias("qv"),
    ).withColumn("n2", F.expr(
        "aggregate(transform(qv, x -> x * x), CAST(0 AS BIGINT),"
        " (a, z) -> a + coalesce(z, CAST(0 AS BIGINT)))"))
    seeds = qdoc.crossJoin(F.broadcast(kk)).filter(
        F.col("vid") < F.col("kval")).select(
        F.col("vid").alias("cid"), F.col("qv").alias("cv"))
    dist = ("aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS BIGINT),"
            " (a, z) -> a + coalesce(z, CAST(0 AS BIGINT)))")
    assign = (
        qdoc.join(F.broadcast(seeds), F.lit(True))
        .select("vid", "qv", "n2", "cid", F.expr(dist).alias("dist_q"))
        .groupBy("vid")
        .agg(
            F.min_by(F.col("cid"),
                     F.struct(F.col("dist_q"), F.col("cid"))).alias("cid"),
            # qv/n2 are constant within a vid group (one source row
            # fanned over the k seeds) — carrying them through the agg
            # saves the n-scale join the old shape paid to re-attach
            F.first("qv").alias("qv"), F.first("n2").alias("n2"),
        )
    ).persist()
    if cache_out is not None:
        cache_out.append(assign)
    a = assign.select(F.col("cid"), F.col("vid").alias("ia"),
                      F.col("qv").alias("qa"), F.col("n2").alias("na2"))
    b = assign.select(F.col("cid"), F.col("vid").alias("ib"),
                      F.col("qv").alias("qb"), F.col("n2").alias("nb2"))
    dot = ("aggregate(zip_with(qa, qb, (x, y) -> x * y),"
           " CAST(0 AS BIGINT),"
           " (a, z) -> a + coalesce(z, CAST(0 AS BIGINT)))")
    dup = (
        a.join(b, ["cid"])
        .where("ia < ib")
        .select("ib", F.expr(dot).alias("dot"), "na2", "nb2")
        .where(
            f"dot > 0 AND CAST(dot AS DECIMAL(38,0)) * dot"
            f" * {SEMDEDUP_TAU_DEN2} >= CAST(na2 AS DECIMAL(38,0)) * nb2"
            f" * {SEMDEDUP_TAU_NUM2}")
        .select(F.col("ib").alias("vid")).distinct()
    )
    return (
        assign.join(dup.withColumn("_dup", F.lit(1)), "vid", "left")
        .select(
            F.col("vid").alias(id_col), F.col("cid").cast("long"),
            F.col("_dup").isNull().alias("kept"),
        )
    )


def SEMDEDUP_SQL(k: int = 8, quant: int = 1000,
                 table: str = "embeddings", id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 target_cluster: int = SEMDEDUP_TARGET_CLUSTER) -> str:
    return f"""
WITH kk AS (
  SELECT greatest(CAST({k} AS BIGINT),
                  count(*) // {target_cluster}) AS kval
  FROM {table}
),
q AS (
  SELECT CAST({id_col} AS BIGINT) AS vid,
         generate_subscripts({vec_col}, 1) AS pos,
         CAST(round(CAST(unnest({vec_col}) AS DOUBLE) * {quant}.0, 0)
              AS BIGINT) AS qv
  FROM {table}
),
n2 AS (SELECT vid, CAST(sum(qv * qv) AS BIGINT) AS n2 FROM q GROUP BY 1),
seeds AS (SELECT vid AS cid, pos, qv AS c FROM q, kk WHERE vid < kval),
dists AS (
  SELECT v.vid, s.cid,
         CAST(sum((v.qv - s.c) * (v.qv - s.c)) AS BIGINT) AS dist_q
  FROM q v JOIN seeds s ON v.pos = s.pos
  GROUP BY 1, 2
),
assign AS (
  SELECT vid, cid FROM (
    SELECT vid, cid,
           row_number() OVER (PARTITION BY vid
                              ORDER BY dist_q, cid) AS rn
    FROM dists
  ) WHERE rn = 1
),
parts AS (
  SELECT a.cid, q.vid, q.pos, q.qv FROM q JOIN assign a USING (vid)
),
dots AS (
  SELECT a.cid, a.vid AS ia, b.vid AS ib,
         CAST(sum(a.qv * b.qv) AS BIGINT) AS dot
  FROM parts a JOIN parts b ON a.cid = b.cid AND a.pos = b.pos
  WHERE a.vid < b.vid
  GROUP BY 1, 2, 3
),
dup AS (
  SELECT DISTINCT d.ib AS vid
  FROM dots d
  JOIN n2 na ON na.vid = d.ia
  JOIN n2 nb ON nb.vid = d.ib
  WHERE d.dot > 0
    AND CAST(d.dot AS HUGEINT) * d.dot * {SEMDEDUP_TAU_DEN2}
        >= CAST(na.n2 AS HUGEINT) * nb.n2 * {SEMDEDUP_TAU_NUM2}
)
SELECT a.vid AS {id_col}, CAST(a.cid AS BIGINT) AS cid,
       dup.vid IS NULL AS kept
FROM assign a LEFT JOIN dup ON dup.vid = a.vid
"""
