"""Hand-checkable semantics pins for the round-4 pipeline operators:
RRF fusion, classification report, k-anonymity, latest-per-key.
(Contract-query exactness vs DuckDB is pinned by tools/oracle_check.py;
these fix the operator semantics on corpora small enough to verify by eye.)
"""

from __future__ import annotations

from omldm_spark.operators.evaluation import classification_report
from omldm_spark.operators.pii import k_anonymity_suppress
from omldm_spark.operators.retrieval import rrf_fuse
from omldm_spark.operators.temporal import latest_per_key


def test_rrf_fusion_prefers_doc_in_both_lists(spark):
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank long"
    )
    sem = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id long, neighbor_id long, rank long"
    )
    rows = {r["doc_id"]: r for r in rrf_fuse(lex, sem, k=3).collect()}
    # doc 11 is in both lists (ranks 2,1) -> highest fused score
    assert rows[11]["rank"] == 1
    assert rows[11]["rrf_q"] == round(1e12 / 62) + round(1e12 / 61)
    # single-list docs: rank-1 lex vs rank-2 sem -> lex wins
    assert rows[10]["rank"] == 2 and rows[12]["rank"] == 3
    assert rows[10]["rank_sem"] == 0 and rows[12]["rank_lex"] == 0


def test_classification_report_counts_and_ppm(spark):
    # truth: a,a,a,b ; pred: a,a,b,b
    df = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b")],
        "y string, yhat string",
    )
    rep = {r["label"]: r for r in
           classification_report(df, "y", "yhat").collect()}
    a, b = rep["a"], rep["b"]
    assert (a["n_true"], a["n_pred"], a["tp"]) == (3, 2, 2)
    assert a["precision_ppm"] == 1_000_000
    assert a["recall_ppm"] == 666_666          # floor(2e6/3)
    assert a["f1_ppm"] == 800_000              # 2*2/(3+2)
    assert (b["n_true"], b["n_pred"], b["tp"]) == (1, 2, 1)
    assert b["precision_ppm"] == 500_000 and b["recall_ppm"] == 1_000_000


def test_classification_report_class_never_predicted(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("c", "a")], "y string, yhat string"
    )
    rep = {r["label"]: r for r in
           classification_report(df, "y", "yhat").collect()}
    assert rep["c"]["n_pred"] == 0 and rep["c"]["precision_ppm"] == 0
    assert rep["c"]["f1_ppm"] == 0


def test_k_anonymity_drops_small_groups(spark):
    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("x", 3), ("y", 4)], "qi string, id long"
    )
    kept = k_anonymity_suppress(df, ["qi"], k=3).collect()
    assert {r["id"] for r in kept} == {1, 2, 3}
    assert all(r["qi_count"] == 3 for r in kept)


def test_latest_per_key_total_order_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "a", 10, 100), (1, "a", 10, 101), (1, "a", 9, 999),
         (2, "a", 5, 7)],
        "k long, g string, ts long, id long",
    )
    got = {(r["k"], r["g"]): r["id"]
           for r in latest_per_key(df, ["k", "g"], ["ts", "id"]).collect()}
    # ts tie at 10 -> larger id wins; ts 9 never wins despite larger id
    assert got == {(1, "a"): 101, (2, "a"): 7}


def test_weighted_sample_favors_heavy_weights_and_is_deterministic(spark):
    from omldm_spark.operators.corpus import weighted_sample

    rows = [(i, "s", 1 if i < 100 else 100_000) for i in range(110)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    picked = {r["doc_id"]
              for r in weighted_sample(df, k=10, group_col="source").collect()}
    # the ten 100k-weight docs (ids 100..109) should dominate the sample
    assert len(picked & set(range(100, 110))) >= 8
    again = {r["doc_id"]
             for r in weighted_sample(df, k=10, group_col="source").collect()}
    assert picked == again
    # zero-weight rows can never be selected
    z = df.union(spark.createDataFrame([(999, "s", 0)], df.schema))
    assert 999 not in {
        r["doc_id"] for r in weighted_sample(z, k=200, group_col="source").collect()
    }


def test_skew_profile_summary_row(spark):
    from omldm_spark.operators.skew import skew_profile

    # key "a" x 6, "b" x 2, "c" x 1 -> total 9, 3 keys, ceil_avg 3, skew 2.0
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    out = {r["key"]: r for r in skew_profile(df, "k", n_top=2).collect()}
    assert out["a"]["rank"] == 1 and out["a"]["cnt"] == 6
    assert out["b"]["rank"] == 2
    assert "c" not in out  # beyond n_top
    t = out["__total__"]
    assert (t["cnt"], t["n_keys"], t["skew_ppm"]) == (9, 3, 2_000_000)


def test_incremental_agg_merge_equals_full_recompute(spark):
    from omldm_spark.operators.temporal import incremental_agg_merge
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i % 3, i) for i in range(20)], "k long, v long"
    )

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("v").cast("long").alias("s"),
        )

    merged = incremental_agg_merge(
        agg(df.filter("v < 7")), agg(df.filter("v >= 7")), ["k"]
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, agg(df).collect())
    )


def test_zset_apply_vanishing_group_and_identity(spark):
    """Z-set fold == full recompute, and a group retracted to multiplicity
    zero disappears from the maintained view entirely."""
    from pyspark.sql import functions as F

    from omldm_spark.operators.temporal import zset_agg_apply

    base = spark.createDataFrame(
        [(0, 10), (0, 20), (1, 5), (2, 7)], "k long, v long"
    )
    mv = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("v").cast("long").alias("v"),
    )
    # delete BOTH k=0 rows (group vanishes), insert a new k=3 row,
    # update k=1: retract (1,5), insert (1,6)
    delta = spark.createDataFrame(
        [(0, 10, -1), (0, 20, -1), (3, 9, 1), (1, 5, -1), (1, 6, 1)],
        "k long, v long, sign long",
    )
    out = {r["k"]: (r["cnt"], r["v"])
           for r in zset_agg_apply(mv, delta, ["k"], ["v"]).collect()}
    assert out == {1: (1, 6), 2: (1, 7), 3: (1, 9)}  # k=0 vanished


def test_distributed_running_sum_range_invariance(spark):
    """The two-phase prefix sum is exact and independent of the range
    count (1 range == single window == 32 ranges)."""
    from omldm_spark.operators.corpus import distributed_running_sum

    rows = [(i * 7 % 50, i, 1 if i % 3 else -1) for i in range(200)]
    df = spark.createDataFrame(rows, "ts long, iid long, delta long")

    def run(n):
        out = distributed_running_sum(df, ["ts", "iid"], "delta", n)
        got = {(r["ts"], r["iid"]): r["running"] for r in out.collect()}
        out.unpersist()
        return got

    expected = {}
    acc = 0
    for ts, iid, d in sorted((t, i, d) for t, i, d in rows):
        acc += d
        expected[(ts, iid)] = acc
    assert run(1) == expected
    assert run(32) == expected
