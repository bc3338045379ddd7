"""Feature-encoder behavior pins (functions/encoders.py, quality.mad_outliers)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_target_encode_loo_excludes_own_row(spark):
    from omldm_spark.functions.encoders import target_encode_loo

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 100)],
        "k long, cat string, v long",
    )
    out = {r["k"]: r for r in target_encode_loo(df, "k", "cat", "v", m=2).collect()}
    # LOO mean for k=1 in cat a: (20+30)/2 = 25 — own 10 excluded
    assert out[1]["te"] == 25
    assert out[2]["te"] == 20  # (10+30)/2
    # singleton category falls back to the global mean 160//4 = 40
    assert out[4]["te"] == 40
    # smoothing: (sum_cat - own + m*gmean) // (cnt-1+m) for k=1:
    # (60-10+2*40)//(2+2) = 130//4 = 32
    assert out[1]["te_smooth"] == 32


def test_quantile_bin_right_closed_edges(spark):
    from omldm_spark.functions.encoders import quantile_bin

    # values 1..10, 2 bins: n=10, edge = min{v: cum >= ceil(1*10/2)=5} = 5
    df = spark.createDataFrame([(i, i) for i in range(1, 11)], "k long, v long")
    out = {r["k"]: r["bin"] for r in quantile_bin(df, "k", "v", bins=2).collect()}
    assert out == {i: (1 if i <= 5 else 2) for i in range(1, 11)}


def test_hash_features_dim_bound_and_multiplicity(spark):
    from omldm_spark.functions.encoders import hash_features

    docs = spark.createDataFrame(
        [(1, "x x x"), (2, "x")], "doc_id long, text string"
    )
    rows = hash_features(docs, dim=8).collect()
    assert all(0 <= r["slot"] < 8 for r in rows)
    by_doc = {r["doc_id"]: r for r in rows}
    # same token, same slot, weight scales with multiplicity (same sign)
    assert by_doc[1]["slot"] == by_doc[2]["slot"]
    assert by_doc[1]["w"] == 3 * by_doc[2]["w"]
    assert abs(by_doc[2]["w"]) == 1


def test_mad_outliers_flags_the_planted_point(spark):
    from omldm_spark.operators.quality import mad_outliers

    base = [(i, "g", 100 + (i % 5)) for i in range(20)]
    planted = [(99, "g", 10_000)]
    df = spark.createDataFrame(base + planted, "k long, g string, v long")
    out = mad_outliers(df, "g", "v", "k").collect()
    assert [r["k"] for r in out] == [99]
    r = out[0]
    assert r["med"] == 102 and r["dev"] == 9898
    # the threshold really is a strict BIGINT cross-multiply
    assert r["dev"] * 10000 > 44478 * r["mad"]
