"""Bucketed tables -> co-located joins without a shuffle (the 100 TB join
strategy from README scale rules: pre-partition both fact tables on the
join key at write time; every later join on that key skips the Exchange)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def bucketed_tables(spark):
    suffix = uuid.uuid4().hex[:8]
    li_t, o_t = f"li_b_{suffix}", f"o_b_{suffix}"
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable(li_t))
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable(o_t))
    yield li_t, o_t
    spark.sql(f"DROP TABLE IF EXISTS {li_t}")
    spark.sql(f"DROP TABLE IF EXISTS {o_t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge join so the shuffle (or its absence) is visible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.table(li_t)
        o = spark.table(o_t)
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("cnt"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # join itself must be exchange-free (bucket co-location); the final
        # groupBy on a different key still shuffles — find the join subtree
        join_part = plan.split("SortMergeJoin")[1]
        assert "Exchange" not in join_part
        # and the result matches the plain parquet join
        plain = (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF_DIR}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitionBy(source) layout: a source-filtered read must
    prune at the directory level (PartitionFilters in the scan, only the
    matching partition's files touched) — the data-layout lever that turns
    a 100 TB full scan into a single-domain read."""
    docs = spark.createDataFrame(
        [(i, f"text {i}", f"src{i % 4}") for i in range(100)],
        "doc_id long, text string, source string",
    )
    path = str(tmp_path / "docs_by_source")
    docs.write.partitionBy("source").parquet(path)

    rd = spark.read.parquet(path).filter("source = 'src1'")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "src1" in plan
    assert rd.count() == 25
    # the non-partitioned equivalent would read all four directories;
    # partition pruning reads exactly one
    import glob
    all_parts = glob.glob(f"{path}/source=*")
    assert len(all_parts) == 4


def test_aqe_splits_skewed_join_partition(spark):
    """Runtime skew handling evidence: one hot key dominating a
    sort-merge join is split by AQE into parallel sub-partitions
    (SortMergeJoin(skew=true) + 'skewed' shuffle read in the EXECUTED
    plan) — the engine-native fallback behind the explicit salted_join
    operator. Note the payload must be incompressible (md5 here): skew
    detection runs on COMPRESSED map-output sizes, so a repetitive
    column can hide a 400x row skew below the byte threshold."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        pad = F.md5(F.col("id").cast("string"))
        hot = spark.range(50000).select(F.lit(0).alias("k"), pad.alias("p"))
        cold = spark.range(1000).select(
            (F.col("id") % 100 + 1).alias("k"), pad.alias("p"))
        dim = spark.range(101).select(
            F.col("id").alias("k"), pad.alias("q"))
        j = hot.unionByName(cold).join(dim, "k")
        assert len(j.collect()) == 51000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """RUNTIME partition pruning evidence (review r12 depth): the fact
    is hive-partitioned on the join key's domain, the filter lives only
    on the DIM side — static pruning can't see it, so the scan must
    carry a dynamicpruning subquery that evaluates the dim filter at
    runtime and skips the fact partitions it excludes (the star-join
    lever that turns a 100 TB fact scan into the two matching
    partitions).  Result pinned against the unpartitioned join."""
    fact = spark.createDataFrame(
        [(i, i % 8, i * 10) for i in range(4000)],
        "id long, seg long, v long")
    path = str(tmp_path / "fact_by_seg")
    fact.write.partitionBy("seg").parquet(path)
    dim = spark.createDataFrame(
        [(s, "keep" if s in (2, 5) else "drop") for s in range(8)],
        "seg long, tag string")
    saved = spark.conf.get(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        f = spark.read.parquet(path)
        j = (f.join(dim, "seg").where("tag = 'keep'")
             .agg(F.sum("v").cast("long").alias("sv"),
                  F.count(F.lit(1)).alias("n")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:3000]
        got = j.collect()[0]
        want = (fact.join(dim, "seg").where("tag = 'keep'")
                .agg(F.sum("v").cast("long").alias("sv"),
                     F.count(F.lit(1)).alias("n")).collect()[0])
        assert (got["sv"], got["n"]) == (want["sv"], want["n"])
        assert got["n"] == 1000
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", saved)
