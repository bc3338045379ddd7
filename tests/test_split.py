"""80/20 rolling holdout split semantics (FlinkSpoke.scala:92-107)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from omldm_spark.operators.split import train_test_split


def _points(spark, n=4000):
    return spark.createDataFrame(
        pd.DataFrame({"id": range(n), "v": [float(i) for i in range(n)]})
    )


def test_split_proportions_and_slots(spark):
    out = train_test_split(_points(spark), num_workers=4, test_set_size=10**9)
    pdf = out.toPandas()
    # without eviction cap: exactly 2 of every 10 per worker are test
    frac = (pdf["split"] == "test").mean()
    assert abs(frac - 0.2) < 0.01
    # test rows sit at slots 8,9 of each 10 (rn-1 % 10 >= 8)
    test_rows = pdf[pdf["split"] == "test"]
    assert (((test_rows["rn"] - 1) % 10) >= 8).all()


def test_rolling_eviction_caps_test_set(spark):
    out = train_test_split(_points(spark), num_workers=4, test_set_size=16)
    counts = (
        out.filter(F.col("split") == "test").groupBy("worker").count().collect()
    )
    assert all(r["count"] == 16 for r in counts)
    # evicted (older) test-slot rows were re-tagged train — totals unchanged
    assert out.count() == 4000


def test_worker_assignment_is_id_mod(spark):
    out = train_test_split(_points(spark), num_workers=4)
    bad = out.filter(F.pmod(F.col("id"), F.lit(4)) != F.col("worker")).count()
    assert bad == 0
