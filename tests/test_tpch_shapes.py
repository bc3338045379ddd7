"""Semantics pin for the hardest TPC-H shape added in round 4: q21's double
correlated subquery (EXISTS another supplier / NOT EXISTS another LATE
supplier in the same order).  The oracle gate (tools/oracle_check.py) pins
all nine shapes against DuckDB at sf0.001+sf0.01; this test pins the
semi+anti composition on a corpus tiny enough to verify by hand, so a
refactor that flips join sides or null-handling fails with a readable diff.
"""

from __future__ import annotations

import pytest

from omldm_spark.queries import QUERIES


@pytest.fixture()
def tiny_star(spark, tmp_path):
    # orders: 1..4 final, 5 open
    orders = spark.createDataFrame(
        [(k, 1, "F" if k <= 4 else "O", 100.0, "2020-01-01", "1-URGENT")
         for k in range(1, 6)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    # order 1: supp 10 late, supp 11 on time   -> 10 counts
    # order 2: supp 10 late, supp 11 late      -> both blocked by NOT EXISTS
    # order 3: supp 12 late, sole supplier     -> blocked by EXISTS
    # order 4: supp 11 late, supp 10 on time   -> 11 counts
    # order 5: supp 10 late but order is open  -> filtered by status
    rows = [
        (1, 10, "R"), (1, 11, "N"),
        (2, 10, "R"), (2, 11, "R"),
        (3, 12, "R"),
        (4, 11, "R"), (4, 10, "N"),
        (5, 10, "R"),
    ]
    li = spark.createDataFrame(
        [(ok, 100 + i, sk, i, 1.0, 10.0, 0.0, 0.0, rf, "O", "2020-01-02")
         for i, (ok, sk, rf) in enumerate(rows)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    )
    supplier = spark.createDataFrame(
        [(10, "SUPP_10", 0, 1.0), (11, "SUPP_11", 0, 1.0),
         (12, "SUPP_12", 0, 1.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    orders.write.parquet(f"{tmp_path}/orders.parquet")
    li.write.parquet(f"{tmp_path}/lineitem.parquet")
    supplier.write.parquet(f"{tmp_path}/supplier.parquet")
    return str(tmp_path)


def test_q21_exists_not_exists_composition(spark, tiny_star):
    got = {
        r["s_name"]: r["numwait"]
        for r in QUERIES["tpch_q21_like"](spark, tiny_star).collect()
    }
    assert got == {"SUPP_10": 1, "SUPP_11": 1}
