"""P1-P3 parse semantics: silent drop of malformed/EOS/invalid records
(DataInstanceParser.scala:12-22, DataPointParser.scala:14-59)."""

from __future__ import annotations

import json

from omldm_spark.functions.parsing import (
    parse_data_instances,
    parse_double_array,
    parse_requests,
    to_usable_points,
)


def _raw(spark, values):
    return spark.createDataFrame([(v,) for v in values], ["value"])


def test_drops_malformed_eos_and_invalid(spark):
    good = json.dumps(
        {"id": 1, "numericalFeatures": [1.0, 2.0], "target": 1.0,
         "operation": "training"}
    )
    unlabeled = json.dumps(
        {"id": 2, "numericalFeatures": [3.0], "operation": "forecasting"}
    )
    no_features = json.dumps({"id": 3, "operation": "training"})
    bad_op = json.dumps({"id": 4, "numericalFeatures": [1.0], "operation": "x"})
    raw = _raw(spark, [good, unlabeled, no_features, bad_op, "EOS", "{oops", ""])
    out = parse_data_instances(raw)
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_labeled_unlabeled_discriminator(spark):
    rows = [
        json.dumps({"id": 1, "numericalFeatures": [1.0], "target": 2.0,
                    "operation": "training"}),
        json.dumps({"id": 2, "numericalFeatures": [1.0],
                    "operation": "forecasting"}),
    ]
    pts = to_usable_points(parse_data_instances(_raw(spark, rows)))
    kinds = {r["id"]: r["kind"] for r in pts.collect()}
    assert kinds == {1: "labeled", 2: "unlabeled"}
    # null feature arrays are coalesced to empty, never null
    row = pts.filter("id = 1").first()
    assert row["discreteFeatures"] == []
    assert row["categoricalFeatures"] == []


def test_parse_requests_validates(spark):
    ok = json.dumps({"id": 1, "request": "Create",
                     "learner": {"name": "PA"}})
    bad_req = json.dumps({"id": 2, "request": "Explode"})
    no_id = json.dumps({"request": "Create"})
    out = parse_requests(_raw(spark, [ok, bad_req, no_id, "junk"]))
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["id"] == 1
    assert rows[0]["learner"]["name"] == "PA"


def test_parse_double_array(spark):
    df = spark.createDataFrame([("1.0,2.5,3",)], ["s"])
    arr = df.select(parse_double_array("s").alias("a")).first()["a"]
    assert arr == [1.0, 2.5, 3.0]


def test_caller_filter_on_parsed_output_parses_once_and_correct(spark):
    """Documents the parse-filter boundary (r12-opt, settled by
    measurement): the parse column is pinned nondeterministic
    (_pin_parse), so neither the validity conjunction nor a caller
    .filter() is substituted below the parse Project — the optimized
    plan carries EXACTLY ONE from_json and every Filter reads the
    struct column.  (The pre-r12 rand-WHEN pin was folded by
    OptimizeRand and the pushed plan carried SIX from_json copies that
    runtime CSE only partially deduped: 7.4 s vs 2.4 s at sf0.1.)
    This test pins the two facts: the parse stays single-copy (so we
    notice if the optimizer changes again) and results stay correct,
    including the malformed-row silent-drop interacting with the
    caller predicate."""
    import json as _json

    from pyspark.sql import functions as F

    from omldm_spark.functions.parsing import parse_data_instances

    raws = [
        _json.dumps({"id": i, "operation": "training",
                     "numericalFeatures": [float(i)], "target": 1.0})
        for i in range(6)
    ] + ["not json at all", _json.dumps({"id": 99, "operation": "explode"})]
    raw = spark.createDataFrame([(s,) for s in raws], ["value"])
    parsed = parse_data_instances(raw)

    filtered = parsed.filter(F.col("id") >= 3)
    got = sorted(r["id"] for r in filtered.collect())
    assert got == [3, 4, 5]  # malformed + invalid-op rows silently dropped

    plan = filtered._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("from_json") == 1, (
        "the parse is no longer single-copy — the optimizer changed; "
        "re-run the A/B in parsing.py's _pin_parse note"
    )
    assert not any(
        "from_json" in line for line in plan.splitlines() if "Filter" in line
    ), "a predicate was substituted below the parse projection"


def test_chunk_words_udtf_lateral_sql(spark):
    """Python UDTF surface (§2.10): registered table function usable
    from pure SQL via LATERAL, correct ordering, trailing partial
    window, and empty-text contract."""
    from omldm_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, None)],
        "doc_id long, text string",
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, t.chunk_idx, t.n_words, t.chunk "
        "FROM udtf_docs d, LATERAL chunk_words(d.text, 2) t "
        "ORDER BY d.doc_id, t.chunk_idx"
    ).collect()
    got = [(r.doc_id, r.chunk_idx, r.n_words, r.chunk) for r in rows]
    assert got == [
        (1, 0, 2, "a b"), (1, 1, 2, "c d"), (1, 2, 1, "e"),
        (2, 0, 1, "x"),
    ]  # doc 3 (null text) emits nothing


def test_sql_surface_end_to_end(spark):
    """SQL-first usability: register_views + the registered UDTFs give a
    SQL-only user the whole analytic surface — here a revenue rollup
    joined through two dims plus a LATERAL UDTF, no DataFrame API."""
    from omldm_spark.functions.udtfs import register_udtfs
    from omldm_spark.io import register_views

    register_views(spark, "/root/testdata/sf0.001")
    register_udtfs(spark)
    row = spark.sql(
        "SELECT n.n_name, "
        "CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS rev_c "
        "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "GROUP BY n.n_name ORDER BY rev_c DESC LIMIT 1"
    ).collect()[0]
    assert row["rev_c"] > 0
    chunks = spark.sql(
        "SELECT count(*) AS c FROM documents d, "
        "LATERAL chunk_words(d.text, 50) t"
    ).collect()[0]["c"]
    assert chunks >= spark.table("documents").count()
