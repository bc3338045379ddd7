"""Round-trip contracts for the multi-format batch connectors (io.py
read_source/write_sink): whatever lands in json/csv/orc must read back
exactly — schema-pinned, no inference pass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omldm_spark.io import (SUPPORTED_BATCH_FORMATS, load_table, read_source,
                            write_sink)

SF_DIR = "/root/testdata/sf0.001"


def _frame(spark):
    # scalars only; ts as integer epoch-seconds so csv round-trips exactly
    return load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
        F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias("value_c"),
    )


# tabular formats only: text round-trips a single string column (its own
# test below) and binaryFile is read-only by Spark design
TABULAR_FORMATS = tuple(f for f in SUPPORTED_BATCH_FORMATS
                        if f not in ("text", "binaryFile"))


@pytest.mark.parametrize("fmt", TABULAR_FORMATS)
def test_round_trip_exact(spark, tmp_path, fmt):
    df = _frame(spark)
    path = str(tmp_path / fmt)
    opts = {"header": "true"} if fmt == "csv" else {}
    write_sink(df, path, fmt=fmt, **opts)
    back = read_source(spark, path, fmt=fmt, schema=df.schema, **opts)
    assert back.schema == df.schema
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_partitioned_write_prunes_directories(spark, tmp_path):
    df = _frame(spark)
    path = str(tmp_path / "part")
    write_sink(df, path, fmt="parquet", partition_by=["event_type"])
    one = read_source(spark, path, fmt="parquet").filter(
        F.col("event_type") == "click"
    )
    # hive-style partition pruning: only the click directory is scanned
    files = one.select(F.input_file_name()).distinct().collect()
    assert files and all("event_type=click" in r[0] for r in files)


def test_unknown_format_raises(spark, tmp_path):
    df = _frame(spark)
    with pytest.raises(ValueError, match="avro"):
        write_sink(df, str(tmp_path / "x"), fmt="avro")
    # the unsupported-format message must not talk about binaryFile
    # being read-only (review r10 — branched error messages)
    with pytest.raises(ValueError, match="unsupported"):
        write_sink(df, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError, match="schema"):
        read_source(spark, str(tmp_path / "x"), fmt="json")


def test_text_write_requires_single_string_column(spark, tmp_path):
    # review r10: Spark's text writer fails at runtime on multi-column /
    # non-string frames — write_sink validates at call time instead
    df = _frame(spark)
    assert len(df.columns) > 1
    with pytest.raises(ValueError, match="one string column"):
        write_sink(df, str(tmp_path / "t1"), fmt="text")
    from pyspark.sql import functions as F

    ints = df.select(F.col(df.columns[0]).cast("long").alias("v"))
    with pytest.raises(ValueError, match="one string column"):
        write_sink(ints, str(tmp_path / "t2"), fmt="text")


def test_schema_evolution_merge_read(spark, tmp_path):
    """Parquet schema evolution: a later partition adds a column; a
    mergeSchema read sees the union schema with nulls backfilled, and
    column pruning still reaches the scan."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evo")
    spark.createDataFrame([(1, "a")], "id long, x string").write.parquet(
        f"{p}/day=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, x string, score double"
    ).write.parquet(f"{p}/day=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "x", "score", "day"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5
    # pruned projection must not carry the late column to the scan
    import io as _io
    import contextlib

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.select("id").explain("formatted")
    assert "score" not in buf.getvalue().split("ReadSchema")[1][:80]


def test_text_and_binaryfile_sources(spark, tmp_path):
    from omldm_spark.io import read_source, write_sink

    # text: one string column per line, round-trips via the text writer
    df = spark.createDataFrame(
        [("alpha beta",), ("gamma",)], "value string")
    p = str(tmp_path / "txt")
    write_sink(df, p, fmt="text")
    back = read_source(spark, p, fmt="text")
    assert {r.value for r in back.collect()} == {"alpha beta", "gamma"}

    # binaryFile: read-only; metadata columns + content bytes; the
    # writer must refuse it with the parquet-BINARY guidance
    import pytest

    raw = tmp_path / "blobs"
    raw.mkdir()
    (raw / "a.bin").write_bytes(b"\x00\x01payload")
    bf = read_source(spark, str(raw), fmt="binaryFile",
                     pathGlobFilter="*.bin")
    rows = bf.collect()
    assert len(rows) == 1 and bytes(rows[0].content) == b"\x00\x01payload"
    assert rows[0].length == 9
    with pytest.raises(ValueError, match="READ-only"):
        write_sink(bf, str(tmp_path / "nope"), fmt="binaryFile")


def test_text_write_with_partition_columns(spark, tmp_path):
    # review r10: partition columns leave the data schema, so a
    # (value, day) frame partitioned by day IS a valid text write; a
    # single string column that is ALSO the partition column is not
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("alpha", "d1"), ("beta", "d2")], "value string, day string")
    p = str(tmp_path / "ptxt")
    write_sink(df, p, fmt="text", partition_by=["day"])
    back = read_source(spark, p, fmt="text")
    assert {r.value for r in back.collect()} == {"alpha", "beta"}
    with pytest.raises(ValueError, match="one non-partition string"):
        write_sink(df.select("value"), str(tmp_path / "bad"), fmt="text",
                   partition_by=["value"])
