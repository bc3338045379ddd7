"""Corpus/scrub operators under Structured Streaming: the map-only ops
(pii_redact, text metrics) must run unchanged on a readStream frame — the
engine claim is streaming-first, so streaming compatibility is asserted,
not assumed. Stateless Catalyst projections carry over automatically;
this pins that no operator accidentally introduces a batch-only construct
(e.g. a global window or non-streaming join shape)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from omldm_spark.operators.pii import pii_redact, plant_pii
from omldm_spark.streaming.sources import file_replay_source

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])


def test_pii_redact_runs_on_stream(spark, tmp_path):
    import shutil

    sf = "/root/testdata/sf0.001"
    # batch reference result
    batch = spark.read.parquet(f"{sf}/documents.parquet")
    expected = {
        r["doc_id"]: r for r in pii_redact(plant_pii(batch)).collect()
    }

    src = tmp_path / "docs_stream"  # FileStreamSource wants a directory
    src.mkdir()
    shutil.copy(f"{sf}/documents.parquet", src / "part-0.parquet")
    stream = file_replay_source(spark, str(src), DOC_SCHEMA)
    out = pii_redact(plant_pii(stream))
    assert out.isStreaming
    got: list = []
    q = (
        out.writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(got) == len(expected)
    for r in got[:50]:
        e = expected[r["doc_id"]]
        assert (r["n_emails"], r["n_ips"], r["n_phones"], r["clean_text"]) == (
            e["n_emails"], e["n_ips"], e["n_phones"], e["clean_text"]
        )


def test_text_quality_runs_on_stream(spark, tmp_path):
    import shutil

    from omldm_spark.functions.text import text_metrics

    src = tmp_path / "docs_stream2"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                src / "part-0.parquet")
    stream = file_replay_source(spark, str(src), DOC_SCHEMA)
    out = text_metrics(stream)
    assert out.isStreaming  # projection-only: valid in append mode as-is
