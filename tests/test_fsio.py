"""Direct contract tests for the Hadoop FileSystem shim (omldm_spark/fsio).

The sinks pin the integrated behavior (tests/test_stateful.py); these pin
the shim's own semantics — including on a ``file:`` SCHEME URI, which is
the local stand-in for hdfs:// and s3a:// paths ``os.*`` cannot speak.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from omldm_spark.fsio import HadoopFS, join  # noqa: E402


def test_join_preserves_schemes_and_slashes():
    assert join("file:/a/b", "c") == "file:/a/b/c"
    assert join("/a/b/", "c", "d") == "/a/b/c/d"
    assert join("s3a://bucket/pfx", "_commits", "3.json") == \
        "s3a://bucket/pfx/_commits/3.json"
    assert join("hdfs://nn:8020/x/", "/y/") == "hdfs://nn:8020/x/y"


@pytest.mark.parametrize("scheme", ["", "file:"])
def test_roundtrip_list_delete(spark, tmp_path, scheme):
    base = scheme + str(tmp_path / "fsio")
    fs = HadoopFS.for_path(base, spark)

    assert not fs.exists(join(base, "d"))
    assert fs.listdir(join(base, "d")) == []       # missing dir: empty

    fs.write_text(join(base, "d", "a.json"), '{"x": 1}')
    fs.write_text(join(base, "d", "b.json"), "second")
    assert fs.exists(join(base, "d", "a.json"))
    assert fs.is_dir(join(base, "d"))
    assert not fs.is_dir(join(base, "d", "a.json"))
    assert fs.listdir(join(base, "d")) == ["a.json", "b.json"]
    assert fs.read_text(join(base, "d", "a.json")) == '{"x": 1}'

    # overwrite through the same atomic rename path
    fs.write_text(join(base, "d", "a.json"), "v2")
    assert fs.read_text(join(base, "d", "a.json")) == "v2"
    # no .tmp residue after publishes
    assert all(not n.endswith(".tmp") for n in fs.listdir(join(base, "d")))

    assert fs.delete(join(base, "d", "b.json"), recursive=False)
    assert fs.listdir(join(base, "d")) == ["a.json"]
    assert fs.delete(join(base, "d"), recursive=True)
    assert not fs.exists(join(base, "d"))


def test_for_path_requires_active_session(spark):
    # with an active session the classmethod resolves it implicitly
    fs = HadoopFS.for_path("/tmp")
    assert fs.exists("/tmp")
