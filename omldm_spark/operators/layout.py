"""Storage-layout operators: Z-order clustering for multi-column data
skipping (beyond-reference §2.11; the Delta OPTIMIZE ZORDER BY / Iceberg
sort-order idea as engine-level DataFrame ops).

Why it matters at 100 TB: parquet scans prune row groups and files on
min/max statistics, but a layout sorted on ONE column leaves every other
column's min/max spanning the full domain — filters on those columns read
everything.  Interleaving the bits of k quantized columns into a single
Z-value and range-partitioning + sorting on it gives every written file a
tight hyper-rectangle in ALL k dimensions, so pushdown filters on ANY of
them skip most files.  The Z-value is pure Catalyst bit arithmetic
(`<<`, `>>`, `&` have identical semantics in Spark SQL and DuckDB, so the
contract oracle runs the SAME generated text), and the layout write is one
range shuffle — no UDFs, no sampling pass beyond the range partitioner's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zvalue_sql(cols: list[str], bits: int) -> str:
    """Generated shared-text expression interleaving ``bits`` low bits of
    each (non-negative BIGINT) column: bit i of column j lands at position
    i * len(cols) + j.  With bits*len(cols) <= 62 the result fits BIGINT."""
    n = len(cols)
    assert n >= 2 and bits * n <= 62
    terms = [
        f"((({c} >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_layout(
    df: DataFrame, quantized_cols: list[str], bits: int, num_files: int
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional data skipping: compute the
    Z-value over pre-quantized columns, then range-partition into
    ``num_files`` output partitions and sort within each — written out,
    every file covers a tight range of EVERY quantized column, so parquet
    min/max pruning works for filters on any of them.

    One shuffle (the range exchange; its boundaries come from the range
    partitioner's reservoir sample) + an in-partition sort; the Z-value
    itself is whole-stage-codegen bit arithmetic."""
    z = df.withColumn("zval", F.expr(zvalue_sql(quantized_cols, bits)))
    return z.repartitionByRange(num_files, "zval").sortWithinPartitions("zval")


def _hilbert_fragments(bits: int) -> list[dict]:
    """Per-level shared-text fragments of the Hilbert xy2d walk
    (Wikipedia's iterative form, the Z-order's better-locality sibling:
    consecutive Hilbert keys are always Manhattan-adjacent cells, so
    range scans over the key touch contiguous tiles in BOTH dimensions).

    Each level ℓ consumes bit s = 2^(bits-1-ℓ) of (x, y) and rotates the
    frame.  Everything is integer CASE/arithmetic shared verbatim by
    Spark and DuckDB; the one non-portable token — bitwise XOR, which
    DuckDB spells ``xor()`` and Spark ``^`` — is replaced by the exact
    identity  (3*rx) XOR ry  ==  3*rx + ry*(1 - 2*rx)  for rx, ry ∈
    {0,1}.  The reflection uses the full-grid constant n-1 (flipping
    already-consumed high bits is harmless: later levels only read
    lower bits), which is what keeps the per-level text constant-size.
    """
    assert 2 <= bits <= 31
    n = 1 << bits
    frags = []
    for lvl in range(bits):
        s = 1 << (bits - 1 - lvl)
        frags.append({
            "rx": f"CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END",
            "ry": f"CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END",
            "d": f"d + {s * s} * (3 * rx + ry * (1 - 2 * rx))",
            "x": (f"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1"
                  f" THEN {n - 1} - y ELSE y END) ELSE x END"),
            "y": (f"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1"
                  f" THEN {n - 1} - x ELSE x END) ELSE y END"),
        })
    return frags


def hilbert_key(df: DataFrame, id_cols: list[str], bits: int) -> DataFrame:
    """(id_cols..., hval): Hilbert index of the pre-quantized BIGINT
    columns ``x``/``y`` (each in [0, 2^bits)).  The 2*bits chained
    projections collapse into ONE whole-stage-codegen ProjectExec —
    Catalyst's CollapseProject folds the ladder, so this costs the same
    single pass as the Z-value despite the rotation recurrence."""
    ids = ", ".join(id_cols)
    cur = df.selectExpr(ids, "x", "y", "CAST(0 AS BIGINT) AS d")
    for f in _hilbert_fragments(bits):
        cur = cur.selectExpr(
            ids, "x", "y", "d",
            f"{f['rx']} AS rx", f"{f['ry']} AS ry",
        ).selectExpr(
            ids,
            f"{f['x']} AS x", f"{f['y']} AS y", f"{f['d']} AS d",
        )
    return cur.selectExpr(ids, "CAST(d AS BIGINT) AS hval")


def hilbert_sql(base_select: str, id_cols: list[str], bits: int) -> str:
    """Oracle text: the SAME per-level fragments as chained CTEs over
    ``base_select`` (which must yield id_cols + BIGINT x, y)."""
    ids = ", ".join(id_cols)
    ctes = [f"hb AS ({base_select})",
            f"h0 AS (SELECT {ids}, x, y, CAST(0 AS BIGINT) AS d FROM hb)"]
    for i, f in enumerate(_hilbert_fragments(bits)):
        ctes.append(
            f"h{i}a AS (SELECT {ids}, x, y, d, {f['rx']} AS rx,"
            f" {f['ry']} AS ry FROM h{i})")
        ctes.append(
            f"h{i + 1} AS (SELECT {ids}, {f['x']} AS x, {f['y']} AS y,"
            f" {f['d']} AS d FROM h{i}a)")
    return (f"WITH {', '.join(ctes)}\n"
            f"SELECT {ids}, CAST(d AS BIGINT) AS hval FROM h{bits}")


def file_ranges(spark, path: str, cols: list[str]):
    """Per-file min/max of ``cols`` for a parquet directory — the
    clustering-quality probe used by the layout tests (narrow per-file
    ranges == effective data skipping)."""
    import pyspark.sql.functions as Fn

    df = spark.read.parquet(path).withColumn(
        "_file", Fn.input_file_name()
    )
    aggs = []
    for c in cols:
        aggs += [Fn.min(c).alias(f"min_{c}"), Fn.max(c).alias(f"max_{c}")]
    return df.groupBy("_file").agg(*aggs)


def compact_small_files(
    spark, src_path: str, dst_path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Table-maintenance compaction (the OPTIMIZE half of Delta/Iceberg
    maintenance): rewrite a directory of many small parquet files into
    ~target-sized files.

    The small-files problem is a first-order 100 TB cost: every file is
    a scan task + a name-node entry + a footer read, so a streaming sink
    that wrote 10k × 1 MB files makes every downstream query pay 10k
    task launches for 10 GB of data.  Sizing from the SOURCE bytes (not
    row counts) keeps the rewrite a single narrow repartition; the
    shuffle is round-robin, so output files are uniformly sized with no
    skew regardless of source layout.

    Returns {"files_before", "files_after", "bytes"} for the maintenance
    log."""
    import glob
    import math
    import os

    files = [f for f in glob.glob(os.path.join(src_path, "*.parquet"))
             if os.path.isfile(f)] or [
        f for f in glob.glob(os.path.join(src_path, "*"))
        if os.path.isfile(f) and not os.path.basename(f).startswith("_")
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n_out).write.mode("overwrite").parquet(dst_path)
    after = [f for f in glob.glob(os.path.join(dst_path, "*.parquet"))
             if os.path.isfile(f)]
    return {"files_before": len(files), "files_after": len(after),
            "bytes": total}
