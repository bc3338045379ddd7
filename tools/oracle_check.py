"""Local stand-in for the driver's correctness gate.

Runs every queries() entry against its oracle_sql() on DuckDB over the same
parquet tables and compares row count, column names, and (order-insensitive)
values. Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from omldm_spark.schemas import TABLES  # noqa: E402
from omldm_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # array cells (Spark lists / DuckDB ndarrays) are unhashable and
    # unsortable — canonicalize to tuples so they can participate in the
    # order-insensitive sort + exact compare
    import numpy as np

    for c in df.columns:
        if df[c].dtype == object and df[c].map(
            lambda v: isinstance(v, (list, tuple, np.ndarray))
        ).any():
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray)
                else (tuple(v) if isinstance(v, (list, tuple)) else v)
            )
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    import json
    import os

    args = [a for a in sys.argv[1:] if not a.startswith("--json")]
    json_path = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--json=")),
        None,
    )
    only_args = [a for a in args if a.startswith("--only=")]
    args = [a for a in args if not a.startswith("--only=")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    for a in only_args:
        only |= {n for n in a.split("=", 1)[1].split(",") if n}
    results: dict[str, dict] = {}

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # a misspelled name must ERROR, never pass vacuously: a filter that
    # matches nothing once printed "all queries match" for a flag typo
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query names: {sorted(unknown)}")
        return 2

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            # several operators persist bounded frames (postings, edges,
            # QI partials); drop them between queries so the 279-query
            # gate doesn't accumulate cache across unrelated plans
            spark.catalog.clearCache()
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "spark_error", "err": str(e)[:200]}
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(sdf)}
            print(f"ok   {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "duckdb_error", "err": str(e)[:200]}
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        s_cols, o_cols = sorted(map(str.lower, sdf.columns)), sorted(
            map(str.lower, odf.columns)
        )
        if s_cols != o_cols:
            failures.append(name)
            results[name] = {"status": "schema_mismatch"}
            print(f"FAIL {name}: columns {s_cols} vs {o_cols}")
            continue
        if len(sdf) != len(odf):
            failures.append(name)
            results[name] = {"status": "rowcount_mismatch"}
            print(f"FAIL {name}: rowcount {len(sdf)} vs {len(odf)}")
            continue
        sdf.columns = [c.lower() for c in sdf.columns]
        odf.columns = [c.lower() for c in odf.columns]
        sn, on = normalize(sdf), normalize(odf)
        # the driver's value hash is dtype-sensitive: a DuckDB HUGEINT
        # (sum of BIGINT) comes back to pandas as float64 and hashes
        # "201700.0" against Spark's int64 "201700" even when every
        # value is equal — caught live by CORRECTNESS_r08
        # shuffle_skew_report.  Flag any float-vs-integer/bool kind
        # split so the local gate fails where the driver would.
        kind_bad = [
            c for c in sn.columns
            if {sn[c].dtype.kind, on[c].dtype.kind} <= set("ifub")
            and (sn[c].dtype.kind == "f") != (on[c].dtype.kind == "f")
        ]
        if kind_bad:
            failures.append(name)
            results[name] = {"status": "dtype_kind_mismatch",
                             "cols": kind_bad}
            print(f"FAIL {name}: float-vs-int dtype split on {kind_bad} "
                  f"(spark {[str(sn[c].dtype) for c in kind_bad]} vs "
                  f"oracle {[str(on[c].dtype) for c in kind_bad]})")
            continue
        try:
            pd.testing.assert_frame_equal(
                sn, on, check_dtype=False, check_exact=True
            )
            results[name] = {"status": "exact_match", "rows": len(sdf)}
            print(f"ok   {name}: {len(sdf)} rows exact-match")
        except AssertionError as e:
            failures.append(name)
            results[name] = {"status": "value_mismatch"}
            msg = str(e).split("\n")
            print(f"FAIL {name}: value mismatch: " + " | ".join(msg[:6]))
    spark.stop()
    if json_path:
        with open(json_path, "w") as fh:
            json.dump({"sf_dir": sf_dir, "n_queries": len(results),
                       "n_failures": len(failures),
                       "results": results}, fh, indent=1, sort_keys=True)
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
