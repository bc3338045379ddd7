"""Single-query measurement probe for the optimization rounds.

Usage:
    python tools/probe.py [--sf=/root/testdata/sf0.1] [--repeats=3]
        [--explain=plans/r12/suffix] query [query ...]

Times each named query through the noop sink (bench.py methodology:
same session shape, sf0.001 codegen warmup, repeats with median+min),
and optionally writes ``<explaindir>/<query>.txt`` with the
``explain("formatted")`` output so before/after plans can be committed.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    repeats = 3
    explain_dir = None
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
        elif a.startswith("--explain="):
            explain_dir = a.split("=", 1)[1]
        else:
            names.append(a)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_GRAFT_WORKERS", str(cpus))

    from omldm_spark.queries import QUERIES
    from omldm_spark.session import get_spark

    spark = get_spark("omldm-probe", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.range(1000).selectExpr("sum(id)").collect()

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        if os.path.isdir(warm_dir) and warm_dir != sf_dir:
            try:
                QUERIES[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception:  # noqa: BLE001
                pass

    for name in names:
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(txt)
        runs = []
        for _ in range(repeats):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            runs.append(time.time() - t0)
        print(f"{name}: median={statistics.median(runs):.3f} "
              f"min={min(runs):.3f} runs={[round(r, 3) for r in runs]}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
