"""Isolate registry queries for optimization (guide §1): per query, capture
the formatted physical plan to a file and time the computation alone via the
noop sink (df.write.format("noop") — computes every column of every row,
no collect/toPandas transfer in the timed region).

Usage:
  python tools/isolate.py [--sf DIR] [--plans-dir plans/r14] [--suffix before]
                          [--reps 2] [--no-noop] name [name ...]

Writes plans/<plans-dir>/<name>_<suffix>.txt and prints one timing line per
query (best of --reps noop runs; first run separately reported as warm-up
since it carries codegen + Python-worker spin-up).

Queries whose callable eagerly materializes (localCheckpoint pipelines,
streaming replays) are still timed end-to-end: the builder call itself is
inside the timed region on every rep.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod


def main() -> int:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = None
    suffix = "before"
    reps = 2
    do_noop = True
    out = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--plans-dir":
            plans_dir = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        elif a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--no-noop":
            do_noop = False; i += 1
        else:
            out.append(a); i += 1
    names = out
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("isolate")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.codegen.maxFields", "200")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"isolate: {name} (plan)")
        t_build0 = time.time()
        df = fn(spark, sf_dir)
        build_s = time.time() - t_build0
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
        ts = []
        if do_noop:
            for r in range(reps):
                spark.sparkContext.setJobDescription(f"isolate: {name} (noop {r})")
                t0 = time.time()
                df = fn(spark, sf_dir)  # rebuild: include eager builder work
                df.write.format("noop").mode("overwrite").save()
                ts.append(time.time() - t0)
        best = min(ts) if ts else float("nan")
        print(
            f"ISOLATE {name} build={build_s:.3f}s "
            f"samples={[round(t, 3) for t in ts]} best={best:.3f}s",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
