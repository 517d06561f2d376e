"""Round-6 optimization measurement harness (bench.py is FROZEN for the
driver; this file carries the extra guide-§1 instrumentation).

Times individual __spark_entry__ queries through the noop sink
(guide §1.4 — computation only, no result transfer) and optionally dumps
.explain("formatted") to plans/r06/<name>_<tag>.txt.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --only q1,q2 \
      [--reps 3] [--plans before|after] [--collect]

--collect times fn().collect() instead of the noop sink (the bench.py
methodology) for apples-to-apples numbers with BENCH_r05.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="tag: write plans/r06/<q>_<tag>.txt")
    ap.add_argument("--collect", action="store_true")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("orama-spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    only = set(args.only.split(",")) if args.only else None
    qs = entry_mod.queries()
    out: dict[str, float] = {}
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        df = fn(spark, args.sf)  # first call may build indexes (untimed here)
        if args.plans:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        # warmup run (parquet footers, codegen)
        if args.collect:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{i}")
            t0 = time.time()
            d = fn(spark, args.sf)
            if args.collect:
                d.collect()
            else:
                d.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}s", file=sys.stderr, flush=True)

    print(json.dumps({"sf": args.sf, "mode": "collect" if args.collect else "noop",
                      "reps": args.reps, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
